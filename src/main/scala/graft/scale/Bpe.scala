package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") as Spark jobs —
  * the tokenizer-construction stage of a training-data pipeline, the
  * learned-vocabulary complement of the count-based
  * [[Search.vocabBuild]] and the fixed-regex
  * [[TextAnalysis.bpeishTokenCount]].
  *
  * Scale shape: the corpus is touched ONCE — a word-frequency aggregation
  * (shuffle on word, vocab-bounded output). Every merge iteration runs on
  * the word-frequency table, whose size is the distinct-word vocabulary,
  * not the corpus; pair counting is a groupBy over ≤ |word| adjacent
  * pairs per vocab entry weighted by the word's corpus frequency. The
  * only driver-side data is the learned parameter itself (the best pair
  * per round — the k-means-centroid pattern of [[Similarity]]'s IVF
  * build). Iterations materialize per round ([[Silver.materialize]]) so
  * lineage stays flat, same as [[Dedup.connectedComponents]].
  *
  * `batchSize` > 1 applies the standard batched-merge speedup: each round
  * selects the top-m most frequent pairs that share NO symbol (merging
  * symbol-disjoint pairs in one pass is order-independent, so the result
  * is a valid BPE vocabulary while rounds drop from k to ~k/m — at a
  * production vocab of 50k merges the driver loop is otherwise the
  * bottleneck). batchSize = 1 is exact classic BPE.
  */
object Bpe {

  /** One learned merge: `left`+`right` → `left+right`, with the weighted
    * adjacent-pair count that selected it. */
  final case class Merge(left: String, right: String, pairCount: Long)

  /** End-of-word marker (distinguishes "est_" suffix from "est" infix). */
  val EndOfWord = "</w>"

  /** Corpus → (word, freq) — the single full-corpus pass. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Space-joined initial symbol sequence: characters + [[EndOfWord]]. */
  private def symbolize(w: Column): Column =
    concat(concat_ws(" ", filter(split(w, ""), s => s =!= lit(""))),
      lit(" " + EndOfWord))

  /** All adjacent symbol pairs of a space-joined sequence, as
    * "left right" strings (overlapping positions counted, matching the
    * reference get_stats). */
  private def adjacentPairs(sym: Column): Column = {
    val syms = split(sym, " ")
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(syms) - 2),
        i => concat_ws(" ",
          element_at(syms, i + 1), element_at(syms, i + 2))))
  }

  /** Left-to-right greedy merge of one (a, b) pair inside a space-joined
    * symbol sequence, as a pure fold expression: "a a a" under (a,a) →
    * "aa a", matching the reference merge order. String replace can't do
    * this (occurrences share separator spaces); the fold can. */
  private def mergeOnce(sym: Column, a: String, b: String): Column = {
    val merged = a + b
    concat_ws(" ", aggregate(
      split(sym, " "),
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(s)))))
  }

  /** Learn `numMerges` merges from the documents corpus. Stops early when
    * no remaining pair reaches `minPairCount`. Deterministic: ties break
    * on the pair string ascending. */
  def train(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L,
            batchSize: Int = 1, textCol: String = "text"): Seq[Merge] = {
    require(numMerges >= 0 && batchSize >= 1)
    var words = Silver.materialize(
      wordFreqs(docs, textCol)
        .select(symbolize(col("w")).as("sym"), col("freq")),
      "bpe_words_0")
    val learned = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 0
    var exhausted = false
    while (learned.length < numMerges && !exhausted) {
      round += 1
      val m = math.min(batchSize, numMerges - learned.length)
      // top candidates: fetch extra rows so the greedy disjoint filter
      // can still fill the batch when leaders share symbols
      val top = words
        .select(col("freq"), explode(adjacentPairs(col("sym"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(4 * m)
        .collect()
      val picked = scala.collection.mutable.ArrayBuffer[Merge]()
      val used = scala.collection.mutable.Set[String]()
      top.iterator.takeWhile(_ => picked.length < m).foreach { r =>
        val Array(a, b) = r.getString(0).split(" ", 2)
        // a merged pair's output must not collide with either side of a
        // later pick in the same batch, so reserve a+b too
        if (!used(a) && !used(b) && !used(a + b)) {
          picked += Merge(a, b, r.getLong(1))
          used ++= Seq(a, b, a + b)
        }
      }
      if (picked.isEmpty) exhausted = true
      else {
        learned ++= picked
        val mergedSym = picked.foldLeft(col("sym")) { (c, mg) =>
          mergeOnce(c, mg.left, mg.right)
        }
        words = Silver.materialize(
          words.select(mergedSym.as("sym"), col("freq")),
          s"bpe_words_$round")
      }
    }
    learned.toSeq
  }

  /** Segment a text column with a learned merge list: per word, start
    * from characters and apply every merge in learned order. Pure
    * expressions (nested folds) — usable inside any query; returns the
    * space-joined subword tokens per input word, flattened per doc. */
  def encode(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    transform(words, w =>
      merges.foldLeft(symbolize(w)) { (c, m) => mergeOnce(c, m.left, m.right) })
  }

  /** Per-doc subword token count under a learned vocabulary — the
    * fertility input for tokenizer QA (compare against
    * [[TextAnalysis.bpeishTokenCount]]'s fixed pre-tokenizer). */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(encode(text, merges), lit(0L),
      (acc, sym) => acc + size(split(sym, " ")))
}
