package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Let

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

  /** Space-joined initial symbol sequence: CODEPOINTS + [[EndOfWord]].
    * Codepoint split (`(?s).` extraction — Java regex `.` matches one
    * code point, surrogate pairs included), NOT `split(w, "")` (UTF-16
    * code units): a non-BMP character (emoji) must symbolize as one
    * unit, matching the DuckDB oracle's `regexp_extract_all(w,'(?s).')`
    * and the reference's Python per-character split. */
  private def symbolize(w: Column): Column =
    concat(concat_ws(" ", regexp_extract_all(w, lit("(?s)."), lit(0))),
      lit(" " + EndOfWord))

  /** All adjacent symbol pairs of a space-joined sequence, as
    * "left right" strings (overlapping positions counted, matching the
    * reference get_stats). */
  private def adjacentPairs(sym: Column): Column =
    // Let-bound: the pair lambda references the symbol split twice per
    // position — unbound, that re-splits the string 2(m-1) times
    // (see graft.functions.Let).
    Let.bind(split(sym, " "))(syms =>
      when(size(syms) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(syms) - 2),
          i => concat_ws(" ",
            element_at(syms, i + 1), element_at(syms, i + 2)))))

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
    // Per-call unique silver names (same rule as EntityResolution): a
    // concurrent or later train() sharing spark.graft.silver.dir must
    // not overwrite parts under this run's still-live round tables.
    val uid = java.util.UUID.randomUUID().toString.take(8)
    trainOnWords(Silver.materialize(
      wordFreqs(docs, textCol)
        .select(symbolize(col("w")).as("sym"), col("freq")),
      s"bpe_words_${uid}_0"), numMerges, minPairCount, batchSize, uid)
  }

  /** Training loop over an already-materialized (sym, freq) word table —
    * split out so callers that need the word table for other work too
    * ([[encodeQuery]]) pay the corpus tokenize-and-count pass once. */
  private def trainOnWords(words0: DataFrame, numMerges: Int,
                           minPairCount: Long, batchSize: Int,
                           uid: String): Seq[Merge] = {
    require(numMerges >= 0 && batchSize >= 1)
    var words = words0
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
          s"bpe_words_${uid}_$round")
      }
    }
    learned.toSeq
  }

  /** q_bpe_merges: the learned merge table after `numMerges` exact
    * (batchSize = 1) rounds over the documents corpus — the
    * engine-portable INTEGER face of BPE training (pair counts and the
    * argmax-per-round selection are exact arithmetic; nothing here needs
    * `ln`). The merge list is the learned parameter and is driver-sized
    * by design (like k-means centroids); every count feeding it is a
    * distributed aggregation. The DuckDB oracle replays the same rounds
    * as unrolled CTE stages (see SparkEntry's generated SQL). */
  def mergesQuery(spark: SparkSession, dir: String,
                  numMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val merges = train(graft.sources.Tables.documents(spark, dir), numMerges)
    merges.zipWithIndex
      .map { case (m, i) => ((i + 1).toLong, m.left, m.right, m.pairCount) }
      .toDF("merge_rank", "left_sym", "right_sym", "pair_cnt")
      .orderBy("merge_rank")
  }

  /** q_bpe_encode: the word → subword-segmentation table of every
    * distinct corpus word under the `numMerges` learned merges — the
    * ENCODE half of BPE, oracle-checked end-to-end (q_bpe_merges
    * already oracles the learning half; the DuckDB replay's final
    * round table is exactly this vocabulary). Runs the expression-fold
    * encoder; BpeSpec pins the rank-map production encoder equal to
    * it, so the oracle transitively covers both paths. Distinct words,
    * not documents, keep the witness vocabulary-sized — the per-doc
    * application is a broadcast-map over this table. */
  def encodeQuery(spark: SparkSession, dir: String,
                  numMerges: Int = 8): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    // One corpus pass: materialize (w, sym, freq) once; training reads
    // the (sym, freq) projection, the encode below re-reads the words —
    // no second tokenize-and-count over the documents.
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val wf = Silver.materialize(
      wordFreqs(docs).select(col("w"), symbolize(col("w")).as("sym"), col("freq")),
      s"bpe_words_${uid}_0")
    val merges = trainOnWords(wf.select("sym", "freq"), numMerges,
      minPairCount = 2L, batchSize = 1, uid)
    wf.select(col("w"))
      .withColumn("sym", element_at(encodeViaExpressions(col("w"), merges), 1))
      .withColumn("n_sub", size(split(col("sym"), " ")).cast("long"))
      .orderBy("w")
  }

  /** Above this many merges, [[encode]] switches from the nested
    * expression fold (one tree layer per merge — Catalyst recursion and
    * Janino method-size limits make it unusable for big lists) to the
    * rank-map UDF, whose cost is independent of the merge count. */
  val ExprMergeLimit = 64

  /** Segment a text column with a learned merge list: per word, start
    * from characters and apply the merges. Returns the space-joined
    * subword tokens per input word, flattened per doc.
    *
    * Small lists use pure expressions ([[encodeViaExpressions]]);
    * production vocab sizes (50k merges) use [[encodeViaRanks]] — the
    * standard rank-map greedy encoder (repeatedly merge the
    * lowest-learned-rank adjacent pair), which is equivalent to applying
    * the merges in learned order but costs O(word²) instead of
    * O(word · merges) per word. Both paths are spec-asserted equal. */
  def encode(text: Column, merges: Seq[Merge]): Column =
    if (merges.length <= ExprMergeLimit) encodeViaExpressions(text, merges)
    else encodeViaRanks(text, merges)

  /** Expression-fold encoder — one plan-tree layer per merge; only for
    * merge lists up to [[ExprMergeLimit]]. */
  def encodeViaExpressions(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    transform(words, w =>
      merges.foldLeft(symbolize(w)) { (c, m) => mergeOnce(c, m.left, m.right) })
  }

  /** Rank-map greedy encoder: merge the adjacent pair with the lowest
    * learned rank until none remains — the production-shape per-row
    * algorithm (cost independent of vocabulary size; the merge table
    * rides the closure like a broadcast lookup). */
  def encodeViaRanks(text: Column, merges: Seq[Merge]): Column = {
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap
    val enc = udf { (t: String) =>
      if (t == null) null
      else t.split(" ").filter(_.nonEmpty).toSeq.map { w =>
        // CODEPOINT split, matching symbolize's `(?s).` and the
        // expression encoder: `w.map(_.toString)` splits UTF-16 code
        // units, so a non-BMP char (emoji) became two lone surrogates
        // no learned merge could ever match — the two encode paths then
        // disagreed exactly on the large-vocab inputs where only this
        // path runs.
        var syms = w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) :+ EndOfWord
        var done = false
        while (!done && syms.length > 1) {
          var bestIdx = -1
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestIdx = i }
            i += 1
          }
          if (bestIdx < 0) done = true
          else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
            syms.drop(bestIdx + 2)
        }
        syms.mkString(" ")
      }
    }
    enc(text)
  }

  /** Per-doc subword token count under a learned vocabulary — the
    * fertility input for tokenizer QA (compare against
    * [[TextAnalysis.bpeishTokenCount]]'s fixed pre-tokenizer). */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(encode(text, merges), lit(0L),
      (acc, sym) => acc + size(split(sym, " ")))
}
