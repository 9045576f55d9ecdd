package graft

import org.apache.spark.sql.functions._

import graft.scale.Bpe

/** BPE merge training vs a driver-side reference implementation of the
  * classic algorithm (Sennrich et al. 2016 get_stats/merge_vocab). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on a word-frequency map, driver-side. */
  private def referenceBpe(freqs: Map[String, Long], k: Int,
                           minCount: Long): Seq[(String, String)] = {
    var vocab = freqs.map { case (w, f) =>
      (w.map(_.toString) :+ Bpe.EndOfWord).toVector -> f
    }.toVector
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (out.length < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) done = true
      else {
        // max count, tie-break on "a b" string ascending (trainer contract)
        val best = eligible.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }._1
        out += best
        vocab = vocab.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          syms.foreach { s =>
            if (merged.nonEmpty && merged.last == best._1 && s == best._2) {
              merged(merged.length - 1) = best._1 + best._2
            } else merged += s
          }
          merged.toVector -> f
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("train(batch=1) matches the classic reference algorithm") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val got = Bpe.train(docs, numMerges = 8, minPairCount = 2L)
      .map(m => (m.left, m.right))
    val want = referenceBpe(
      corpus.groupBy(identity).map { case (w, g) => w -> g.length.toLong }.toMap,
      k = 8, minCount = 2L)
    assert(got == want)
  }

  test("train stops when no pair reaches minPairCount") {
    val docs = Seq("ab cd ef").toDF("text") // every pair unique (freq 1)
    assert(Bpe.train(docs, numMerges = 5, minPairCount = 2L).isEmpty)
  }

  test("encode applies merges left-to-right; tokenCount sums subwords") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 6, minPairCount = 2L)
    val enc = Seq("lowest low").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("words"),
        Bpe.tokenCount(col("text"), merges).as("n"))
      .head()
    val words = enc.getSeq[String](0)
    assert(words.length == 2)
    // every emitted symbol is a contiguous substring of word+</w>
    words.zip(Seq("lowest", "low")).foreach { case (sym, w) =>
      val joined = sym.split(" ").mkString
      assert(joined == w + Bpe.EndOfWord, s"$sym reassembles to $joined")
    }
    assert(enc.getLong(1) == words.map(_.split(" ").length.toLong).sum)
  }

  test("encodeViaRanks ≡ encodeViaExpressions (the production-size path)") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 8, minPairCount = 2L)
    val probe = Seq("lowest low", "newest wide lower", "", "  ", "xyz")
      .toDF("text")
    val both = probe.select(
      Bpe.encodeViaExpressions(col("text"), merges).as("e"),
      Bpe.encodeViaRanks(col("text"), merges).as("r"))
    both.collect().foreach { row =>
      assert(row.getSeq[String](0) == row.getSeq[String](1))
    }
  }

  test("batched training merges symbol-disjoint pairs per round") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val batched = Bpe.train(docs, numMerges = 6, minPairCount = 2L, batchSize = 3)
    assert(batched.length == 6)
    // a batch never reuses a symbol: reconstruct rounds of 3 and check
    batched.grouped(3).foreach { g =>
      val syms = g.flatMap(m => Seq(m.left, m.right, m.left + m.right))
      assert(syms.distinct.length == syms.length,
        s"batch shares symbols: $g")
    }
    // the batched vocabulary is well-formed: encoding reassembles every
    // word exactly (same invariant as the exact path)
    val words = Seq("newest lower").toDF("text")
      .select(Bpe.encode(col("text"), batched).as("w")).head().getSeq[String](0)
    words.zip(Seq("newest", "lower")).foreach { case (sym, w) =>
      assert(sym.split(" ").mkString == w + Bpe.EndOfWord)
    }
  }

  test("symbolize splits by CODEPOINT: non-BMP characters stay whole (r4 advice)") {
    // "😀" (U+1F600) is a surrogate pair in UTF-16. A code-unit split
    // (the old split(w, "")) would symbolize it as two lone surrogates —
    // learning garbage merges and diverging from the DuckDB oracle's
    // regexp '(?s).' codepoint split. In "😀😀😀ab" the (😀,😀) pair
    // counts twice per word, beating every other pair, so the FIRST
    // learned merge proves the emoji survived as one symbol.
    val docs = Seq(Seq.fill(4)("😀😀😀ab").mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 1, minPairCount = 2L)
    assert(merges.head.left == "😀" && merges.head.right == "😀",
      s"non-BMP symbolization broke: ${merges.head}")
    assert(merges.head.pairCount == 8L, merges.head.toString)
  }
}
