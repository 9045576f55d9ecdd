package graft

import graft.scale.LmScore

/** Bigram-LM perplexity scoring vs a driver-side reference computation. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "the cat ran to the dog"))
    .toDF("doc_id", "text")

  test("perplexity matches a driver-side reference (add-k smoothing)") {
    val model = LmScore.train(reference)
    val probe = Seq((10L, "the cat sat"), (11L, "zx qy wv")).toDF("doc_id", "text")
    val got = LmScore.perplexity(probe, model, k = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

    // driver-side reference: standard bigram MLE — the history count of
    // a word excludes its document-final occurrences (c1 = Σ_w2 c12),
    // and V is the set of tokens participating in any bigram
    val toks = Seq("the cat sat on the mat", "the dog sat on the rug",
      "the cat ran to the dog").map(_.split(" ").toSeq)
    val hist = toks.flatMap(_.dropRight(1)).groupBy(identity)
      .map { case (w, g) => w -> g.length }
    val bi = toks.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .map { case (p, g) => p -> g.length }
    val vocab = (bi.keys.map(_._1) ++ bi.keys.map(_._2)).toSet
    val v = vocab.size
    def p(a: String, b: String) =
      (bi.getOrElse((a, b), 0) + 0.5) / (hist.getOrElse(a, 0) + 0.5 * v)
    // the point of the history-count denominator: the smoothed
    // conditional distribution is properly normalized
    for (a <- Seq("the", "cat", "mat")) {
      val mass = vocab.toSeq.map(b => p(a, b)).sum
      assert(math.abs(mass - 1.0) < 1e-12, s"P(·|$a) sums to $mass, not 1")
    }
    def ce(text: String): (Long, Double) = {
      val t = text.split(" ").toSeq
      val ps = t.zip(t.tail).map { case (a, b) => p(a, b) }
      (ps.length.toLong, -ps.map(x => math.log(x) / math.log(2.0)).sum / ps.length)
    }
    for ((id, text) <- Seq(10L -> "the cat sat", 11L -> "zx qy wv")) {
      val (n, h) = ce(text)
      assert(got(id)._1 == n)
      assert(math.abs(got(id)._2 - h) < 1e-9, s"doc $id entropy")
      assert(math.abs(got(id)._3 - math.pow(2, h)) < 1e-9, s"doc $id ppl")
    }
    // in-domain text scores clearly lower perplexity than out-of-vocab
    // noise (on a toy corpus the smoothing floor caps the separation)
    assert(got(10L)._3 * 1.5 < got(11L)._3)
  }

  test("documents without bigrams emit no row") {
    val model = LmScore.train(reference)
    val probe = Seq((20L, "single"), (21L, ""), (22L, "two tokens"))
      .toDF("doc_id", "text")
    val ids = LmScore.perplexity(probe, model)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(22L))
  }
}
