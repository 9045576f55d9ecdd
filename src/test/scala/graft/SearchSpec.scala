package graft

import org.apache.spark.sql.functions._

import graft.scale.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark spark spark window"),
    (1L, "hash join window table"),
    (2L, "the a of and in to is"),
    (3L, "spark window hash"))
    .toDF("doc_id", "text")

  test("invertedIndex: df and sorted postings") {
    val idx = Search.invertedIndex(corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(idx("spark") == (2L, Seq(0L, 3L)))
    assert(idx("window") == (3L, Seq(0L, 1L, 3L)))
    // tf multiplicity must NOT inflate df
    assert(idx("spark")._1 == 2L)
  }

  test("termFrequencies keeps multiplicity") {
    val tf = Search.termFrequencies(corpus)
      .filter(col("term") === "spark" && col("doc_id") === 0L)
      .collect()
    assert(tf.length == 1 && tf.head.getLong(2) == 3L)
  }

  test("bm25: docs with more query terms outrank stopword doc; no-hit docs absent") {
    val out = Search.bm25(corpus, Seq("spark", "window", "hash")).collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(!ids.contains(2L), "doc with zero query-term hits must not appear")
    // doc 3 contains all three query terms in a short doc — best score
    assert(ids.head == 3L, s"expected doc 3 first, got $ids")
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "descending score order")
  }

  test("bm25 idf penalizes common terms: rare term outscores common at same tf") {
    // 'rare' in 1 of 4 docs, 'common' in 4 of 4; doc 10 has one of each
    val docs = Seq(
      (10L, "rare common x"),
      (11L, "common y z"),
      (12L, "common q"),
      (13L, "common w")).toDF("doc_id", "text")
    val rare = Search.bm25(docs, Seq("rare")).filter(col("doc_id") === 10L)
      .head().getDouble(1)
    val common = Search.bm25(docs, Seq("common")).filter(col("doc_id") === 10L)
      .head().getDouble(1)
    assert(rare > common, s"rare=$rare should outscore common=$common")
  }

  test("ngramCounts: bigram multiplicity and short-doc guard") {
    val docs = Seq((0L, "a b a b"), (1L, "x")).toDF("doc_id", "text")
    val counts = Search.ngramCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a b" -> 2L, "b a" -> 1L))
  }

  test("spanDedup drops later copies of a repeated span and reassembles") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, span + " " + "tail0 " * 9 + "tail0"), // span at idx 0 (kept)
      (1L, span),                                 // exact duplicate span — dropped
      (2L, "unique " * 9 + "unique"))             // untouched
      .toDF("doc_id", "text")
    val out = Search.spanDedup(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(0L)._1 == 2L && byId(0L)._2 == 2L)
    assert(byId(1L)._1 == 1L && byId(1L)._2 == 0L, "duplicate-only doc keeps nothing")
    assert(byId(1L)._3 == md5Hex(""), "empty reassembly fingerprints the empty string")
    assert(byId(2L)._2 == 1L)
  }

  test("spanDedup within-doc repeats: first span instance wins") {
    val span = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq((5L, span + " " + span)).toDF("doc_id", "text")
    val r = Search.spanDedup(docs).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
  }

  test("bpeishTokenCount splits letter/digit/symbol runs") {
    import graft.scale.TextAnalysis
    // "it costs $12.50 now!" → [it, costs, $, 12, ., 50, now, !] = 8
    val r = evalExpr(
      TextAnalysis.bpeishTokenCount(lit("it costs $12.50 now!")),
      TextAnalysis.bpeishTokenCount(lit("plain words only")))
    assert(r.getLong(0) == 8L, s"got ${r.getLong(0)}")
    assert(r.getLong(1) == 3L, "on pure words BPE-ish degenerates to whitespace")
  }

  test("heavyHitters surfaces a planted hot item and never misses true hitters") {
    import graft.operators.Approx
    val rows = (1 to 400).map(i => s"tok$i") ++ Seq.fill(100)("hot")
    val df = rows.toDF("t")
    val items = Approx.heavyHitters(df, col("t"), support = 0.1)
      .collect().map(_.getString(0)).toSet
    assert(items.contains("hot"), s"true heavy hitter missing from $items")
  }

  test("heavyHittersVerified equals the exact GROUP BY/HAVING answer") {
    import graft.operators.Approx
    // 1000 rows, support 5% (threshold 50): three true hitters, one item
    // at EXACTLY the threshold (strict >, must be excluded) and a long
    // cold tail the sketch may or may not propose — the verify pass must
    // kill every false positive either way.
    val rows = Seq.fill(200)("a") ++ Seq.fill(90)("b") ++ Seq.fill(51)("c") ++
      Seq.fill(50)("edge") ++ (1 to 609).map(i => s"cold$i")
    val df = rows.toDF("t")
    val got = Approx.heavyHittersVerified(df, col("t"), support = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 200L, "b" -> 90L, "c" -> 51L), s"got $got")
  }

  test("stratifiedSample: k smallest hashes per stratum, agrees with window rank") {
    import graft.scale.TrainingData
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 60L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("lang", "doc_id")
    val got = TrainingData.stratifiedSample(docs, 4, col("lang"))
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = docs
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= 4)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.count(_._1 == "even") == 4 && got.count(_._1 == "odd") == 4)
  }

  test("qualityTrim drops the bottom quantile per stratum") {
    import graft.scale.TextAnalysis
    // 5 docs in one lang: quality ascends with distinct-token diversity
    val docs = Seq(
      (1L, "en", "x x x x x"),
      (2L, "en", "x x x x y"),
      (3L, "en", "x x x y z"),
      (4L, "en", "x x w y z"),
      (5L, "en", "v x w y z")).toDF("doc_id", "lang", "text")
    // percent_rank over 5 rows = 0, .25, .5, .75, 1 → pr >= 0.2 keeps 4
    val r = TextAnalysis.qualityTrimFrom(docs).head()
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 5L && r.getLong(2) == 4L)
    // lowest surviving score is doc 2's (one distinct token more than doc 1)
    val qs2 = evalExpr(TextAnalysis.qualityScore(lit("x x x x y"))).getDouble(0)
    assert(math.abs(r.getDouble(3) - qs2) < 1e-6)
  }

  test("indexUpsert converges to the from-scratch index") {
    import graft.scale.Search
    val v1 = Seq(
      (1L, "alpha beta beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    // doc 2 re-ingested with 'delta' dropped and 'alpha' added; doc 3 new
    val batch = Seq(
      (2L, "gamma gamma alpha"),
      (3L, "epsilon")).toDF("doc_id", "text")
    val finalCorpus = Seq(
      (1L, "alpha beta beta"),
      (2L, "gamma gamma alpha"),
      (3L, "epsilon")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val incremental = canon(Search.indexUpsert(Search.termFrequencies(v1), batch))
    val rebuilt = canon(Search.termFrequencies(finalCorpus))
    assert(incremental == rebuilt)
    // the stale (delta, 2) posting must be retired, not merely shadowed
    assert(!incremental.exists(t => t._1 == "delta" && t._2 == 2L))
  }

  test("qualityTrimApprox agrees with the exact percentile cut on the corpus") {
    import graft.scale.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val exact = TextAnalysis.qualityTrimFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = TextAnalysis.qualityTrimApproxFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    // at accuracy 10000 on small strata the sketch is exact up to ties at
    // the threshold — allow a 2% band per stratum
    exact.foreach { case (lang, n) =>
      val a = approx(lang)
      assert(math.abs(a - n) <= math.max(2L, (n * 0.02).toLong),
        s"lang $lang: approx kept $a vs exact $n")
    }
    // the approx plan must not contain a window (that is the whole point)
    val plan = TextAnalysis.qualityTrimApproxFrom(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
