package graft

import org.apache.spark.sql.functions._

import graft.operators.{Distribution, PageRank, Regression, TimeSeries}
import graft.scale.{Dedup, EmbedStats, Search, TextAnalysis, TrainingData}

/** Specs for the round-9 additions: association/agreement statistics
  * (Cramér's V, McNemar, Cohen's kappa, partial correlation,
  * Mann–Kendall), ranking comparison (RBO), graph iterations
  * (HITS, label propagation), and the fold/centroid/dup-size audits.
  * The oracle queries pin cross-engine exactness; these pin the
  * semantic contracts — hand-computed fixtures for the iterative ops,
  * conservation/bound laws on the corpus for the rest. */
class StatsGraphSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ statistics

  test("cramers_v: V in [0,1], n conserves the order count") {
    val r = Distribution.cramersV(spark, TestSpark.Sf0001).head()
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(r.getLong(0) == orders)
    assert(r.getLong(3) >= 0L) // chi2 witness non-negative
    val v = r.getDouble(4)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("mcnemar: the four cells partition the orders") {
    val r = Distribution.mcnemarTest(spark, TestSpark.Sf0001).head()
    val cells = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    val orders = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey")).distinct().count()
    assert(cells == orders)
    if (r.getLong(1) + r.getLong(2) > 0) assert(r.getDouble(4) >= 0.0)
  }

  test("kappa: po/pe are probabilities, kappa <= 1 and consistent with po/pe") {
    val r = TextAnalysis.cohenKappa(spark, TestSpark.Sf0001).head()
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(r.getLong(0) == docs)
    val (po, pe, kappa) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
    assert(kappa <= 1.0)
    // kappa = (po-pe)/(1-pe) up to the exact-arithmetic evaluation order
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-9)
  }

  test("partial correlation: all four coefficients bounded by 1") {
    val r = Regression.partialCorrQuery(spark, TestSpark.Sf0001).head()
    for (i <- 1 to 4) assert(math.abs(r.getDouble(i)) <= 1.0)
  }

  test("mann-kendall: |S| bounded by the pair count, z sign follows S") {
    val r = TimeSeries.mannKendall(spark, TestSpark.Sf0001).head()
    val n = r.getLong(0); val s = r.getLong(1); val var18 = r.getLong(2)
    assert(math.abs(s) <= n * (n - 1) / 2)
    assert(var18 >= 0L)
    if (var18 > 0 && s != 0) assert(math.signum(r.getDouble(3)) == math.signum(s.toDouble))
  }

  // ---------------------------------------------------------------- ranking

  test("rbo: bounded by the truncated-series maximum, overlap consistency") {
    val r = Search.rboQuery(spark, TestSpark.Sf0001).head()
    val ovK = r.getLong(1); val scaled = r.getLong(2); val rbo = r.getDouble(3)
    assert(ovK >= 0L && ovK <= 10L)
    assert(rbo >= 0.0 && rbo <= 1023.0 / 1024.0 + 1e-12)
    assert((scaled == 0L) == (ovK == 0L)) // ov_d monotone in d
  }

  // ------------------------------------------------------------------ HITS

  test("hits: hand-computed 3-round fixture is reproduced exactly") {
    // 1→10, 2→10, 2→11. Quantized rounds give (hand-replayed):
    //   r1: a=(10:10000, 11:5000)   h=(1:6666, 2:10000)
    //   r2: a=(10:10000, 11:6000)   h=(1:6250, 2:10000)
    //   r3: a=(10:10000, 11:6153)   h=(1:6190, 2:10000)
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val got = PageRank.hits(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((6190L, 0L)), 2L -> ((10000L, 0L)),
      10L -> ((0L, 10000L)), 11L -> ((0L, 6153L))))
  }

  test("hits: empty edge list yields an empty result, no null crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.hits(empty, iters = 1).count() == 0L)
  }

  test("hits query: bipartite orientation zeroes the off roles") {
    val h = PageRank.hitsQuery(spark, TestSpark.Sf0001)
    // suppliers (node >= 0) are pure hubs, customers pure authorities
    assert(h.filter(col("node") >= 0 && col("authority") =!= 0L).count() == 0)
    assert(h.filter(col("node") < 0 && col("hub") =!= 0L).count() == 0)
    assert(h.agg(max(col("hub"))).head().getLong(0) == 10000L)
  }

  // ----------------------------------------------------- label propagation

  test("label propagation: disjoint triangles converge to the component min") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = tri.toDF("src", "dst")
      .unionAll(tri.map(_.swap).toDF("src", "dst"))
    val got = PageRank.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("label propagation query: labels are node ids, sizes conserve nodes") {
    val l = PageRank.labelPropQuery(spark, TestSpark.Sf0001)
    val n = l.count()
    val bySize = l.select(col("label"), col("comm_size")).distinct()
      .agg(sum(col("comm_size"))).head().getLong(0)
    assert(bySize == n)
  }

  // ------------------------------------------------------------- dup sizes

  test("component sizes reconcile with the dup-cluster table") {
    val hist = Dedup.componentSizeDist(spark, TestSpark.Sf0001)
    val total = hist.agg(coalesce(sum(col("n_docs")), lit(0L))).head().getLong(0)
    val clustered = Dedup.dupClusters(spark, TestSpark.Sf0001).count()
    assert(total == clustered)
    assert(hist.filter(col("cluster_size") < 2).count() == 0) // no singletons
  }

  // ------------------------------------------------------------- ML audits

  test("xval folds: every doc lands in exactly one of k folds") {
    val f = TrainingData.xvalFolds(spark, TestSpark.Sf0001)
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(f.agg(sum(col("docs"))).head().getLong(0) == docs)
    assert(f.filter(col("fold") < 0 || col("fold") >= 5).count() == 0)
    // shares sum to 1 within each fold
    val shares = f.groupBy("fold").agg(sum(col("lang_share")).as("s"))
      .collect()
    shares.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("markov baseline: predicted cell is the row argmax, pairs conserved") {
    val acc = graft.operators.EventOps.markovAccuracy(spark, TestSpark.Sf0001)
    val trans = graft.operators.EventOps.eventTransitions(spark, TestSpark.Sf0001)
    val rowMax = trans.groupBy(col("prev_type"))
      .agg(max(col("cnt")).as("mx"), sum(col("cnt")).as("tot"))
    val j = acc.join(rowMax, "prev_type").collect()
    j.foreach { r =>
      assert(r.getAs[Long]("n_correct") == r.getAs[Long]("mx"))
      assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("tot"))
    }
  }

  test("mde: reproduces the closed form from its own stats columns") {
    graft.operators.Distribution.mdeQuery(spark, TestSpark.Sf0001).collect()
      .foreach { r =>
        val n = r.getLong(1); val sd = r.getDouble(3); val mde = r.getDouble(4)
        assert(mde > 0.0)
        assert(math.abs(mde - 2.8 * sd * math.sqrt(2.0 / n)) < 1e-9)
      }
  }

  test("kmv union sketch equals the sketch of the raw union (mergeability)") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .filter(col("source").isin("src1", "src2"))
      .select(md5(col("text")).as("fp")).distinct()
      .withColumn("h", conv(substring(col("fp"), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0))
    val direct = docs.orderBy(col("h").asc, col("fp").asc).limit(16)
      .select("fp").collect().map(_.getString(0)).toSet
    // merged-sketch h_k must equal the direct union sketch's h_k, so the
    // estimator is identical whichever way the sketch was built
    val viaMerge = graft.operators.Approx.kmvUnion(spark, TestSpark.Sf0001).head()
    val directKth = docs.orderBy(col("h").asc, col("fp").asc).limit(16)
      .agg(max(col("h"))).head().getDouble(0)
    assert(viaMerge.getLong(0) == direct.size)
    assert(math.abs((viaMerge.getLong(0) - 1.0) / directKth -
      viaMerge.getDouble(3)) < 1e-12)
  }

  test("stylometry: full pair matrix, non-negative deltas, bounded terms") {
    val d = graft.scale.TextAnalysis.burrowsDelta(spark, TestSpark.Sf0001)
    val rows = d.collect()
    val nSrc = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms") >= 1L && r.getAs[Long]("n_terms") <= 20L)
      assert(r.getAs[Double]("delta") >= 0.0)
    }
  }

  test("grid clustering: clusters + noise conserve every vector") {
    val g = graft.scale.EmbedStats.gridClusterQuery(spark, TestSpark.Sf0001)
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(g.agg(sum(col("n_points"))).head().getLong(0) == vecs)
    assert(g.filter(col("cluster_id") >= 0).count() >= 1)
  }

  test("centroid classifier: confusion cells conserve the corpus") {
    val c = EmbedStats.centroidClassifyQuery(spark, TestSpark.Sf0001)
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(c.agg(sum(col("n"))).head().getLong(0) == vecs)
    // per-label recall shares sum to 1
    c.groupBy("label").agg(sum(col("recall_share")).as("s")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }
}
