package graft

import org.apache.spark.sql.functions._

import graft.ml.Eval
import graft.operators.EntityResolution
import graft.scale.{EmbedStats, Search, Similarity}

/** Specs for the retrieval/eval additions: TextRank keywords, MMR
  * diversified retrieval, phonetic blocking, HBOS outliers, NDCG@10,
  * and split-conformal coverage. The oracle queries pin cross-engine
  * exactness; these pin the semantic contracts. */
class RetrievalEvalSpec extends SparkSpec {

  test("textrank: ranks positive, bounded by pool, terms from the corpus vocab") {
    val tr = Search.textrankQuery(spark, TestSpark.Sf0001).collect()
    assert(tr.length == 30)
    assert(tr.forall(_.getLong(1) > 0L))
    val vocab = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(tr.forall(r => vocab.contains(r.getString(0))))
  }

  test("mmr: first pick is the knn top-1; picks are distinct; scores sane") {
    val sel = Similarity.mmrSelect(spark, TestSpark.Sf0001).orderBy("pick").collect()
    assert(sel.length == 5)
    val knn1 = Similarity.knnBruteForce(spark, TestSpark.Sf0001, k = 1)
      .head().getLong(0)
    assert(sel.head.getAs[Long]("vec_id") == knn1)
    assert(sel.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // after pick 1: score = 0.7·rel − 0.3·msim with msim ∈ [−1, 1]
    sel.tail.foreach { r =>
      val s = r.getAs[Double]("mmr_score"); val rel = r.getAs[Double]("rel")
      assert(s <= 0.7 * rel + 0.3 + 1e-12 && s >= 0.7 * rel - 0.3 - 1e-12)
    }
  }

  test("phonetic key: classic collisions collide, distinct sounds don't") {
    import spark.implicits._
    val df = Seq("red", "rod", "ring", "gear", "robert", "rupert")
      .toDF("term")
      .select(col("term"), EntityResolution.phoneticKey(col("term")).as("k"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("red") == m("rod"))       // R300
    assert(m("robert") == m("rupert")) // R163
    assert(m("red") != m("ring"))
    assert(m("ring") != m("gear"))
    assert(m.values.forall(k => k.length == 4))
  }

  test("hbos: the planted rarest corner scores below a dense-bin row") {
    val top = EmbedStats.hbosQuery(spark, TestSpark.Sf0001).collect()
    assert(top.length == 20)
    val rs = top.map(r => BigInt(r.getAs[String]("rarity")))
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b }) // sorted ascending
    top.foreach { r =>
      val prod = (1 to 4).map(d => BigInt(r.getAs[Long](s"c$d"))).product
      assert(prod == BigInt(r.getAs[String]("rarity")))
    }
  }

  test("ndcg: bounded by 1, ideal ranking scores exactly 1 against itself") {
    val r = Eval.ndcgQuery(spark, TestSpark.Sf0001).head()
    val (dcg, idcg, ndcg) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(idcg > 0.0 && dcg > 0.0)
    assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-12)
    assert(math.abs(ndcg - dcg / idcg) == 0.0)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 10L)
  }

  test("friedman: rank sums partition n(k)(k+1)/2, Q non-negative for k=3") {
    val r = graft.operators.Distribution
      .friedmanQuery(spark, TestSpark.Sf0001).head()
    val n = r.getLong(0)
    val rs = (1 to 3).map(j => r.getLong(j))
    assert(rs.sum == 6 * n) // each block contributes ranks {1,2,3}
    rs.foreach(s => assert(s >= n && s <= 3 * n))
    assert(r.getDouble(4) >= -1e-9)
  }

  test("cochran q: closed form reconciles with its own cells") {
    val r = graft.operators.Distribution.cochranQ(spark, TestSpark.Sf0001).head()
    val (c1, c2, c3, sr2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val t = c1 + c2 + c3
    assert(r.getLong(4) == 2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - t * t))
    assert(r.getLong(5) == 3 * t - sr2)
    assert(r.getLong(4) >= 0L) // 3·ΣC² ≥ T² by Cauchy–Schwarz
  }

  test("stump: exactly one best split; children partition the population") {
    val rows = Eval.stumpQuery(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 9)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    val n0 = rows.head.getAs[Long]("n_left") + rows.head.getAs[Long]("n_right")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n0)
      assert(r.getAs[Long]("pos_left") <= r.getAs[Long]("n_left"))
      assert(r.getAs[Long]("pos_right") <= r.getAs[Long]("n_right"))
    }
    val best = rows.filter(_.getAs[Boolean]("is_best")).head
    assert(rows.forall(_.getAs[Double]("score") <= best.getAs[Double]("score")))
  }

  test("silhouette: s bounded by [-1,1], labels conserve the corpus") {
    val rows = EmbedStats.silhouetteQuery(spark, TestSpark.Sf0001).collect()
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum == vecs)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_s")
      assert(m >= -1.0 && m <= 1.0)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
  }

  test("kcenter: picks distinct, radius non-increasing is NOT required, " +
    "but every dmin is a real max-min distance in [0,2]") {
    val sel = Similarity.kcenterSelect(spark, TestSpark.Sf0001)
      .orderBy("pick").collect()
    assert(sel.length == 5)
    assert(sel.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    assert(sel.head.getAs[Long]("vec_id") == 0L)
    sel.tail.foreach { r =>
      val d = r.getAs[Double]("dmin")
      assert(d >= 0.0 && d <= 2.0)
    }
    // Gonzalez invariant: each pick's dmin (vs the set at selection
    // time) is >= the NEXT pick's dmin measured against a superset
    val ds = sel.tail.map(_.getAs[Double]("dmin"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("sssp: seed at 0, weighted dists dominate hop dists, monotone vs bfs") {
    val d = graft.operators.KCore.ssspQuery(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seed = graft.sources.Tables.supplier(spark, TestSpark.Sf0001)
      .agg(min(col("s_suppkey"))).head().getLong(0)
    assert(d(seed) == 0L)
    assert(d.values.forall(_ >= 0L))
    // every non-seed distance is a sum of >=1 positive edge weights
    assert(d.filter(_._1 != seed).values.forall(_ > 0L))
  }

  test("cdc chunks: tokens conserved, chunk count = boundaries + docs") {
    val rows = graft.scale.TextAnalysis
      .cdcChunksQuery(spark, TestSpark.Sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val totTokens = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totTokens)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chunks") >= 1L)
      assert(r.getAs[Long]("max_len") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("mean_len") > 0.0)
    }
  }

  test("hhi: bounded by [1/n, 1], top_share <= 1") {
    graft.operators.Analytics.hhiQuery(spark, TestSpark.Sf0001)
      .collect().foreach { r =>
        val n = r.getAs[Long]("n_suppliers")
        val h = r.getAs[Double]("hhi")
        assert(h >= 1.0 / n - 1e-12 && h <= 1.0 + 1e-12)
        val ts = r.getAs[Double]("top_share")
        assert(ts > 0.0 && ts <= 1.0)
        assert(h <= ts + 1e-12) // Σs² ≤ max_s·Σs ⇒ HHI ≤ top_share
      }
  }

  test("hist median: the merged histogram bin contains the exact median") {
    val r = graft.operators.Approx.histMedianQuery(spark, TestSpark.Sf0001)
      .head()
    assert(r.getAs[Boolean]("in_bin"))
    assert(r.getAs[Long]("bin_count") >= 1L)
    assert(r.getAs[Long]("k") == (r.getAs[Long]("n") + 1) / 2)
  }

  test("ann recall: bucket arm is a subset search — recall in [0,1], " +
    "candidates smaller than the corpus") {
    val r = graft.scale.Similarity.annRecallQuery(spark, TestSpark.Sf0001)
      .head()
    val corpus = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(r.getAs[Long]("n_candidates") < corpus)
    val rec = r.getAs[Double]("recall")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("k"))
  }

  test("walks: one walk per supplier, every end node is in the graph") {
    val w = graft.operators.KCore.walksQuery(spark, TestSpark.Sf0001).collect()
    val nSup = graft.sources.Tables.supplier(spark, TestSpark.Sf0001).count()
    assert(w.length == nSup)
    // 3 steps on a bipartite graph from the supplier side lands on the
    // customer side (odd path length) — a structural walk invariant
    w.foreach(r => assert(r.getAs[Long]("end_node") < 0L))
  }

  test("link prediction: candidates are non-edges; RA score reconciles") {
    val top = graft.operators.KCore.linkPredQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Long]("ra_score") > 0L)
      assert(r.getAs[Long]("n_common") >= 1L)
      // per-z weight <= 10^6, so score <= n_common * 10^6
      assert(r.getAs[Long]("ra_score") <= r.getAs[Long]("n_common") * 1000000L)
    }
  }

  test("cuped: reduction = rho^2 in [0,1]; theta sign matches covariance") {
    val r = graft.operators.Distribution.cupedQuery(spark, TestSpark.Sf0001)
      .head()
    val red = r.getAs[Double]("reduction")
    assert(red >= 0.0 && red <= 1.0 + 1e-12)
    assert(!r.getAs[Double]("theta").isNaN)
  }

  test("tv drift: bounded by [0,1], witness consistent with the division") {
    val r = graft.operators.Distribution.tvDriftQuery(spark, TestSpark.Sf0001)
      .head()
    val tv = r.getAs[Double]("tv")
    assert(tv >= 0.0 && tv <= 1.0)
    assert(r.getAs[Long]("n_cells") >= 1L)
    val w = BigInt(r.getAs[String]("tv_witness"))
    val denom = BigInt(2) * BigInt(r.getAs[Long]("ta")) * BigInt(r.getAs[Long]("tb"))
    assert(math.abs(tv - (BigDecimal(w) / BigDecimal(denom)).toDouble) < 1e-15)
  }

  test("max cover: gains non-increasing (submodularity of greedy picks)") {
    val sel = graft.scale.TrainingData.maxCoverSelect(spark, TestSpark.Sf0001)
      .orderBy("pick").collect()
    assert(sel.nonEmpty)
    val gains = sel.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
    assert(sel.map(_.getAs[Long]("doc_id")).distinct.length == sel.length)
  }

  test("budget select: total tokens within the 20% budget, value positive") {
    val rows = graft.scale.TrainingData.budgetSelect(spark, TestSpark.Sf0001)
      .collect()
    val totTokens = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    val used = rows.map(_.getAs[Long]("tokens_used")).sum
    assert(used <= totTokens / 5)
    assert(used > 0L)
    rows.foreach(r =>
      assert(r.getAs[Long]("value_sum") >= r.getAs[Long]("n_selected")))
  }

  test("join size: the subset estimate equals the executed join exactly") {
    val r = graft.operators.Profile.joinSizeQuery(spark, TestSpark.Sf0001)
      .head()
    assert(r.getAs[Boolean]("est_exact"))
    assert(r.getAs[Long]("est_sub") == r.getAs[Long]("actual_sub"))
    assert(BigInt(r.getAs[String]("est_full")) >= BigInt(r.getAs[Long]("n_keys")))
  }

  test("kn counts: continuation bounded by raw count and by the vocab") {
    val rows = graft.scale.LmScore.knCountsQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.length == 30)
    val vocab = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " "))).distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cont") <= vocab) // ≤ distinct predecessors
      assert(r.getAs[Long]("n_succ") <= vocab)
      val p = r.getAs[Double]("continuation_p")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("phrase search: the positional join reproduces the ngram count") {
    val r = graft.scale.Search.phraseSearchQuery(spark, TestSpark.Sf0001)
      .head()
    assert(r.getAs[Boolean]("index_exact"))
    assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("total_occurrences"))
    assert(r.getAs[String]("phrase").split(" ").length == 2)
  }

  test("rendezvous: docs conserved, removal only grows survivors") {
    val rows = graft.scale.TrainingData
      .rendezvousQuery(spark, TestSpark.Sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(rows.map(_.getAs[Long]("n_after")).sum == docs)
    assert(rows.forall(_.getAs[Boolean]("only_grows")))
    assert(rows.filter(_.getAs[Long]("node") == 0L)
      .forall(_.getAs[Long]("n_after") == 0L))
  }

  test("weak labels: self-pairs have zero conflict; overlap symmetric bound") {
    val rows = graft.scale.TrainingData
      .weakLabelsQuery(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 6)
    rows.filter(r => r.getAs[String]("lf_a") == r.getAs[String]("lf_b"))
      .foreach(r => assert(r.getAs[Long]("n_conflict") == 0L))
    val cov = rows.filter(r => r.getAs[String]("lf_a") == r.getAs[String]("lf_b"))
      .map(r => r.getAs[String]("lf_a") -> r.getAs[Long]("n_overlap")).toMap
    rows.filter(r => r.getAs[String]("lf_a") != r.getAs[String]("lf_b"))
      .foreach { r =>
        val bound = math.min(cov(r.getAs[String]("lf_a")),
          cov(r.getAs[String]("lf_b")))
        assert(r.getAs[Long]("n_overlap") <= bound)
        assert(r.getAs[Long]("n_conflict") <= r.getAs[Long]("n_overlap"))
      }
  }

  test("conformal: q_hat is a calibration residual quantile; coverage near 0.9") {
    val r = Eval.conformalQuery(spark, TestSpark.Sf0001).head()
    val nCal = r.getAs[Long]("n_cal")
    val qHat = r.getAs[Double]("q_hat")
    val cov = r.getAs[Double]("coverage")
    assert(nCal > 0L && qHat > 0.0)
    // finite-sample conformal guarantee is >= 0.9 in expectation over
    // exchangeable folds; allow sampling slack on the tiny corpus
    assert(cov > 0.8 && cov <= 1.0)
    assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
  }
}
