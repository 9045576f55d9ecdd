package graft

import org.apache.spark.sql.functions._

import graft.TestSpark.Sf0001

/** Invariant specs for the round-9 third batch: PACF, Mahalanobis
  * outliers, readability and Zipf text profiles, zone-map pruning,
  * scene cuts, and DBSCAN density triage. The DuckDB oracle pins exact
  * values; these pin structure (bounds, conservation, monotonicity —
  * and for zone maps the actual pruning claim: sorting helps). */
class StatsLayoutSpec extends SparkSpec {

  test("pacf: lag-1 pacf equals r1, all coefficients in [-1,1]") {
    val r = graft.operators.Regression.pacfQuery(spark, Sf0001).head()
    assert(r.getAs[Double]("pacf1") == r.getAs[Double]("r1"))
    for (c <- Seq("r1", "r2", "r3", "pacf1", "pacf2", "pacf3")) {
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c out of [-1,1]: $v")
    }
  }

  test("mahalanobis: k rows, nonnegative md2, nonincreasing score") {
    val rows = graft.operators.Distribution
      .mahalanobisQuery(spark, Sf0001).collect()
    assert(rows.length == 15)
    var last = Double.MaxValue
    for (r <- rows) {
      val s = r.getAs[Double]("score")
      assert(s <= last, "scores not sorted descending")
      // positive-definite scatter: quadratic form and det both positive
      assert(r.getAs[Double]("md2") >= 0.0)
      last = s
    }
  }

  test("readability: bucket rollup conserves docs and shares sum to 1") {
    val rows = graft.scale.TextAnalysis
      .readabilityQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"shares sum $shares")
    assert(rows.forall(r => r.getAs[Long]("n_docs") > 0))
    assert(rows.forall(r =>
      r.getAs[Long]("sum_syllables") <= r.getAs[Long]("sum_words") * 20))
  }

  test("zipf: ranked head with exact constancy witness and decay <= 1") {
    val rows = graft.scale.TextAnalysis.zipfQuery(spark, Sf0001).collect()
    assert(rows.length == 30)
    var lastCnt = Long.MaxValue
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getAs[Long]("rank") == i + 1L)
      val cnt = r.getAs[Long]("cnt")
      assert(cnt <= lastCnt, "freqs not non-increasing")
      assert(r.getAs[Long]("zipf_c") == (i + 1L) * cnt)
      if (i > 0) assert(r.getAs[Double]("decay") <= 1.0)
      lastCnt = cnt
    }
  }

  test("zonemap: sorting prunes — sorted layout never scans more shards") {
    val rows = graft.scale.Layout.zonemapQuery(spark, Sf0001).collect()
    assert(rows.length == 12)
    for (r <- rows) {
      val (nat, srt) = (r.getAs[Long]("shards_natural"),
        r.getAs[Long]("shards_sorted"))
      val ns = r.getAs[Long]("n_shards")
      assert(nat <= ns && srt <= ns)
      assert(srt <= nat,
        s"month ${r.getAs[Long]("probe_month")}: sorted $srt > natural $nat")
      if (r.getAs[Long]("rows_matched") > 0) assert(srt >= 1)
    }
    // the whole point: across the year the sorted layout scans fewer
    val totNat = rows.map(_.getAs[Long]("shards_natural")).sum
    val totSrt = rows.map(_.getAs[Long]("shards_sorted")).sum
    assert(totSrt < totNat, s"no pruning win: sorted $totSrt vs $totNat")
  }

  test("scene cuts: frame accounting exact, scene bounds hold") {
    val rows = graft.scale.Multimodal.sceneCutsQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val dur = r.getAs[Long]("duration_ms")
      val frames = r.getAs[Long]("n_frames")
      assert(frames == (dur + 999L) / 1000L, "frame count drifted")
      val scenes = r.getAs[Long]("n_scenes")
      assert(scenes >= 1L && scenes <= frames)
      assert(r.getAs[Long]("longest_scene_ms") <= frames * 1000L)
    }
  }

  test("rrf: fused scores bounded and sorted, ranks from both lists") {
    val rows = graft.scale.Search.rrfQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var last = Double.MaxValue
    for (r <- rows) {
      val s = r.getAs[Double]("rrf")
      assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-12)
      assert(s <= last)
      assert(!(r.isNullAt(r.fieldIndex("r_lex")) &&
        r.isNullAt(r.fieldIndex("r_sem"))))
      last = s
    }
  }

  test("kruskal: H nonnegative, tie correction in (0,1]") {
    val r = graft.operators.Distribution.kruskalQuery(spark, Sf0001).head()
    assert(r.getAs[Double]("h") >= -1e-9)
    val c = r.getAs[Double]("c_ties")
    assert(c > 0.0 && c <= 1.0)
    assert(r.getAs[Double]("h_adj") >= r.getAs[Double]("h") - 1e-9)
  }

  test("cronbach: alpha bounded above by k/(k-1)") {
    val r = graft.operators.Distribution.cronbachQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("n_days") > 0)
    assert(r.getAs[Double]("alpha") <= 1.25 + 1e-12)
  }

  test("dispersion: chi2 consistent with (n-1)*D") {
    val r = graft.operators.TimeSeries.dispersionQuery(spark, Sf0001).head()
    val (n, d, chi2) = (r.getAs[Long]("n_days"),
      r.getAs[Double]("dispersion"), r.getAs[Double]("chi2"))
    assert(d > 0.0)
    assert(math.abs(chi2 - (n - 1).toDouble * d) < 1e-9 * chi2.abs)
  }

  test("pps sample: HT estimate lands near truth, counts partition") {
    val r = graft.scale.TrainingData.ppsSampleQuery(spark, Sf0001).head()
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("n_cert") + r.getAs[Long]("n_sampled") <= n)
    val est = r.getAs[Double]("est_cents")
    val truth = r.getAs[Long]("true_total_cents").toDouble
    assert(est > 0.0)
    val rel = r.getAs[Double]("rel_err")
    assert(math.abs(est / truth - 1.0 - rel) < 1e-9, "rel_err inconsistent")
    assert(math.abs(rel) < 0.5, s"PPS estimate wildly off: $rel")
  }

  test("levene: W nonnegative, medians inside each group's value range") {
    val r = graft.operators.Distribution.leveneQuery(spark, Sf0001).head()
    assert(r.getAs[Double]("w") >= 0.0)
    val mn = graft.sources.Tables.orders(spark, Sf0001)
      .agg(min((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")), max((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).head()
    for (g <- 1 to 5) {
      val m = r.getAs[Long](s"med$g")
      assert(m >= mn.getLong(0) && m <= mn.getLong(1))
    }
  }

  test("tukey: ten antisymmetric pairs, positive SE") {
    val rows = graft.operators.Distribution.tukeyQuery(spark, Sf0001).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      assert(r.getAs[Long]("g1") < r.getAs[Long]("g2"))
      assert(r.getAs[Double]("se") > 0.0)
      // significance is exactly |diff| > q * se
      val sig = math.abs(r.getAs[Double]("diff_cents")) >
        3.858 * r.getAs[Double]("se")
      assert(r.getAs[Boolean]("significant") == sig)
    }
  }

  test("pettitt: statistic bounded by the exact K maximum") {
    val r = graft.operators.Distribution.pettittQuery(spark, Sf0001).head()
    val n = r.getAs[Long]("n_days")
    // |K_t| <= t(n-t) + small: the absolute ceiling is n^2/2
    assert(r.getAs[Long]("k_stat") >= 0 &&
      r.getAs[Long]("k_stat") <= n * n)
    val kn = r.getAs[Double]("k_norm")
    assert(kn >= 0.0 && kn <= 1.0)
  }

  test("rich club: ladder internally consistent") {
    val rows = graft.operators.KCore.richClubQuery(spark, Sf0001).collect()
    assert(rows.length == 4)
    var lastN = Long.MaxValue
    for (r <- rows) {
      val (n, e) = (r.getAs[Long]("n_rich"), r.getAs[Long]("e_rich"))
      assert(n <= lastN, "rich-node count must shrink with k")
      assert(e <= n * (n - 1) / 2 + n, "edge count exceeds potential")
      lastN = n
    }
  }

  test("peaks: every peak beats its neighbors, prominence positive") {
    val rows = graft.operators.TimeSeries.peaksQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var last = Long.MaxValue
    for (r <- rows) {
      val p = r.getAs[Long]("prominence")
      assert(p > 0L)
      assert(p <= last)
      last = p
    }
  }

  test("cmh: statistic nonnegative, pooled OR positive") {
    val r = graft.operators.Distribution.cmhQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("n_strata") == 7L)
    assert(r.getAs[Double]("cmh") >= 0.0)
    assert(r.getAs[Double]("or_mh") > 0.0)
  }

  test("tail dep: lambdas in [0,1], decile counts near n/10") {
    val r = graft.operators.Distribution.tailDepQuery(spark, Sf0001).head()
    val n = r.getAs[Long]("n")
    for (c <- Seq("lambda_u", "lambda_l")) {
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c out of [0,1]: $v")
    }
    assert(r.getAs[Long]("n_hi_x") == n - (9 * n) / 10)
    assert(r.getAs[Long]("n_lo_x") == n / 10)
    assert(r.getAs[Long]("both_hi") <= r.getAs[Long]("n_hi_x"))
  }

  test("mutual knn: edge accounting exact, fraction bounded") {
    val r = graft.scale.Similarity.mutualKnnQuery(spark, Sf0001).head()
    val (np, k, ne, nm) = (r.getAs[Long]("n_points"), r.getAs[Long]("k"),
      r.getAs[Long]("n_edges"), r.getAs[Long]("n_mutual"))
    assert(ne == np * k, "every point must emit exactly k edges")
    assert(nm % 2 == 0, "mutual edges come in pairs")
    val f = r.getAs[Double]("mutual_frac")
    assert(f >= 0.0 && f <= 1.0)
  }

  test("mmd: nonnegative, zero against itself") {
    val r = graft.scale.EmbedStats.mmdQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("n_dims") == 64L)
    assert(r.getAs[Double]("mmd2") >= 0.0)
    // same-population MMD must be exactly zero by construction
    val same = graft.scale.EmbedStats.mmdQuery(spark, Sf0001, 0, 0).head()
    assert(same.getAs[Long]("mmd2_w") == 0L)
  }

  test("calinski: scatter decomposition holds (wss <= tss)") {
    val r = graft.scale.EmbedStats.calinskiQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("k") == 10L)
    val (tss, wss) = (r.getAs[Double]("tss"), r.getAs[Double]("wss"))
    assert(wss >= 0.0 && wss <= tss, s"wss $wss > tss $tss")
    assert(r.getAs[Double]("ch") >= 0.0)
  }

  test("xcorr: seven lags, r bounded, lag 0 strongest magnitude") {
    val rows = graft.operators.Regression.xcorrQuery(spark, Sf0001).collect()
    assert(rows.length == 7)
    val byLag = rows.map(r =>
      r.getAs[Long]("lag") -> r.getAs[Double]("r")).toMap
    for ((_, r) <- byLag) assert(r >= -1.0 && r <= 1.0)
    // volume and value on the SAME day are mechanically coupled:
    // the contemporaneous correlation should dominate the lags
    assert(byLag.values.map(math.abs).max == math.abs(byLag(0L)))
  }

  test("dbscan: triage partitions the corpus") {
    val r = graft.scale.EmbedStats.dbscanCoreQuery(spark, Sf0001).head()
    val (n, c, b, o) = (r.getAs[Long]("n_points"), r.getAs[Long]("n_core"),
      r.getAs[Long]("n_border"), r.getAs[Long]("n_noise"))
    assert(c >= 0 && b >= 0 && o >= 0)
    assert(c + b + o == n, s"triage leaks: $c+$b+$o != $n")
    assert(n == graft.sources.Tables.embeddings(spark, Sf0001).count())
  }
}
