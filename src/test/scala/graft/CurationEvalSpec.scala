package graft

import org.apache.spark.sql.functions._

import graft.TestSpark.Sf0001

/** Invariant specs for the round-9 late-batch operators: ranking-curve
  * eval, agreement statistics, batching/blocking audits, and the R/S
  * long-range-dependence table. Each test pins a MATHEMATICAL property
  * of the operator (monotonicity, bounds, conservation) — the DuckDB
  * oracle already pins exact values, so these guard semantics under
  * future refactors at a different level. */
class CurationEvalSpec extends SparkSpec {

  test("pr curve: tp/recall monotone, precision bounded, f1 consistent") {
    val rows = graft.ml.Eval.prCurveQuery(spark, Sf0001).collect()
    assert(rows.length == 50)
    var lastTp = 0L
    for (r <- rows) {
      val (k, tp) = (r.getAs[Long]("k"), r.getAs[Long]("tp"))
      val (p, rec, f1) = (r.getAs[Double]("precision"),
        r.getAs[Double]("recall"), r.getAs[Double]("f1"))
      assert(tp >= lastTp && tp <= k, s"tp not a cum count at k=$k")
      assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
      // f1 = 2pr/(p+r) must agree with the 2tp/(k+P) algebraic form
      if (p + rec > 0)
        assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-12)
      lastTp = tp
    }
  }

  test("fleiss kappa: bounds and two-category floors") {
    val r = graft.ml.Eval.fleissKappaQuery(spark, Sf0001).head()
    val (pBar, pE, kappa) = (r.getAs[Double]("p_bar"),
      r.getAs[Double]("p_e"), r.getAs[Double]("kappa"))
    // 3 raters / 2 categories: per-item agreement >= 1/3, chance >= 1/2
    assert(pBar >= 1.0 / 3 && pBar <= 1.0)
    assert(pE >= 0.5 && pE <= 1.0)
    assert(kappa <= 1.0 && kappa >= -1.0)
  }

  test("effective dim: participation ratio within [1, width]") {
    val r = graft.scale.EmbedStats.effectiveDimQuery(spark, Sf0001).head()
    val (width, pr, top) = (r.getAs[Long]("width"),
      r.getAs[Double]("pr_dims"), r.getAs[Double]("top_share"))
    assert(pr >= 1.0 && pr <= width.toDouble)
    assert(top >= 1.0 / width && top <= 1.0)
  }

  test("padding waste: sorted batching never worse than arrival order") {
    val rows = graft.scale.TrainingData.paddingWasteQuery(spark, Sf0001)
      .collect().map(r => r.getAs[String]("strategy") -> r).toMap
    val (a, s) = (rows("arrival"), rows("sorted"))
    assert(a.getAs[Long]("total_tokens") == s.getAs[Long]("total_tokens"),
      "both strategies batch the same corpus")
    assert(s.getAs[Long]("waste_tokens") <= a.getAs[Long]("waste_tokens"),
      "length-sorted batching must not increase padding")
    for (r <- Seq(a, s)) {
      assert(r.getAs[Long]("padded_tokens") ==
        r.getAs[Long]("total_tokens") + r.getAs[Long]("waste_tokens"))
      val eff = r.getAs[Double]("efficiency")
      assert(eff > 0.0 && eff <= 1.0)
    }
  }

  test("quantile norm: reference distribution monotone in rank, counts conserved") {
    val df = graft.scale.TextAnalysis.quantileNormQuery(spark, Sf0001)
    val perSource = df.groupBy("source").count().collect()
    val docCounts = graft.sources.Tables.documents(spark, Sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- perSource)
      assert(r.getLong(1) == docCounts(r.getString(0)),
        s"source ${r.getString(0)} lost rows")
    val ref = df.select("r", "norm_len").distinct()
      .orderBy("r").collect().map(_.getAs[Double]("norm_len"))
    assert(ref.zip(ref.tail).forall { case (x, y) => x <= y },
      "mean-of-order-statistics must be non-decreasing in rank")
  }

  test("BH FDR: padj monotone in rank, dominates p, rejections a prefix") {
    val rows = graft.operators.Distribution.bhFdrQuery(spark, Sf0001)
      .orderBy("i").collect()
    assert(rows.length == 25)
    var lastAdj = 0.0
    var sawAccept = false
    for (r <- rows) {
      val (p, padj) = (r.getAs[Double]("p"), r.getAs[Double]("padj"))
      assert(padj >= p - 1e-15, "step-up adjustment cannot shrink p")
      assert(padj >= lastAdj - 1e-15, "padj must be monotone in rank")
      val rej = r.getAs[Boolean]("reject")
      if (!rej) sawAccept = true
      assert(!(sawAccept && rej), "BH rejections must form a rank prefix")
      lastAdj = padj
    }
  }

  test("degree centralization within [0, 1]; edges match the pair count") {
    val r = graft.operators.KCore.degreeCentralizationQuery(spark, Sf0001).head()
    val c = r.getAs[Double]("centralization")
    assert(c >= 0.0 && c <= 1.0)
    assert(r.getAs[Long]("n_edges") > 0 &&
      r.getAs[Long]("max_deg") <= r.getAs[Long]("n_nodes") - 1)
  }

  test("blocking eval: hit bounded by both pair sets, ratios in [0,1]") {
    val r = graft.scale.Dedup.blockingEvalQuery(spark, Sf0001).head()
    val (cand, truth, hit) = (r.getAs[Long]("n_cand_pairs"),
      r.getAs[Long]("n_true_pairs"), r.getAs[Long]("n_hit"))
    assert(hit <= math.min(cand, truth))
    val (pc, rr) = (r.getAs[Double]("pair_completeness"),
      r.getAs[Double]("reduction_ratio"))
    assert(pc >= 0.0 && pc <= 1.0)
    assert(rr >= 0.0 && rr <= 1.0)
    assert(r.getAs[Long]("total_pairs") >= cand)
  }

  test("youden: confusion cells conserve, J consistent with tpr - fpr") {
    val r = graft.ml.Eval.youdenQuery(spark, Sf0001).head()
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp >= 0 && fp >= 0 && fn >= 0 && tn >= 0)
    val orders = graft.sources.Tables.orders(spark, Sf0001).count()
    assert(tp + fp + fn + tn == orders, "cells must partition the orders")
    val (tpr, fpr, j) = (r.getAs[Double]("tpr"), r.getAs[Double]("fpr"),
      r.getAs[Double]("j"))
    assert(math.abs(j - (tpr - fpr)) < 1e-12)
    assert(j >= 0.0, "the argmax J can never be negative (t=+inf gives 0)")
  }

  test("vocab coverage: monotone, last power-of-two bounded by total") {
    val rows = graft.scale.Search.vocabCoverageQuery(spark, Sf0001)
      .orderBy("k").collect()
    assert(rows.nonEmpty)
    var (lastK, lastCov) = (0L, 0.0)
    for (r <- rows) {
      val (k, cov) = (r.getAs[Long]("k"), r.getAs[Double]("coverage"))
      assert((k & (k - 1)) == 0L && k > lastK, "ranks must be powers of two")
      assert(cov >= lastCov && cov <= 1.0, "coverage must be monotone")
      assert(r.getAs[Long]("cum_cnt") <= r.getAs[Long]("total_toks"))
      lastK = k; lastCov = cov
    }
  }

  test("jl distortion: mean ratio concentrates near 1, bounds sane") {
    val r = graft.scale.EmbedStats.jlDistortionQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("n_pairs") > 0)
    val (mn, mx, mean) = (r.getAs[Double]("min_ratio"),
      r.getAs[Double]("max_ratio"), r.getAs[Double]("mean_ratio"))
    assert(mn > 0.0 && mn <= mean && mean <= mx)
    // 16-dim +-1 projections of 64-dim vectors: the mean over 250 pairs
    // concentrates hard around 1 (each ratio is a chi^2_16/16-like var)
    assert(mean > 0.8 && mean < 1.2, s"JL estimator off: mean=$mean")
  }

  test("diameter: double sweep never shrinks the first-sweep radius") {
    val r = graft.operators.KCore.diameterQuery(spark, Sf0001).head()
    val (farDist, ecc) = (r.getAs[Long]("far_dist"),
      r.getAs[Long]("est_diameter"))
    assert(ecc >= farDist,
      "eccentricity of the farthest node bounds the first sweep's radius")
    assert(r.getAs[Long]("n_reached1") > 0 && r.getAs[Long]("n_reached2") > 0)
  }

  test("burstiness: bounded in (-1, 1), gaps non-negative on ordered input") {
    val rows = graft.operators.EventOps.burstinessQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0)
      assert(r.getAs[Double]("mean_gap_ms") > 0.0)
      assert(r.getAs[Double]("sd_gap_ms") >= 0.0)
    }
  }

  test("neyman: allocations bounded by budget, variance-tilted vs proportional") {
    val rows = graft.operators.Distribution.neymanQuery(spark, Sf0001).collect()
    val (ney, prop) = (rows.map(_.getAs[Long]("n_neyman")).sum,
      rows.map(_.getAs[Long]("n_proportional")).sum)
    // floor-division shares can undershoot by at most |strata| - 1
    assert(ney <= 1000 && ney > 1000 - rows.length)
    assert(prop <= 1000 && prop > 1000 - rows.length)
    for (r <- rows) assert(r.getAs[Double]("sigma") > 0.0)
  }

  test("fisher: eta^2 in [0,1], fisher consistent with eta/(1-eta)") {
    val rows = graft.scale.EmbedStats.fisherQuery(spark, Sf0001).collect()
    assert(rows.length == 64)
    for (r <- rows) {
      val (eta, f) = (r.getAs[Double]("eta_sq"), r.getAs[Double]("fisher"))
      assert(eta >= 0.0 && eta <= 1.0, s"eta out of range at dim ${r.get(0)}")
      assert(math.abs(f - eta / (1 - eta)) < 1e-9 * (1 + math.abs(f)))
    }
  }

  test("dim corr: |r| <= 1, ranked non-increasing, i < j") {
    val rows = graft.scale.EmbedStats.dimCorrQuery(spark, Sf0001).collect()
    assert(rows.length == 20)
    var last = Double.MaxValue
    for (r <- rows) {
      val c = math.abs(r.getAs[Double]("corr"))
      assert(c <= 1.0 + 1e-12)
      assert(c <= last + 1e-15, "must be ranked by |corr| descending")
      assert(r.getAs[Long]("i") < r.getAs[Long]("j"))
      last = c
    }
  }

  test("compaction: groups conserve rows, contiguous, greedy-bounded") {
    val rows = graft.scale.Layout.compactionPlanQuery(spark, Sf0001)
      .orderBy("grp").collect()
    val total = graft.sources.Tables.lineitem(spark, Sf0001).count()
    assert(rows.map(_.getAs[Long]("rows_out")).sum == total,
      "compaction groups must conserve every input row")
    for (w <- rows.sliding(2) if w.length == 2)
      assert(w(0).getAs[Long]("to_part") < w(1).getAs[Long]("from_part"),
        "groups must span disjoint, ordered partition ranges")
    // greedy bound: a group exceeds target only via its LAST partition
    for (r <- rows if r.getAs[Long]("n_parts") > 1)
      assert(r.getAs[Long]("rows_out") - r.getAs[Long]("n_parts") >= 0)
  }

  test("perm test: p in (0,1], cells conserve, null data gives high p") {
    val r = graft.operators.Distribution.permTestQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == r.getAs[Long]("n"))
    val p = r.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    assert(r.getAs[Long]("n_ge") <= r.getAs[Long]("n_perms"))
    // label-swap symmetry: the test statistic |mean gap| is symmetric in
    // the two groups, so swapping segA/segB must reproduce the report
    // exactly (modulo the group-size columns swapping)
    val swapped = graft.operators.Distribution
      .permTestQuery(spark, Sf0001, segA = "MACHINERY", segB = "BUILDING")
      .head()
    assert(swapped.getAs[Double]("p_value") == p)
    assert(swapped.getAs[Double]("obs_gap_cents") ==
      r.getAs[Double]("obs_gap_cents"))
    assert(swapped.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
  }

  test("mattr: bounded, and the O(n) form matches a brute-force recount") {
    val rows = graft.scale.TextAnalysis.mattrQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val m = r.getAs[Double]("mattr")
      assert(m > 0.0 && m <= 1.0)
    }
    // brute-force witness: recompute sum-of-window-distincts for one
    // source directly from the text and compare to the operator's total
    val src = rows.head.getAs[String]("source")
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .filter(col("source") === src)
      .select("text").collect().map(_.getString(0))
    val w = 25
    var (sumDistinct, nWindows) = (0L, 0L)
    for (t <- docs; toks = t.split(" "); if toks.length >= w;
         i <- (w - 1) until toks.length) {
      sumDistinct += toks.slice(i - w + 1, i + 1).distinct.length
      nWindows += 1
    }
    assert(rows.head.getAs[Long]("sum_distinct") == sumDistinct &&
      rows.head.getAs[Long]("n_windows") == nWindows,
      s"difference-array form diverged from brute force on $src")
  }

  test("wilson: interval brackets the rate and stays inside [0, 1]") {
    val rows = graft.operators.Distribution.wilsonQuery(spark, Sf0001).collect()
    assert(rows.length == 25)
    for (r <- rows) {
      val (rate, lo, hi) = (r.getAs[Double]("rate"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo >= 0.0 && hi <= 1.0, "Wilson never leaves the unit interval")
      assert(lo <= rate && rate <= hi)
    }
  }

  test("jackknife: influences cancel against source weights") {
    val rows = graft.operators.Distribution.jackknifeQuery(spark, Sf0001)
      .collect()
    val full = rows.head.getAs[Double]("full_mean")
    for (r <- rows) {
      // leaving out a below-average source must RAISE the mean, and
      // vice versa (sign identity of the jackknife influence)
      val sign = math.signum(full - r.getAs[Double]("own_mean"))
      val infl = r.getAs[Double]("influence")
      assert(infl == 0.0 || math.signum(infl) == sign,
        s"influence sign inverted for ${r.getString(0)}")
    }
  }

  test("seq3: support sums over top-k <= 1, counts bound users") {
    val rows = graft.operators.EventOps.seq3Query(spark, Sf0001).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Double]("support")).sum <= 1.0 + 1e-12)
    var last = Long.MaxValue
    for (r <- rows) {
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cnt"))
      assert(r.getAs[Long]("cnt") <= last); last = r.getAs[Long]("cnt")
    }
  }

  test("dedup sweep: pair and victim counts anti-monotone in tau") {
    val rows = graft.scale.Dedup.dedupSweepQuery(spark, Sf0001)
      .orderBy("tau").collect()
    assert(rows.length == 7)
    for (w <- rows.sliding(2) if w.length == 2) {
      assert(w(0).getAs[Long]("n_pairs") >= w(1).getAs[Long]("n_pairs"))
      assert(w(0).getAs[Long]("n_victims") >= w(1).getAs[Long]("n_victims"))
    }
    for (r <- rows)
      assert(r.getAs[Long]("n_victims") <= r.getAs[Long]("n_pairs") ||
        r.getAs[Long]("n_pairs") == 0)
  }

  test("qq: quantiles monotone within each side") {
    val rows = graft.operators.Distribution.qqQuery(spark, Sf0001)
      .orderBy("pct").collect()
    assert(rows.length == 9)
    for (w <- rows.sliding(2) if w.length == 2) {
      assert(w(0).getAs[Long]("v_a") <= w(1).getAs[Long]("v_a"))
      assert(w(0).getAs[Long]("v_b") <= w(1).getAs[Long]("v_b"))
    }
    for (r <- rows) assert(r.getAs[Double]("ratio") > 0.0)
  }

  test("smd: sign matches the mean gap; synthetic segments are balanced") {
    val rows = graft.operators.Distribution.smdQuery(spark, Sf0001).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val (ma, mb, smd) = (r.getAs[Double]("mean_a"),
        r.getAs[Double]("mean_b"), r.getAs[Double]("smd"))
      assert(smd == 0.0 || math.signum(smd) == math.signum(ma - mb))
      // segments are iid draws in this corpus: imbalance should be tiny
      assert(math.abs(smd) < 0.25, s"unexpected imbalance: $smd")
    }
  }

  test("vad spans: voiced time bounded by duration, spans bounded by frames") {
    val rows = graft.scale.Multimodal.vadSpansQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (dur, voiced, longest) = (r.getAs[Long]("duration_ms"),
        r.getAs[Long]("voiced_ms"), r.getAs[Long]("longest_span_ms"))
      assert(voiced <= dur + 99, "voiced time cannot exceed the item")
      assert(longest <= voiced)
      assert(r.getAs[Long]("n_spans") * 100 <= voiced,
        "every span holds at least one 100ms frame")
      val share = r.getAs[Double]("voiced_share")
      assert(share > 0.0 && share <= 1.1)
    }
  }

  test("mark-recapture: Chapman estimate within 1% of the countable truth") {
    val r = graft.operators.Approx.markRecaptureQuery(spark, Sf0001).head()
    val (m, n1, n2) = (r.getAs[Long]("m"), r.getAs[Long]("n1"),
      r.getAs[Long]("n2"))
    assert(m <= math.min(n1, n2))
    // near-complete capture occasions: the estimator must land on the
    // truth it is validated against
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.01,
      s"Chapman way off: ${r.getAs[Double]("chapman_est")}")
  }

  test("icc: bounded, near zero on iid synthetic orders") {
    val r = graft.operators.Distribution.iccQuery(spark, Sf0001).head()
    val icc = r.getAs[Double]("icc")
    assert(icc > -0.5 && icc < 1.0)
    assert(math.abs(icc) < 0.05,
      s"iid orders should show no customer-level price clustering: $icc")
    assert(r.getAs[Double]("ssb") >= 0.0 && r.getAs[Double]("ssw") >= 0.0)
  }

  test("chao1: estimate at least the observed richness, coverage in (0,1]") {
    val r = graft.scale.Search.chao1Query(spark, Sf0001).head()
    assert(r.getAs[Double]("chao1") >= r.getAs[Long]("s_obs").toDouble)
    val c = r.getAs[Double]("coverage_hat")
    assert(c > 0.0 && c <= 1.0)
  }

  test("good-turing: mass conservation r*·N_r = (r+1)·N_{r+1} exactly") {
    val rows = graft.scale.Search.goodTuringQuery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (rr, nr, nr1) = (r.getAs[Long]("r"), r.getAs[Long]("n_r"),
        r.getAs[Long]("n_r1"))
      val rStar = r.getAs[Double]("r_star")
      assert(math.abs(rStar * nr - (rr + 1) * nr1) < 1e-6,
        "adjusted mass must equal the next bucket's raw mass")
    }
  }

  test("ca trend: z^2 non-negative and tiny on trendless synthetic data") {
    val r = graft.operators.Distribution.caTrendQuery(spark, Sf0001).head()
    val z2 = r.getAs[Double]("z2")
    assert(z2 >= 0.0)
    // priority doesn't drive returns in this corpus: z^2 stays modest
    assert(z2 < 15.0, s"unexpected priority trend in returns: $z2")
    assert(r.getAs[Long]("a") <= r.getAs[Long]("n"))
  }

  test("band sweep: recall anti-monotone in band width, same truth") {
    val rows = graft.scale.Dedup.bandSweepQuery(spark, Sf0001)
      .orderBy("row_width").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_true_pairs")).distinct.length == 1,
      "all configs must measure against one truth set")
    for (w <- rows.sliding(2) if w.length == 2) {
      // longer bands = stricter collisions: candidates and recall shrink
      assert(w(0).getAs[Long]("n_cand_pairs") >= w(1).getAs[Long]("n_cand_pairs"))
      assert(w(0).getAs[Double]("pair_completeness") >=
        w(1).getAs[Double]("pair_completeness"))
    }
    for (r <- rows)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand_pairs"))
  }

  test("hurst R/S: positive and growing with window length") {
    val rows = graft.operators.TimeSeries.hurstRsQuery(spark, Sf0001)
      .orderBy("w").collect()
    assert(rows.length == 4)
    val means = rows.map(_.getAs[Double]("mean_rs"))
    assert(means.forall(_ > 0.0))
    // R/S grows with w for ANY series (iid already gives ~ sqrt(w))
    assert(means.zip(means.tail).forall { case (x, y) => x < y })
    for (r <- rows)
      assert(r.getAs[Long]("n_windows") > 0)
  }
}
