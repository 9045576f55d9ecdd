package graft

import org.apache.spark.sql.functions._

import graft.TestSpark.Sf0001

/** Invariant specs for the round-9 second batch: distribution tests
  * (CvM, paired t, GK lambda), series structure (change point, max
  * drawdown — both cross-checked against an exact BigInt brute-force
  * recompute of the whole curve), and the privacy ladder's upper rungs
  * (l-diversity, t-closeness). The DuckDB oracle pins exact values;
  * these pin the math. */
class PrivacySeriesSpec extends SparkSpec {

  test("cvm: statistic within [0, nm/N] and numerator nonnegative") {
    val r = graft.operators.Distribution.cvmTest(spark, Sf0001).head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (tn, cvm) = (r.getAs[Double]("t_num"), r.getAs[Double]("cvm"))
    assert(na > 0 && nb > 0)
    assert(tn >= 0.0)
    assert(cvm >= 0.0 &&
      cvm <= na.toDouble * nb.toDouble / (na + nb).toDouble)
  }

  test("paired t: nonnegative square, pairs bounded by customers") {
    val r = graft.operators.Distribution.pairedTQuery(spark, Sf0001).head()
    val nCust = graft.sources.Tables.customer(spark, Sf0001).count()
    assert(r.getAs[Long]("n") > 0 && r.getAs[Long]("n") <= nCust)
    assert(r.getAs[Double]("t2") >= 0.0)
  }

  test("gk lambda: PRE measures bounded in [0,1], witnesses ordered") {
    val r = graft.operators.Distribution.gkLambdaQuery(spark, Sf0001).head()
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("sum_max_per_mode") >= r.getAs[Long]("max_rf_tot"))
    assert(r.getAs[Long]("sum_max_per_rf") >= r.getAs[Long]("max_mode_tot"))
    assert(n >= r.getAs[Long]("sum_max_per_mode"))
    for (c <- Seq("lambda_rf", "lambda_mode")) {
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c out of [0,1]: $v")
    }
  }

  /** Daily cents series (day, v) ordered by day — the shared input of
    * the two series specs, recomputed independently of the operators. */
  private def dailySeries(): Seq[(Long, BigInt)] =
    graft.sources.Tables.orders(spark, Sf0001)
      .groupBy(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
        .as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("day"), BigInt(r.getAs[Long]("v")))).toSeq

  test("changepoint: matches exact BigInt brute force over all splits") {
    val daily = dailySeries()
    val n = BigInt(daily.length)
    val s = daily.map(_._2).sum
    var cum = BigInt(0)
    // exact rational argmax: compare num1/den1 vs num2/den2 cross-multiplied
    var best: (BigInt, BigInt, Long) = null // (num, den, day)
    for (((day, v), i) <- daily.zipWithIndex; if i < daily.length - 1) {
      cum += v
      val t = BigInt(i + 1)
      val diff = cum * n - t * s
      val num = diff * diff
      val den = t * (n - t)
      val better = best == null || num * best._2 > best._1 * den
      if (better) best = (num, den, day)
    }
    val r = graft.operators.TimeSeries.changepointQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("split_day") == best._3,
      s"split ${r.getAs[Long]("split_day")} != brute ${best._3}")
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n.toLong)
    assert(r.getAs[Double]("score") >= 0.0)
  }

  test("drawdown: matches exact BigInt brute force over the walk") {
    val daily = dailySeries()
    val n = BigInt(daily.length)
    val s = daily.map(_._2).sum
    var cum = BigInt(0); var t = BigInt(0)
    var peak = (BigInt(Long.MinValue), 0L) // (pn, day)
    var worst = (BigInt(-1), 0L, 0L)       // (dd, peakDay, troughDay)
    for ((day, v) <- daily) {
      cum += v; t += 1
      val pn = cum * n - t * s
      if (pn > peak._1) peak = (pn, day)
      val dd = peak._1 - pn
      if (dd > worst._1) worst = (dd, peak._2, day)
    }
    val r = graft.operators.TimeSeries.drawdownQuery(spark, Sf0001).head()
    assert(r.getAs[Long]("peak_day") == worst._2 &&
      r.getAs[Long]("trough_day") == worst._3,
      s"(${r.getAs[Long]("peak_day")},${r.getAs[Long]("trough_day")}) != " +
        s"brute (${worst._2},${worst._3})")
    assert(r.getAs[Long]("peak_day") <= r.getAs[Long]("trough_day"))
    assert(r.getAs[Double]("dd_num") >= 0.0)
  }

  test("l-diversity: rollup consistent with the customer table") {
    val r = graft.operators.Profile.lDiversity(spark, Sf0001).head()
    val nCust = graft.sources.Tables.customer(spark, Sf0001).count()
    assert(r.getAs[Long]("n_rows") == nCust)
    assert(r.getAs[Long]("min_l") >= 1L)
    assert(r.getAs[Long]("n_weak_groups") <= r.getAs[Long]("n_groups"))
    assert(r.getAs[Long]("n_rows_at_risk") <= r.getAs[Long]("n_rows"))
    val share = r.getAs[Double]("risk_share")
    assert(share >= 0.0 && share <= 1.0)
  }

  test("t-closeness: EMD bounded in [0,1] per QI group, grid complete") {
    val rows = graft.operators.Profile.tCloseness(spark, Sf0001).collect()
    val nGroups = graft.sources.Tables.customer(spark, Sf0001)
      .select("c_mktsegment", "c_nationkey").distinct().count()
    assert(rows.length.toLong == nGroups)
    for (r <- rows) {
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0,
        s"emd out of [0,1] for ${r.getAs[String]("seg")}/${r.getAs[Int]("nat")}: $emd")
    }
  }
}
