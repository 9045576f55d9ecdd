package graft

import org.apache.spark.sql.functions._

/** Invariants for the rolling/cumulative time-series operators: the
  * oracle pins cross-engine equality; these pin the math's internal
  * consistency (conservation, monotonicity, band geometry, weight mass)
  * on the real corpus. */
class TimeSeriesSpec extends SparkSpec {

  test("cumulative distinct customers: monotone, ends at the true distinct count") {
    val c = graft.operators.TimeSeries
      .cumulativeDistinctUsers(spark, TestSpark.Sf0001).collect()
    assert(c.length > 10) // a real curve, not a degenerate single row
    val cums = c.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b || a == b })
    assert(cums.last == c.map(_.getLong(1)).sum)
    val trueDistinct = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select("o_custkey").distinct().count()
    assert(cums.last == trueDistinct)
  }

  test("bollinger bands: full windows only, sane geometry") {
    val b = graft.operators.TimeSeries
      .bollingerBands(spark, TestSpark.Sf0001).collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      val (mean, sd) = (r.getDouble(3), r.getDouble(4))
      assert(sd >= 0.0)
      assert(r.getDouble(5) >= mean && mean >= r.getDouble(6)) // upper/lower
      assert(math.abs((r.getDouble(5) + r.getDouble(6)) / 2 - mean) < 1e-6)
    }
  }

  test("cusum matches an independent single-partition recompute") {
    val got = graft.operators.TimeSeries
      .cusumChangepoint(spark, TestSpark.Sf0001).head()
    val daily = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
        .as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg((sum(col("p")) * 100).cast("long").as("v"))
      .orderBy("day").collect()
    val total = daily.map(_.getLong(1)).sum
    val n = daily.length.toLong
    var cum = 0L; var best = 0L; var bestDay = Long.MaxValue
    daily.zipWithIndex.foreach { case (r, i) =>
      cum += r.getLong(1)
      val s = math.abs(cum * n - (i + 1L) * total)
      if (s > best) { best = s; bestDay = r.getLong(0) }
    }
    assert(got.getLong(0) == n && got.getLong(1) == total)
    assert(got.getLong(3) == best && got.getLong(2) == bestDay)
    assert(got.getDouble(4) >= 0.0 && got.getDouble(4) <= 1.0)
  }

  test("runs test: sign counts partition the pairs; runs bounded by nonzero signs") {
    val r = graft.operators.TimeSeries.runsTest(spark, TestSpark.Sf0001).head()
    val (up, down, flat, runs) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nDays = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
      .distinct().count()
    assert(up + down + flat == nDays - 1)
    assert(runs >= 1 && runs <= up + down)
    assert(r.getDouble(4) > 0.0) // expected runs
  }

  test("cohort LTV: cumulative is monotone per cohort and conserves revenue") {
    val m = graft.operators.EventOps.cohortLtv(spark, TestSpark.Sf0001).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cums = rows.sortBy(_.getLong(1)).map(_.getLong(5))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      // last cumulative equals the cohort's summed cells
      assert(cums.last == rows.map(_.getLong(4)).sum)
    }
    val totalCents = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type") === "purchase")
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long"))
      .head().getLong(0)
    assert(m.map(_.getLong(4)).sum == totalCents)
  }

  test("dwell: terminal events equal the user count; gaps are nonnegative") {
    val d = graft.operators.EventOps.dwellStats(spark, TestSpark.Sf0001).collect()
    val nUsers = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count()
    assert(d.map(_.getLong(2)).sum == nUsers) // one terminal event per user
    d.foreach { r =>
      assert(r.getLong(4) >= 0L)            // min dwell
      assert(r.getDouble(6) >= 0.0)         // mean dwell
    }
  }

  test("ship latency: conserves lineitems; median between 0 and max") {
    val l = graft.operators.TimeSeries.shipLatency(spark, TestSpark.Sf0001)
      .collect()
    val nLi = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001).count()
    assert(l.map(_.getLong(1)).sum == nLi)
    l.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(4))
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("backlog: deltas net to zero and the curve never goes negative") {
    val b = graft.operators.TimeSeries.backlogCurve(spark, TestSpark.Sf0001)
      .collect()
    assert(b.map(_.getLong(1)).sum == 0L)        // every order opens and closes
    b.foreach(r => assert(r.getLong(2) >= 0L))   // n_open
    assert(b.last.getLong(2) == 0L)              // fully drained at the end
    val nOrders = graft.sources.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(b.filter(_.getLong(1) > 0).map(_.getLong(1)).sum <= nOrders)
  }

  test("ewma: weight mass matches observation count; steady-state den = 1023") {
    val e = graft.operators.TimeSeries
      .ewmaRevenue(spark, TestSpark.Sf0001).collect()
    assert(e.nonEmpty)
    // per prio, the i-th row (0-based) has den = 2^10 − 2^(9−min(i,9))·… :
    // simpler closed form: k observed lags → den = 1024 − 2^(10−k)
    e.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        val k = math.min(i + 1, 10)
        assert(r.getLong(4) == 1024L - (1L << (10 - k)),
          s"row $i den=${r.getLong(4)}")
      }
    }
    // ewma is a convex combination → bounded by the series' min/max
    val vs = e.map(_.getLong(2))
    e.foreach(r => assert(r.getDouble(5) >= vs.min.toDouble &&
      r.getDouble(5) <= vs.max.toDouble))
  }
}
