package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed point-in-interval (range) join via bin bucketing.
  *
  * Spark has no native inequality-join strategy: `a JOIN b ON b.t BETWEEN
  * a.lo AND a.hi` plans as BroadcastNestedLoopJoin (quadratic work, one
  * side fully replicated) or a cartesian product — both scale-killers.
  * The classic fix is to discretize the range dimension into fixed-width
  * bins so the range join becomes an equi-join Catalyst can shuffle-hash:
  *
  *  - each interval row is exploded to every bin its [lo, hi] overlaps
  *    (≤ ceil(span/width)+1 rows — bounded when spans are bounded);
  *  - each point row maps to exactly ONE bin, so every qualifying
  *    (interval, point) pair meets in exactly one bin — no post-join
  *    dedup needed;
  *  - the residual predicate lo ≤ p ≤ hi filters bin-mates outside the
  *    actual interval.
  *
  * Shuffle is on (equi keys, bin): parallelism scales with the number of
  * distinct bins, and AQE's skew splitting handles hot bins. Choosing
  * binWidth ≈ typical span keeps the explode factor ≤ 2-3×.
  *
  * Covers the reference's interval analytics (SURVEY §2.6 W7 family:
  * open/close odds windows, form-within-window, matchday proximity —
  * e.g. reference src/analytics/engine.py:143-191 computes "recent form"
  * by scanning matches within a date window per team in Python).
  */
object RangeJoin {

  /** Join `intervals` (columns `lo`, `hi`, numeric, inclusive) with
    * `points` (column `point`, same scale) on equal `equiKeys` pairs and
    * lo ≤ point ≤ hi. Column names across the two inputs must be
    * disjoint. Returns all columns of both sides.
    *
    * @param binWidth bin size in the units of lo/hi/point; choose ≈ the
    *                 typical interval span (explode factor ≤ span/width+1)
    */
  def pointInInterval(
      intervals: DataFrame,
      points: DataFrame,
      equiKeys: Seq[(String, String)],
      lo: String, hi: String, point: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(lo) / w).cast("long"),
        floor(col(hi) / w).cast("long"))))
    val p = points.withColumn("__pbin", floor(col(point) / w).cast("long"))
    val cond = (equiKeys.map { case (a, b) => col(a) === col(b) } :+
      (col("__bin") === col("__pbin")) :+
      (col(point) >= col(lo)) :+ (col(point) <= col(hi))).reduce(_ && _)
    binned.join(p, cond).drop("__bin", "__pbin")
  }

  /** Interval-overlap SELF-join via the same bin rewrite: all pairs of
    * rows sharing `key` whose [lo, hi] intervals intersect. Unlike the
    * point case an interval spans many bins, so a pair can meet in
    * several — the dedup is algebraic, not a `distinct`: a pair is
    * emitted only in the bin containing the OVERLAP START
    * (`floor(max(lo₁,lo₂)/w)`), which every overlapping pair has exactly
    * one of. Shuffle is the (key, bin) equi-join; explode factor is
    * span/width+1 per row, so pick binWidth ≈ typical span.
    *
    * @return one row per unordered pair (`id1` < `id2`) with the overlap
    *         interval [overlap_lo, overlap_hi]
    */
  def selfIntervalOverlap(df: DataFrame, key: String, id: String,
                          lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    val binned = df
      .select(col(key), col(id), col(lo), col(hi))
      .withColumn("__bin", explode(sequence(
        floor(col(lo) / w).cast("long"), floor(col(hi) / w).cast("long"))))
    val a = binned.select(col(key).as("__k"), col(id).as("id1"),
      col(lo).as("__lo1"), col(hi).as("__hi1"), col("__bin"))
    val b = binned.select(col(key).as("__k2"), col(id).as("id2"),
      col(lo).as("__lo2"), col(hi).as("__hi2"), col("__bin").as("__bin2"))
    a.join(b,
        col("__k") === col("__k2") && col("__bin") === col("__bin2") &&
          col("id1") < col("id2") &&
          col("__lo1") <= col("__hi2") && col("__lo2") <= col("__hi1") &&
          col("__bin") === floor(greatest(col("__lo1"), col("__lo2")) / w).cast("long"))
      .select(col("__k").as(key), col("id1"), col("id2"),
        greatest(col("__lo1"), col("__lo2")).as("overlap_lo"),
        least(col("__hi1"), col("__hi2")).as("overlap_hi"))
  }

  /** q_interval_overlap: per-customer order-window clustering — pairs of
    * a customer's orders whose ±`days`-day windows intersect, with the
    * overlap length. The naive form is an inequality self-join;
    * [[selfIntervalOverlap]] makes it a (custkey, bin) equi-join. */
  def overlappingOrderWindows(spark: SparkSession, dir: String,
                              days: Int = 3): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate"), epoch).cast("long").as("d"))
      .withColumn("lo", col("d") - days)
      .withColumn("hi", col("d") + days)
    selfIntervalOverlap(o, "o_custkey", "o_orderkey", "lo", "hi",
        binWidth = 2L * days + 1)
      .select(col("o_custkey"), col("id1").as("k1"), col("id2").as("k2"),
        (col("overlap_hi") - col("overlap_lo") + 1L).as("overlap_days"))
      .orderBy("o_custkey", "k1", "k2")
  }

  /** q_range_join: order-density self range join — for every order, how
    * many other orders of the same priority class were placed within
    * ±`days` days. The naive form is an inequality self-join (quadratic
    * per priority class). Two rewrites compose here:
    *
    *  1. aggregate-before-join: the points side collapses to per
    *     (priority, day) counts FIRST — bounded by keys × distinct days,
    *     not by row count — so the join output is anchors × window-days,
    *     never anchors × matching-orders (a count over a window needs
    *     only the per-day counts, not the rows; subtract 1 for the
    *     anchor itself);
    *  2. the binned equi-join of [[pointInInterval]] on the (tiny,
    *     broadcast) day-count frame in place of the inequality join.
    *
    * Anchors with no other order in the window are absent (inner-join
    * count semantics), hence the `nearby_cnt > 0` filter. */
  def nearbyOrders(spark: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), epoch).cast("long").as("d"))
    val anchors = o.select(
      col("o_orderkey").as("a_key"), col("o_orderpriority").as("a_prio"),
      col("d").as("a_d"), (col("d") - days).as("lo"), (col("d") + days).as("hi"))
    val dayCounts = broadcast(
      o.groupBy(col("o_orderpriority").as("p_prio"), col("d").as("p"))
        .agg(count(lit(1)).as("day_cnt")))
    pointInInterval(anchors, dayCounts, Seq("a_prio" -> "p_prio"),
        "lo", "hi", "p", binWidth = 2L * days + 1)
      .groupBy(col("a_key"))
      .agg((sum(col("day_cnt")) - 1L).as("nearby_cnt"))
      .filter(col("nearby_cnt") > 0)
      .withColumnRenamed("a_key", "o_orderkey")
      .orderBy("o_orderkey")
  }
}
