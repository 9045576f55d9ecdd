package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, RangeJoin}

/** Operator-level equivalence tests for the binned range join and the
  * Bloom-prefiltered joins (their oracle queries additionally hash-check
  * the end-to-end results against DuckDB). */
class RangeBloomSpec extends SparkSpec {
  import spark.implicits._

  private def intervals = Seq(
    // (id, key, lo, hi) — spans crossing bin boundaries, zero-width, wide
    (1L, "a", 0L, 10L), (2L, "a", 9L, 9L), (3L, "b", 5L, 40L), (4L, "a", 30L, 35L))
    .toDF("iid", "ikey", "lo", "hi")

  private def points = Seq(
    (10L, "a", 0L), (11L, "a", 9L), (12L, "a", 10L), (13L, "a", 11L),
    (14L, "b", 5L), (15L, "b", 40L), (16L, "b", 41L), (17L, "c", 7L))
    .toDF("pid", "pkey", "p")

  test("RangeJoin.pointInInterval ≡ naive inequality join, no duplicate pairs") {
    for (width <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(intervals, points,
          Seq("ikey" -> "pkey"), "lo", "hi", "p", binWidth = width)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = intervals.join(points,
          col("ikey") === col("pkey") && col("p") >= col("lo") && col("p") <= col("hi"))
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted == want.sorted, s"binWidth=$width")
      assert(got.distinct.length == got.length, s"binWidth=$width produced duplicates")
    }
  }

  test("RangeJoin handles negative coordinates (floor-div binning)") {
    val iv = Seq((1L, "k", -10L, -2L)).toDF("iid", "ikey", "lo", "hi")
    val ps = Seq((1L, "k", -5L), (2L, "k", -1L), (3L, "k", -10L)).toDF("pid", "pkey", "p")
    val got = RangeJoin.pointInInterval(iv, ps, Seq("ikey" -> "pkey"),
        "lo", "hi", "p", binWidth = 4L)
      .select("pid").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 3L))
  }

  test("BloomJoin.semiJoin / antiJoin ≡ plain semi / anti joins") {
    val big = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val small = spark.range(0, 1000, 13).select(col("id").as("sk")) // every 13th key
    val semi = BloomJoin.semiJoin(big, "k", small, "sk", expectedItems = 100)
      .select("k").as[Long].collect().sorted.toSeq
    val semiWant = big.join(small, col("k") === col("sk"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    assert(semi == semiWant)
    val anti = BloomJoin.antiJoin(big, "k", small, "sk", expectedItems = 100)
      .select("k").as[Long].collect().sorted.toSeq
    val antiWant = big.join(small, col("k") === col("sk"), "left_anti")
      .select("k").as[Long].collect().sorted.toSeq
    assert(anti == antiWant)
    assert(semi.size + anti.size == 1000)
  }

  test("BloomJoin.antiJoin passes null keys through (null never matches)") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(1L).toDF("sk")
    val out = BloomJoin.antiJoin(big, "k", small, "sk", expectedItems = 10)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out.sortBy(_.getOrElse(-1L)) == Seq(None, Some(2L)))
  }
}
