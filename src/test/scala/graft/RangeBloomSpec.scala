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

  test("BloomJoin: empty build side — anti keeps everything, semi keeps nothing") {
    // BloomFilterAggregate yields a NULL filter for empty input; a null
    // literal in the probe predicate would null out BOTH branches and
    // silently drop the whole corpus from antiJoin.
    val big = spark.range(0, 50).select(col("id").as("k"))
    val empty = spark.range(0, 0).select(col("id").as("sk"))
    assert(BloomJoin.antiJoin(big, "k", empty, "sk", expectedItems = 10).count() == 50)
    assert(BloomJoin.semiJoin(big, "k", empty, "sk", expectedItems = 10).count() == 0)
  }

  test("BloomJoin probe filter is a native codegen predicate, not a Scala UDF") {
    val big = spark.range(0, 100).select(col("id").as("k"))
    val small = spark.range(0, 10).select(col("id").as("sk"))
    val plan = BloomJoin.semiJoin(big, "k", small, "sk", expectedItems = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native predicate missing:\n$plan")
    assert(!plan.contains("UDF"), s"scala UDF in probe path:\n$plan")
  }

  test("BloomJoin build never mutates the caller session's runtime-filter confs") {
    // The aggregate's sizing caps are raised on a CLONED session
    // (spark.newSession); a concurrent query planned on the caller's
    // session must never observe inflated caps, and user-pinned values
    // must survive a build that requests far larger sizing.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val oldItems = spark.conf.getOption(itemsKey)
    val oldBits = spark.conf.getOption(bitsKey)
    spark.conf.set(itemsKey, "1234")
    spark.conf.set(bitsKey, "123456")
    try {
      val big = spark.range(0, 100).select(col("id").as("k"))
      val small = spark.range(0, 10).select(col("id").as("sk"))
      assert(BloomJoin.semiJoin(big, "k", small, "sk",
        expectedItems = 50000000L).count() == 10)
      assert(spark.conf.get(itemsKey) == "1234", "maxNumItems leaked")
      assert(spark.conf.get(bitsKey) == "123456", "maxNumBits leaked")
    } finally {
      oldItems.fold(spark.conf.unset(itemsKey))(spark.conf.set(itemsKey, _))
      oldBits.fold(spark.conf.unset(bitsKey))(spark.conf.set(bitsKey, _))
    }
  }

  test("RangeJoin.selfIntervalOverlap ≡ naive overlap join, exactly-once pairs") {
    // intervals spanning bins, nested, identical, touching, disjoint,
    // negative coordinates, and a cross-key decoy
    val iv = Seq(
      (1L, "a", 0L, 10L), (2L, "a", 5L, 7L), (3L, "a", 10L, 20L),
      (4L, "a", 21L, 30L), (5L, "a", 0L, 10L), (6L, "b", 5L, 7L),
      (7L, "a", -12L, -3L), (8L, "a", -5L, 2L))
      .toDF("key", "id", "lo", "hi")
    for (width <- Seq(1L, 4L, 7L, 50L)) {
      val got = RangeJoin.selfIntervalOverlap(iv, "key", "id", "lo", "hi", width)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      val a = iv.select(col("key"), col("id").as("i1"), col("lo").as("l1"), col("hi").as("h1"))
      val b = iv.select(col("key").as("k2"), col("id").as("i2"), col("lo").as("l2"), col("hi").as("h2"))
      val want = a.join(b, col("key") === col("k2") && col("i1") < col("i2") &&
          col("l1") <= col("h2") && col("l2") <= col("h1"))
        .select(col("i1"), col("i2"),
          greatest(col("l1"), col("l2")), least(col("h1"), col("h2")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got.sorted == want.sorted, s"binWidth=$width")
      assert(got.distinct.length == got.length, s"binWidth=$width produced duplicates")
    }
  }
}
