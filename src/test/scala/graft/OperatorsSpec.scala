package graft

import org.apache.spark.sql.functions._

import graft.operators.{Approx, AsOfJoin, Joins, Merge, Ranking, Sessionize}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Ranking.latestPerKey keeps the highest-version row per key") {
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("k", "v", "tag")
    val out = Ranking.latestPerKey(df, Seq(col("k")), Seq(col("v")))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("new", "only"))
  }

  test("Ranking.topK plans TakeOrderedAndProject (no global sort)") {
    val df = Seq(3, 1, 2).toDF("x")
    val plan = Ranking.topK(df, 2, col("x").desc).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(Ranking.topK(df, 2, col("x").desc).collect().map(_.getInt(0)).toSeq == Seq(3, 2))
  }

  test("Joins.symmetricPair normalizes unordered pairs") {
    val (lo, hi) = Joins.symmetricPair(col("a"), col("b"))
    val out = Seq((5, 3), (3, 5)).toDF("a", "b")
      .select(lo.as("lo"), hi.as("hi")).distinct().collect()
    assert(out.length == 1 && out.head.getInt(0) == 3 && out.head.getInt(1) == 5)
  }

  test("Merge.upsertLatest: staged overwrites current, new keys insert") {
    val current = Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "ver")
    val staged = Seq((2, "b2", 2L), (3, "c", 2L)).toDF("k", "v", "ver")
    val out = Merge.upsertLatest(current, staged, Seq("k"), Seq("ver"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b2"), (3, "c")))
  }

  test("Merge.upsertLatest is idempotent (re-merge same batch)") {
    val current = Seq((1, "a", 1L)).toDF("k", "v", "ver")
    val staged = Seq((1, "a2", 2L)).toDF("k", "v", "ver")
    val once = Merge.upsertLatest(current, staged, Seq("k"), Seq("ver"))
    val twice = Merge.upsertLatest(once, staged, Seq("k"), Seq("ver"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("Merge.coalesceMerge preserves current values under staged NULLs") {
    val current = Seq((1, Some("keep"), Some(10)), (2, Some("x"), Some(20)))
      .toDF("k", "name", "n")
    val staged = Seq((1, None: Option[String], Some(11)), (3, Some("new"), None: Option[Int]))
      .toDF("k", "name", "n")
    val out = Merge.coalesceMerge(current, staged, Seq("k"), Seq("name", "n"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toSeq == Seq((1, "keep", 11), (2, "x", 20), (3, "new", -1)))
  }

  test("Merge.additiveUpsert adds measures per key; one-sided keys pass through") {
    val current = Seq(("a", 2L, BigDecimal("10.50")), ("b", 1L, BigDecimal("3.00")))
      .toDF("k", "cnt", "s")
    val delta = Seq(("a", 3L, BigDecimal("0.25")), ("c", 4L, BigDecimal("7.00")))
      .toDF("k", "cnt", "s")
    val out = Merge.additiveUpsert(current, delta, Seq("k"), Seq("cnt", "s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .sortBy(_._1).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq(("a", 5L), ("b", 1L), ("c", 4L)))
    assert(BigDecimal(out(0)._3) == BigDecimal("10.75"))
    assert(BigDecimal(out(1)._3) == BigDecimal("3.00"))
    assert(BigDecimal(out(2)._3) == BigDecimal("7.00"))
    // incremental ≡ recompute on a generated fact set split arbitrarily
    val facts = spark.range(0, 300).select((col("id") % 7).as("k2"),
      (col("id") % 13).cast("decimal(18,2)").as("v"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k2").agg(count(lit(1)).as("cnt"), sum(col("v")).as("s"))
    val inc = Merge.additiveUpsert(
      agg(facts.filter(col("k2") * 40 > col("v") * 17)), // arbitrary split
      agg(facts.filter(!(col("k2") * 40 > col("v") * 17))),
      Seq("k2"), Seq("cnt", "s"))
    val full = agg(facts)
    assert(inc.orderBy("k2").collect().toSeq == full.orderBy("k2").collect().toSeq)
  }

  test("Merge.backfill rebuilds only affected keys, passes others verbatim") {
    val facts = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 5L),
      ("b", "2024-01-01", 7L), ("c", "2024-01-02", 2L))
      .toDF("k", "day", "v")
    def aggFn(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    // gold is stale for keys touched on 01-02 (a, c) AND carries a
    // poisoned-but-unaffected row (b) that must survive verbatim
    val staleGold = Seq(("a", 1L, 10L), ("b", 999L, 999L), ("c", 0L, 0L))
      .toDF("k", "cnt", "s")
    val out = Merge.backfill(staleGold, facts, col("day") === "2024-01-02",
        Seq("k"), aggFn)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(("a", 2L, 15L), ("b", 999L, 999L), ("c", 1L, 2L)))
    // with a correct starting gold, backfill ≡ full recompute
    val correct = Merge.backfill(aggFn(facts), facts, col("day") === "2024-01-02",
      Seq("k"), aggFn)
    assert(correct.orderBy("k").collect().toSeq ==
      aggFn(facts).orderBy("k").collect().toSeq)
  }

  test("Merge.backfillKeys: tombstoned keys rebuild from remaining history") {
    val facts = Seq(("a", 10L), ("b", 7L)).toDF("k", "v") // key c hard-deleted
    def aggFn(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("v").as("s"))
    val staleGold = Seq(("a", 10L), ("b", 7L), ("c", 99L)).toDF("k", "s")
    val tombstones = Seq(Tuple1("c")).toDF("k")
    val out = Merge.backfillKeys(staleGold, facts, tombstones, Seq("k"), aggFn)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    // c had no remaining facts -> disappears from gold entirely
    assert(out == Seq(("a", 10L), ("b", 7L)))
  }

  test("Merge.scd2 derives valid_from/valid_to/is_current") {
    val df = Seq((1, 100L, "v1"), (1, 200L, "v2"), (2, 50L, "w1"))
      .toDF("k", "t", "v")
    val out = Merge.scd2(df, Seq("k"), col("t"), col("v"))
      .orderBy("k", "valid_from").collect()
    assert(out(0).getLong(out(0).fieldIndex("valid_from")) == 100L)
    assert(out(0).getLong(out(0).fieldIndex("valid_to")) == 200L)
    assert(!out(0).getBoolean(out(0).fieldIndex("is_current")))
    assert(out(1).isNullAt(out(1).fieldIndex("valid_to")))
    assert(out(1).getBoolean(out(1).fieldIndex("is_current")))
    assert(out(2).getBoolean(out(2).fieldIndex("is_current")))
  }

  test("AsOfJoin: non-strict picks <=, strict picks <, no-match yields null") {
    val left = Seq((1, 100L, "L1"), (1, 250L, "L2"), (2, 10L, "L3"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 100L, "R100"), (1, 200L, "R200"), (1, 300L, "R300"))
      .toDF("k", "t", "rv")
    def run(strict: Boolean) = AsOfJoin.asOf(left, right,
        "k", "k", "t", "t", Seq("rv", "t"), strict = strict)
      .orderBy("t").collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getString(3))).toSeq

    assert(run(strict = false) == Seq(("L3", null), ("L1", "R100"), ("L2", "R200")))
    assert(run(strict = true) == Seq(("L3", null), ("L1", null), ("L2", "R200")))
  }

  test("AsOfJoin: latest right row wins among multiple earlier rows") {
    val left = Seq((1, 1000L, "L")).toDF("k", "t", "lv")
    val right = Seq((1, 10L, "old"), (1, 500L, "mid"), (1, 999L, "latest"))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", Seq("rv")).head()
    assert(out.getString(3) == "latest")
  }

  test("ExternalIdMap: append new, ignore re-assertions, report conflicts") {
    import graft.operators.ExternalIdMap
    val current = Seq(("fbref", "x1", 100L), ("fbref", "x2", 200L))
      .toDF("source", "external_id", "internal_id")
    val staged = Seq(
      ("fbref", "x1", 100L),  // re-assertion: no-op
      ("fbref", "x2", 999L),  // conflict
      ("tm", "y1", 300L))     // new
      .toDF("source", "external_id", "internal_id")
    val r = ExternalIdMap.register(current, staged)
    assert(r.mapping.count() == 3)
    assert(r.mapping.filter(col("external_id") === "x2")
      .head().getLong(2) == 200L) // current wins
    val c = r.conflicts.collect()
    assert(c.length == 1)
    assert(c.head.getAs[Long]("claimed_internal_id") == 999L)
    assert(c.head.getAs[Long]("existing_internal_id") == 200L)
  }

  test("ExternalIdMap: intra-batch conflicting claims pick one winner, report losers") {
    import graft.operators.ExternalIdMap
    val current = Seq(("fbref", "x1", 100L))
      .toDF("source", "external_id", "internal_id")
    val staged = Seq(
      ("tm", "y1", 300L),   // same pair, two internal ids: intra-batch conflict
      ("tm", "y1", 301L),
      ("tm", "y2", 400L))   // clean new pair
      .toDF("source", "external_id", "internal_id")
    val r = ExternalIdMap.register(current, staged)
    // registry has exactly ONE internal id for y1 (deterministic min)
    val y1 = r.mapping.filter(col("external_id") === "y1").collect()
    assert(y1.length == 1 && y1.head.getAs[Long]("internal_id") == 300L)
    assert(r.mapping.count() == 3)
    val c = r.conflicts.collect()
    assert(c.length == 1)
    assert(c.head.getAs[Long]("claimed_internal_id") == 301L)
    assert(c.head.getAs[Long]("existing_internal_id") == 300L)
  }

  test("Validate: valid/quarantine split with violation names") {
    import graft.operators.Validate
    import graft.operators.Validate.{atLeast, inDomain, notNull}
    val df = Seq(
      ("live", Some(2.5), "A"),          // ok
      ("bogus", Some(1.5), "B"),         // bad status
      ("finished", Some(0.5), null),     // price too low + null name
      ("scheduled", None: Option[Double], "C")) // null price passes atLeast
      .toDF("status", "price", "name")
    val res = Validate.validate(df, Seq(
      inDomain("status", Seq("scheduled", "live", "finished")),
      atLeast("price", 1.01),
      notNull("name")))
    assert(res.valid.count() == 2)
    val q = res.quarantine.orderBy("status").collect()
    assert(q.length == 2)
    assert(q(0).getSeq[String](q(0).fieldIndex("violations")) == Seq("status_domain"))
    assert(q(1).getSeq[String](q(1).fieldIndex("violations")).toSet ==
      Set("price_min", "name_null"))
  }

  test("Sessionize splits on gap and keeps runs together") {
    val df = Seq(
      (1, 0L, 1L), (1, 1000L, 2L), (1, 10000L, 3L), // gap 9000 > 5000 -> new session
      (2, 0L, 4L))
      .toDF("u", "tm", "id")
    val out = Sessionize.sessionize(df, col("u"), col("tm"), col("id"), gapMs = 5000L)
      .orderBy("u", "tm").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("Approx: HLL distinct within rsd bound; quantile within rank tolerance") {
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
    val rsd = 0.02
    val approx = Approx.distinctBy(orders, Seq(col("o_orderpriority")),
        Seq("cust_approx" -> col("o_custkey")), rsd)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 4 * rsd,
        s"HLL estimate $a vs exact $e for $k exceeds 4*rsd")
    }
    // p50 of order value: approx must land between the exact 49th and
    // 51st percentiles (accuracy 10000 => rank error <= 0.01%)
    val sorted = orders.select(col("o_totalprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val approxP50 = Approx.quantiles(orders, col("o_totalprice").cast("double"),
      Seq(0.5)).head().getSeq[Double](0).head
    val lo = sorted(((sorted.length - 1) * 0.49).toInt)
    val hi = sorted(math.ceil((sorted.length - 1) * 0.51).toInt)
    assert(approxP50 >= lo && approxP50 <= hi,
      s"approx p50 $approxP50 outside exact [$lo, $hi]")
  }

  test("Analytics.statusPivot ≡ manual conditional aggregation") {
    val got = graft.operators.Analytics.statusPivot(spark, TestSpark.Sf0001)
    val want = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("f_spend"),
        sum(when(col("o_orderstatus") === "O",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("o_spend"),
        sum(when(col("o_orderstatus") === "P",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("p_spend"))
      .orderBy("priority")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("Analytics.spendDeciles ≡ single-partition window formulation") {
    val got = graft.operators.Analytics.spendDeciles(spark, TestSpark.Sf0001)
    val per = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend_dec"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("spend_dec").asc, col("o_custkey").asc)
    val want = per
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("decile", expr("((rn - 1) * 10) div n + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("cnt"),
        min(col("spend_dec")).cast("double").as("min_spend"),
        max(col("spend_dec")).cast("double").as("max_spend"),
        sum(col("spend_dec")).cast("double").as("decile_spend"))
      .orderBy("decile")
    assert(got.collect().toSeq == want.collect().toSeq)
    // every decile populated, counts sum to the customer count
    val rows = got.collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(rows.map(_.getLong(1)).sum == per.count())
  }

  test("Analytics.trailingSpend: value frame sums prior days only") {
    val got = graft.operators.Analytics.trailingSpend(spark, TestSpark.Sf0001, days = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // naive recomputation on the driver (sf0.001 is small)
    val rows = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"),
        col("o_totalprice").cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))
    val byCust = rows.groupBy(_._1)
    rows.foreach { case (ck, ok, d, _) =>
      val frame = byCust(ck).filter(o => o._3 >= d - 30 && o._3 <= d - 1).map(_._4)
      val want = if (frame.isEmpty) None
        else Some(frame.map(BigDecimal(_)).sum.toDouble)
      assert(got((ck, ok)) == want, s"cust=$ck order=$ok")
    }
  }

  test("Analytics.segmentOutliers matches driver-side z-score computation") {
    val got = graft.operators.Analytics.segmentOutliers(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val c = graft.sources.Tables.customer(spark, TestSpark.Sf0001)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = c.toSeq.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = rows.length
      val s = rows.map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val ss = rows.map { r =>
        val d = BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP); d * d
      }.sum.toDouble
      val mean = s / n
      val sd = math.sqrt((ss - s * s / n) / (n - 1))
      rows.map(r => r._1 -> (r._3 - mean) / sd).filter(p => math.abs(p._2) >= 2.0)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, z) => assert(z == want(k), s"cust=$k") }
  }

  test("Regression.groupedOls recovers an exact linear relationship") {
    // y = 3x + 7 exactly -> slope 3, intercept 7, corr 1.
    val df = (1L to 100L).map(x => ("g", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = graft.operators.Regression.groupedOls(df, Seq("g"), col("x"), col("y"))
      .head()
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0 && r.getDouble(4) == 1.0)
  }

  test("Regression.groupedOls matches closed-form moments on noisy data") {
    val pts = (1L to 50L).map(x => (x, x * x % 17 + 2 * x)) // deterministic 'noise'
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val r = graft.operators.Regression.groupedOls(df, Seq("g"), col("x"), col("y"))
      .head()
    assert(r.getDouble(2) == slope)
    assert(r.getDouble(3) == (sy.toDouble - slope * sx.toDouble) / n.toDouble)
  }

  test("Regression.groupedOls: no Long wrap for |y| > 3.1e9 (decimal operands)") {
    // y = 4e9 + x: y² ≈ 1.6e19 > Long.MaxValue — a Long product would
    // silently wrap before the decimal cast. Exact recompute in BigInt.
    val pts = (1L to 40L).map(x => (x, 4000000000L + x))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val r = graft.operators.Regression.groupedOls(df, Seq("g"), col("x"), col("y"))
      .head()
    assert(r.getDouble(2) == slope) // exact: y is affine in x → slope 1.0
    assert(r.getDouble(4) == 1.0, "corr must be exactly 1 on an affine signal")
  }

  test("groupedMoments: no Long wrap for x > 56k (x⁴ past Long range)") {
    // x around 3e6: x⁴ ≈ 8e25 ≫ Long.MaxValue. Symmetric grid → skew
    // exactly 0 only if the quartic moments stayed exact.
    val df = (-4L to 4L).map(d => ("g", 3000000L + d)).toDF("g", "x")
    val r = graft.operators.Regression.groupedMoments(df, Seq("g"), col("x")).head()
    assert(r.getDouble(3) == 0.0, "symmetric data must have exactly zero skew")
    assert(math.abs(r.getDouble(4) - (-1.2 * 82 / 80)) < 1e-9)
  }

  test("groupedMoments: symmetric data has zero skew, uniform has kurt -6/5") {
    // x uniform on 1..9 (symmetric): skew = 0 exactly (A3 integer-cancels).
    val df = (1L to 9L).map(("g", _)).toDF("g", "x")
    val r = graft.operators.Regression.groupedMoments(df, Seq("g"), col("x")).head()
    assert(r.getDouble(3) == 0.0)
    // discrete uniform on m=9 points: excess kurtosis = -(6/5)(m^2+1)/(m^2-1)
    assert(math.abs(r.getDouble(4) - (-1.2 * 82 / 80)) < 1e-12)
  }

  test("Reshape.melt emits one long row per (id, metric)") {
    val wide = Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("id", "m1", "m2")
    val out = graft.operators.Reshape.melt(wide, Seq("id"), Seq("m1", "m2"))
      .orderBy("id", "metric").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", "m1", 1L), ("a", "m2", 2L), ("b", "m1", 3L), ("b", "m2", 4L)))
  }

  test("schemaDriftUnion aligns by name and null-fills missing columns") {
    val v1 = Seq((1L, 10.0)).toDF("ok", "totalprice")
    val v2 = Seq((2L, "O", "api")).toDF("ok", "status", "channel")
    val out = graft.operators.Merge.schemaDriftUnion(Seq(v1, v2)).orderBy("ok")
    assert(out.columns.toSeq == Seq("ok", "totalprice", "status", "channel"))
    val rows = out.collect()
    assert(rows(0).getDouble(1) == 10.0 && rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "O" && rows(1).getString(3) == "api")
  }
}
