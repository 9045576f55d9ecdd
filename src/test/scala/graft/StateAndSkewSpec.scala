package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

import graft.operators.Skew
import graft.streaming.MatchStateMachine
import graft.streaming.MatchStateMachine.{MatchState, ScoreUpdate}

class StateAndSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("state machine: in-batch ordering, stale + backwards updates ignored") {
    val state = TestGroupState.create[MatchState](
      optionalState = org.apache.spark.api.java.Optional.empty[MatchState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[java.lang.Long]().asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    val updates = Iterator(
      // delivered out of order on purpose
      ScoreUpdate("m1", "live", Some(1), Some(0), ts("2024-01-01 10:30:00")),
      ScoreUpdate("m1", "scheduled", None, None, ts("2024-01-01 09:00:00")),
      ScoreUpdate("m1", "finished", Some(2), Some(0), ts("2024-01-01 11:45:00")),
      // stale live update after finished — must be ignored
      ScoreUpdate("m1", "live", Some(9), Some(9), ts("2024-01-01 11:00:00")))
    val out = MatchStateMachine.applyUpdates("m1", updates, state)
    assert(out.status == "finished")
    assert(out.home_score.contains(2) && out.away_score.contains(0))
    assert(out.updates_seen == 4L)
    assert(state.get.status == "finished")
  }

  test("state machine: cross-batch state via mapGroupsWithState stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ScoreUpdate]
    val query = MatchStateMachine.track(mem.toDS())
      .writeStream.format("memory").queryName("match_states")
      .outputMode(MatchStateMachine.RequiredOutputMode)
      .start()
    try {
      mem.addData(ScoreUpdate("m2", "scheduled", None, None, ts("2024-01-02 09:00:00")))
      query.processAllAvailable()
      mem.addData(
        ScoreUpdate("m2", "live", Some(1), Some(1), ts("2024-01-02 10:00:00")),
        ScoreUpdate("m3", "live", Some(0), Some(0), ts("2024-01-02 10:00:00")))
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT * FROM (
          |  SELECT *, row_number() OVER (PARTITION BY external_id
          |                               ORDER BY updates_seen DESC) rn
          |  FROM match_states) WHERE rn = 1""".stripMargin).collect()
      val m2 = rows.find(_.getAs[String]("external_id") == "m2").get
      assert(m2.getAs[String]("status") == "live")
      assert(m2.getAs[Long]("updates_seen") == 2L) // state survived the batch boundary
      assert(rows.exists(_.getAs[String]("external_id") == "m3"))
    } finally query.stop()
  }

  test("transformWithState (Spark 4 StatefulProcessor) tracks the same lifecycle") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ScoreUpdate]
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_tws").toString
    // transformWithState needs the RocksDB state store (multi-column-family)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = MatchStateMachine.trackWithState(mem.toDS())
      .writeStream.format("memory").queryName("tws_states")
      .outputMode("update")
      .option("checkpointLocation", ckptDir)
      .start()
    try {
      mem.addData(ScoreUpdate("t1", "scheduled", None, None, ts("2024-01-05 09:00:00")))
      query.processAllAvailable()
      mem.addData(ScoreUpdate("t1", "live", Some(1), Some(0), ts("2024-01-05 10:00:00")))
      query.processAllAvailable()
      val last = spark.sql(
        "SELECT status, updates_seen FROM tws_states ORDER BY updates_seen DESC LIMIT 1").head()
      assert(last.getString(0) == "live")
      assert(last.getLong(1) == 2L) // state crossed the batch boundary
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("bucketed tables: equi-join and aggregation plan without shuffle") {
    import graft.operators.Bucketing
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
    val lineitem = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k")
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k")
    try {
      val joined = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_lineitem"), "k")
      assert(Bucketing.isShuffleFree(joined),
        "bucketed equi-join must not shuffle:\n" + joined.queryExecution.executedPlan)
      assert(joined.count() == lineitem.count()) // same result as plain join
      val agg = Bucketing.table(spark, "b_lineitem").groupBy("k").count()
      assert(Bucketing.isShuffleFree(agg),
        "aggregation on the bucket key must not shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned writes: equality predicate prunes partitions at plan time") {
    import graft.operators.Bucketing
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/orders"
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .withColumn("order_year", year(col("o_orderdate")))
    Bucketing.writePartitioned(orders, dir, "order_year")
    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1997)
    assert(Bucketing.hasPartitionPruning(pruned),
      "year predicate must become a PartitionFilter:\n" +
        pruned.queryExecution.executedPlan)
    assert(pruned.count() ==
      orders.filter(col("order_year") === 1997).count())
  }

  test("CBO stats: ANALYZE feeds exact row counts and NDVs into the optimizer") {
    import graft.operators.Bucketing
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    val dim = (1 to 40).map(i => (i.toLong, s"name$i")).toDF("id", "nm")
    dim.write.mode("overwrite").format("parquet").saveAsTable("cbo_dim")
    Bucketing.analyzeTable(spark, "cbo_dim", Seq("id", "nm"))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // catalog row count is exact
      assert(Bucketing.tableRowCount(spark, "cbo_dim").contains(BigInt(40)))
      // the optimizer sees the analyzed row count, not a file-size guess
      val stats = spark.table("cbo_dim").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(40)), s"optimizer stats: $stats")
      // per-column NDV recorded
      val idStats = spark.sql("DESCRIBE EXTENDED cbo_dim id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(idStats.get("distinct_count").exists(_.toLong >= 38L), idStats)
      // stats-visible small table broadcasts in a join
      val fact = (1 to 2000).map(i => (i.toLong % 40 + 1, i)).toDF("id", "v")
      val joined = fact.join(spark.table("cbo_dim"), "id")
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
    }
  }

  test("saltedJoin: identical results to plain join, including left-join nulls") {
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload") // key 1 is hot: 90% of rows
    val small = Seq((1L, "dim1"), (7L, "dim7"), (999999L, "unmatched"))
      .toDF("k", "dim")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "dim").collect()
        .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
        .toSeq.sorted(Ordering.by((t: (Long, String, String)) => (t._1, t._2, String.valueOf(t._3))))
    val plainInner = canon(large.join(small, Seq("k")))
    val saltedInner = canon(Skew.saltedJoin(large, small, Seq("k")))
    assert(saltedInner == plainInner)
    val plainLeft = canon(large.join(small, Seq("k"), "left"))
    val saltedLeft = canon(Skew.saltedJoin(large, small, Seq("k"), joinType = "left"))
    assert(saltedLeft == plainLeft)
    assert(saltedLeft.count(_._3 == null) == 100) // keys 901..1000 unmatched
    // outer variants would replicate unmatched small-side rows `factor`
    // times — the operator refuses them up front
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, Seq("k"), joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, Seq("k"), joinType = "full_outer")
    }
  }
}
