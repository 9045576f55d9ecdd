package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Incremental}
import graft.scale.EmbedStats

/** Unit evidence for the round-6 delta-processing operators: CDC
  * changelog apply, incremental join maintenance, and the embedding
  * stats pass. The cross-engine result identity is oracle-checked
  * (q_cdc_apply / q_incr_join / q_embed_stats); these specs pin the
  * semantic corners the corpus can't reach and the plan shapes. */
class CdcIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, Long, String, Double)*) =
    rows.toSeq.toDF("k", "seq", "op", "bal")

  test("Cdc.compact keeps the highest-seq record per key") {
    val out = Cdc.compact(
      log((1L, 1L, "U", 10.0), (1L, 3L, "U", 30.0), (1L, 2L, "D", 0.0),
          (2L, 7L, "I", 70.0)),
      Seq("k"), "seq").orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "U", 30.0), (2L, "I", 70.0)))
  }

  test("applyChangelog: update wins, delete removes, untouched passes, D-on-absent is a no-op") {
    val base = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "bal")
    val out = Cdc.applyChangelog(base,
        log((1L, 10L, "U", 11.0),          // update
            (2L, 10L, "D", 0.0),           // delete present key
            (9L, 10L, "D", 0.0),           // delete absent key: no-op
            (4L, 10L, "I", 44.0)),         // insert new key
        Seq("k"), "seq").orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 11.0, "cdc"), (3L, 3.0, "base"), (4L, 44.0, "cdc")))
  }

  test("applyChangelog: delete-then-later-update resurrects (latest seq wins)") {
    val base = Seq((1L, 1.0)).toDF("k", "bal")
    val out = Cdc.applyChangelog(base,
      log((1L, 5L, "D", 0.0), (1L, 6L, "U", 9.0)), Seq("k"), "seq").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 9.0)))
  }

  test("applyChangelog replay is idempotent (same log twice = same state)") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "bal")
    val l = log((1L, 5L, "U", 7.0), (2L, 6L, "D", 0.0))
    val once = Cdc.applyChangelog(base, l, Seq("k"), "seq")
    val twice = Cdc.applyChangelog(once.drop("src"), l, Seq("k"), "seq")
    assert(twice.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      once.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("applyChangelog passes base-only columns through (partial-row CDC feed)") {
    val base = Seq((1L, 1.0, "EU"), (2L, 2.0, "NA")).toDF("k", "bal", "region")
    val out = Cdc.applyChangelog(base, log((1L, 5L, "U", 9.0)), Seq("k"), "seq")
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, 9.0, "EU", "cdc"), (2L, 2.0, "NA", "base")))
  }

  test("applyChangelog carries changelog-only payload columns (null for base rows)") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "bal")
    val l = Seq((1L, 5L, "U", "feed-7")).toDF("k", "seq", "op", "origin")
    val out = Cdc.applyChangelog(base, l, Seq("k"), "seq").orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq ==
      Seq((1L, 1.0, Some("feed-7")), (2L, 2.0, None)))
  }

  test("applyChangelog rejects a base frame that owns the op column name") {
    val base = Seq((1L, "x")).toDF("k", "op")
    val err = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, log((1L, 1L, "U", 1.0)), Seq("k"), "seq")
    }
    assert(err.getMessage.contains("op"))
  }

  test("Cdc.compact is an aggregate, not a ranked window (map-side combining)") {
    val plan = Cdc.compact(log((1L, 1L, "U", 1.0)), Seq("k"), "seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"compaction must not rank-window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("Incremental.maintainJoin equals the monolithic join (synthetic)") {
    val a = Seq((1L, "a1"), (2L, "a2"), (10L, "a10"), (20L, "a20"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (10L, "b10")).toDF("k", "bv")
    val aDelta = a.filter(col("k") >= 10); val aOld = a.filter(col("k") < 10)
    val bDelta = b.filter(col("k") >= 10); val bOld = b.filter(col("k") < 10)
    val jOld = aOld.join(bOld, Seq("k"))
    val maintained = Incremental.maintainJoin(jOld, aOld, aDelta, bOld, bDelta, Seq("k"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val full = a.join(b, Seq("k")).orderBy("k").collect().map(_.toSeq).toSeq
    assert(maintained == full)
  }

  test("q_incr_join delta terms are broadcast joins (big sides never shuffle)") {
    val plan = Incremental.incrJoinQuery(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"expected the three delta terms to broadcast:\n$plan")
  }

  test("EmbedStats flags a dead dimension (min == max) and counts exactly") {
    val df = Seq(
      (1L, Array(0.5f, 1.0f, -0.25f)),
      (2L, Array(0.5f, 2.0f, 0.75f))).toDF("vec_id", "embedding")
    val out = EmbedStats.perDimension(df).orderBy("dim").collect()
    assert(out.length == 3)
    assert(out(0).getDouble(2) == out(0).getDouble(3))     // dim 0 dead
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L)) // n_vals
    // scaled sums: floor(.5e6)*2 = 1000000; floor(1e6)+floor(2e6) = 3000000;
    // floor(-0.25e6) = -250000, floor(0.75e6) = 750000 -> 500000
    assert(out.map(_.getLong(4)).toSeq == Seq(1000000L, 3000000L, 500000L))
    assert(out.map(_.getLong(5)).toSeq == Seq(2L, 2L, 1L)) // n_pos
  }
}
