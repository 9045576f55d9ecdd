package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Testdata-schema canary: the driver regenerates the parquet corpus
  * between rounds and has already changed physical encodings once
  * (events.ts: TIMESTAMP(NANOS)-as-Long → timestamp[us]/TIMESTAMP_NTZ),
  * which silently took out every event-time query. This suite fails
  * LOUDLY, in one named place, if a regeneration breaks a contract the
  * engine relies on:
  *
  *  - every registry table loads and has rows;
  *  - `Tables.events` exposes the normalized `ts_utc` (timestamp) and
  *    `ts_ms` (long epoch millis) columns regardless of the physical
  *    `ts` encoding, and they agree with each other (ms = µs-truncated
  *    instant millis).
  */
class TablesCanarySpec extends SparkSpec {

  test("every registry table loads with rows > 0") {
    for (name <- Tables.names) {
      val df = Tables.load(spark, TestSpark.Sf0001, name)
      assert(df.limit(1).count() == 1, s"table $name is empty or unreadable")
    }
  }

  test("events exposes normalized ts_utc/ts_ms whatever the physical ts type") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val schema = ev.schema
    assert(schema("ts_utc").dataType == TimestampType,
      s"ts_utc must be TimestampType, got ${schema("ts_utc").dataType}")
    assert(schema("ts_ms").dataType == LongType,
      s"ts_ms must be LongType, got ${schema("ts_ms").dataType}")
    // ts_ms is exactly the millis of the ts_utc instant (µs truncation)
    val bad = ev.filter(
      org.apache.spark.sql.functions.expr("unix_millis(ts_utc) <> ts_ms"))
    assert(bad.limit(1).count() == 0, "ts_ms disagrees with ts_utc")
    // sane range: corpus is 2024-era, not 1970 (a unit slip of 1e3/1e6
    // lands decades away)
    val range = ev.agg(
      org.apache.spark.sql.functions.min("ts_ms"),
      org.apache.spark.sql.functions.max("ts_ms")).head()
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    assert(lo > 1262304000000L && hi < 2524608000000L, // 2010..2050
      s"ts_ms range [$lo, $hi] outside plausible epoch-millis window — unit drift?")
    // The upsert/merge witnesses split the log at EventOps.CutoffMs
    // (2024-01-20). Both engines share the constant, so a corpus that no
    // longer straddles it would still hash-match — while silently testing
    // nothing. Fail loudly instead.
    assert(lo < 1705708800000L && hi > 1705708800000L,
      s"events no longer straddle the 2024-01-20 cutoff ([$lo, $hi]) — " +
        "q_upsert_merge's current/staged split has degenerated; move " +
        "EventOps.CutoffMs (and its oracle SQL literal) to mid-corpus")
  }

  test("gapFillDaily: contiguous per-user spine, no nulls after the first day") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.EventOps.gapFillDaily(spark, TestSpark.Sf0001)
    // spine is gapless: per user, day count == max-min+1
    val gaps = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max(col("day")) - min(col("day")) + 1).as("span"))
      .filter(col("n") =!= col("span"))
    assert(gaps.limit(1).count() == 0, "spine has gaps")
    // the first spine day is an observation by construction, so the
    // forward fill never leaves a null
    assert(out.filter(col("filled_value").isNull).limit(1).count() == 0)
    // carried rows exist (the corpus has silent days) and carry the
    // previous observed value, never invent one
    assert(out.filter(!col("is_observed")).limit(1).count() == 1)
  }
}
