package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark (SURVEY.md §2.10 T7):
  * the reference's calendar-batch weekly/daily aggregates
  * (scraping_orchestrator.py:236-261) as true streaming tumbling windows —
  * state bounded by the watermark, late rows beyond it dropped, windows
  * emitted once closed (append mode).
  */
object WindowedAgg {

  /** Tumbling event-time counts + sums per (window, key). */
  def tumbling(events: DataFrame, timeCol: String, keyCol: String,
               windowLength: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLength), col(keyCol))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("cnt"), col("value_sum"))

  /** Streaming hot-term monitor: per tumbling window, token frequencies
    * of a text stream — the streaming counterpart of
    * [[graft.scale.Search.ngramCounts]] and the live version of the
    * boilerplate/heavy-hitter probe ([[graft.operators.Approx.heavyHitters]]
    * confirms suspects offline). The explode is narrow (no shuffle
    * before the windowed aggregate), the aggregate keys on
    * (window, token) — vocab-bounded state, watermark-bounded windows,
    * late text dropped like any T7 window. Emitting every token's count
    * and letting the consumer top-k keeps the sink append-only; a
    * foreachBatch [[graft.plans.TopKPerKey]] pass is the bounded-output
    * variant. */
  def windowedTokenCounts(docs: DataFrame, timeCol: String, textCol: String,
                          windowLength: String, watermark: String): DataFrame =
    docs
      .withWatermark(timeCol, watermark)
      .select(col(timeCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(window(col(timeCol), windowLength), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("token"), col("cnt"))

  /** Event-time session windows per key: activity bursts separated by
    * ≥ `gap` of silence become one window each (the streaming counterpart
    * of the batch gap-sessionize in [[graft.operators.Sessionize]] /
    * q_sessions — same 30-minute-gap semantics the reference's live
    * tracker encodes procedurally). Native `session_window` keeps one
    * open session per active key, merges on overlap, and emits when the
    * watermark passes the session end — state is bounded by concurrently
    * ACTIVE keys, not history. */
  def sessions(events: DataFrame, timeCol: String, keyCol: String,
               gap: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value")).as("value_sum"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("cnt"), col("value_sum"))
}
