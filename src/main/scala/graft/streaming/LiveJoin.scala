package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: live scores ⋈ live odds.
  *
  * The reference runs its two polling loops independently (live scores
  * every 30 s, odds every 300 s, scraping_orchestrator.py:311-331) and
  * correlates them only at rest, in PostgreSQL. The streaming-native form
  * joins the two micro-streams in flight: every score update is enriched
  * with the odds snapshots captured around it, emitting (score, odds)
  * rows as both sides arrive.
  *
  * Scale/state shape — the part that matters at cluster scale:
  *
  *  - BOTH sides carry a watermark, and the join condition bounds the
  *    event-time distance (`odds.captured_at` within [-lookback, +lead]
  *    of `score.updated_at`). Spark derives from those two facts exactly
  *    how long each side's rows must be buffered in the state store and
  *    evicts everything older — state is bounded by stream RATE ×
  *    WINDOW, never by stream history. An unbounded stream-stream join
  *    (no watermark or no time bound) accumulates state forever and is
  *    the streaming scale-killer this module exists to avoid.
  *  - The join key (`match_id`) hash-partitions both sides' state: each
  *    task holds only its key range's window, so state parallelizes with
  *    the cluster exactly like a shuffle.
  *  - Inner join emits as matches arrive; the left-outer variant also
  *    emits score rows with NO odds in window once the watermark proves
  *    no match can still arrive (null-padded, late-but-complete).
  */
object LiveJoin {

  /** @param scores streaming frame with (match_id, updated_at, …)
    * @param odds   streaming frame with (odds_match_id, captured_at, …) —
    *               key column pre-renamed so join output is unambiguous
    * @param lookbackMinutes how far BEFORE the score update an odds
    *               snapshot may be captured and still attach
    * @param leadMinutes     how far AFTER
    * @param joinType "inner" or "leftOuter" (outer needs both watermarks;
    *               unmatched rows emit only after watermark passage) */
  def scoreOddsJoin(scores: DataFrame, odds: DataFrame,
                    lookbackMinutes: Int = 10, leadMinutes: Int = 2,
                    delayThreshold: String = "1 minute",
                    joinType: String = "inner"): DataFrame = {
    val s = scores.withWatermark("updated_at", delayThreshold)
    val o = odds.withWatermark("captured_at", delayThreshold)
    s.join(o,
      col("match_id") === col("odds_match_id") &&
        col("captured_at") >= col("updated_at") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
        col("captured_at") <= col("updated_at") + expr(s"INTERVAL $leadMinutes MINUTES"),
      joinType)
  }
}
