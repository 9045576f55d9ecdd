package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `mapGroupsWithState` (builder brief /
  * SURVEY.md §2.10): the live-match lifecycle the reference maintains by
  * re-upserting rows every 30 s (scheduled → live → finished), made an
  * explicit state machine with out-of-order protection —
  *
  *  - updates apply in event-time (`scraped_at`) order within a batch
  *  - a stale update (older than the state's last event) is ignored
  *  - status can only move forward (finished never reverts to live), the
  *    monotonicity PostgreSQL upserts gave the reference implicitly via
  *    last-writer-wins on wall clock
  *
  * State size = one record per live match key; at 1000 executors state is
  * hash-partitioned by key and checkpointed by the streaming engine.
  */
object MatchStateMachine {

  case class ScoreUpdate(external_id: String, status: String,
                         home_score: Option[Int], away_score: Option[Int],
                         scraped_at: Timestamp)

  case class MatchState(external_id: String, status: String,
                        home_score: Option[Int], away_score: Option[Int],
                        last_update: Timestamp, updates_seen: Long)

  private val StatusRank = Map("scheduled" -> 0, "live" -> 1, "finished" -> 2)

  /** The one lifecycle fold shared by both state APIs (mapGroupsWithState
    * and the transformWithState processor — previously two verbatim
    * copies that could drift independently).
    *
    * Ordering within a batch is a deterministic TOTAL order, not just
    * scraped_at: scrape timestamps have 1 s granularity and two racing
    * scrapers can deliver conflicting same-timestamp updates; sortBy is
    * stable, so without a tiebreak the winner was whichever row the
    * shuffle happened to deliver first. Among equal timestamps the most
    * progressed update sorts FIRST (highest status rank, then highest
    * scores) and is applied; the rest then fail the strict `fresh` check
    * — the same rule the strict `>` already gives equal-timestamp
    * updates arriving in a LATER batch (existing state wins, mirroring
    * the reference's `excluded.updated_at > live_scores.updated_at`). */
  private def foldUpdates(key: String, init: MatchState,
                          updates: Seq[ScoreUpdate]): MatchState = {
    val sorted = updates.sortBy(u => (u.scraped_at.getTime,
      -StatusRank.getOrElse(u.status, -1),
      -u.home_score.getOrElse(-1), -u.away_score.getOrElse(-1)))
    sorted.foldLeft(init) { (st, u) =>
      val fresh = u.scraped_at.getTime > st.last_update.getTime
      val forward = StatusRank.getOrElse(u.status, -1) >= StatusRank(st.status)
      if (fresh && forward)
        MatchState(key, u.status,
          u.home_score.orElse(st.home_score), u.away_score.orElse(st.away_score),
          u.scraped_at, st.updates_seen + 1)
      else st.copy(updates_seen = st.updates_seen + 1)
    }
  }

  private def initState(key: String): MatchState =
    MatchState(key, "scheduled", None, None, new Timestamp(0L), 0L)

  private[graft] def applyUpdates(key: String, updates: Iterator[ScoreUpdate],
                                  state: GroupState[MatchState]): MatchState = {
    val next = foldUpdates(key, state.getOption.getOrElse(initState(key)),
      updates.toSeq)
    state.update(next)
    next
  }

  /** Wire the state machine over a stream of updates. Output mode must be
    * `update` downstream. */
  def track(updates: Dataset[ScoreUpdate]): Dataset[MatchState] = {
    implicit val enc = Encoders.product[MatchState]
    updates.groupByKey(_.external_id)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(applyUpdates)
  }

  val RequiredOutputMode: OutputMode = OutputMode.Update()

  /** Spark-4-native variant: the same lifecycle as a `StatefulProcessor`
    * for `transformWithState` — typed ValueState handle, RocksDB-backed,
    * TTL-capable; the successor API to mapGroupsWithState. */
  class MatchProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, ScoreUpdate, MatchState] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var state: ValueState[MatchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MatchState](
        "match_state", Encoders.product[MatchState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ScoreUpdate],
                                 timerValues: TimerValues): Iterator[MatchState] = {
      val next = foldUpdates(key, Option(state.get()).getOrElse(initState(key)),
        rows.toSeq)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** transformWithState wiring (requires the RocksDB state store provider
    * on the session). */
  def trackWithState(updates: Dataset[ScoreUpdate]): Dataset[MatchState] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val enc = Encoders.product[MatchState]
    updates.groupByKey(_.external_id)(Encoders.STRING)
      .transformWithState(new MatchProcessor, TimeMode.None(), OutputMode.Update())
  }
}
