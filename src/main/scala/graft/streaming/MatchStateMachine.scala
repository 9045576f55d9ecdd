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

  private[graft] def applyUpdates(key: String, updates: Iterator[ScoreUpdate],
                                  state: GroupState[MatchState]): MatchState = {
    val sorted = updates.toSeq.sortBy(_.scraped_at.getTime)
    val init = state.getOption.getOrElse(
      MatchState(key, "scheduled", None, None, new Timestamp(0L), 0L))
    val next = sorted.foldLeft(init) { (st, u) =>
      val fresh = u.scraped_at.getTime > st.last_update.getTime
      val forward = StatusRank.getOrElse(u.status, -1) >= StatusRank(st.status)
      if (fresh && forward)
        MatchState(key, u.status,
          u.home_score.orElse(st.home_score), u.away_score.orElse(st.away_score),
          u.scraped_at, st.updates_seen + 1)
      else st.copy(updates_seen = st.updates_seen + 1)
    }
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
      val sorted = rows.toSeq.sortBy(_.scraped_at.getTime)
      val init = Option(state.get()).getOrElse(
        MatchState(key, "scheduled", None, None, new Timestamp(0L), 0L))
      val next = sorted.foldLeft(init) { (st, u) =>
        val fresh = u.scraped_at.getTime > st.last_update.getTime
        val forward = StatusRank.getOrElse(u.status, -1) >= StatusRank(st.status)
        if (fresh && forward)
          MatchState(key, u.status,
            u.home_score.orElse(st.home_score), u.away_score.orElse(st.away_score),
            u.scraped_at, st.updates_seen + 1)
        else st.copy(updates_seen = st.updates_seen + 1)
      }
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
