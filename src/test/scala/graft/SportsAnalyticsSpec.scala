package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SportsAnalytics
import graft.schema.Schemas

class SportsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 15:30:00")

  // 4 finished matches: A(1), B(2), C(3)
  private lazy val matches = Seq(
    (10L, 1L, 2L, ts("2025-01-01"), "finished"),
    (11L, 2L, 1L, ts("2025-01-08"), "finished"),
    (12L, 1L, 3L, ts("2025-01-15"), "finished"),
    (13L, 3L, 2L, ts("2025-01-22"), "finished"),
    (14L, 1L, 2L, ts("2025-02-01"), "scheduled"))
    .toDF("match_id", "home_team_id", "away_team_id", "match_date_time", "status")
  private lazy val results = Seq(
    (10L, 2, 1), (11L, 0, 0), (12L, 1, 3), (13L, 2, 2),
    (14L, 9, 9)) // result for a scheduled match must be ignored
    .toDF("match_id", "home_score", "away_score")
  private lazy val teams = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("team_id", "name")

  test("schema registry: every canonical table materializes") {
    Schemas.all.keys.foreach { name =>
      assert(Schemas.emptyFrame(spark, name).schema == Schemas.all(name))
    }
    assert(Schemas.Enums.MatchStatus.contains("finished"))
  }

  test("standings: points/goal-diff ranking with reference tiebreaks") {
    val s = SportsAnalytics.standings(matches, results)
      .orderBy("position").collect()
    assert(s.map(_.getAs[Long]("team_id")).toSeq == Seq(3L, 1L, 2L))
    assert(s.map(_.getAs[Long]("points")).toSeq == Seq(4L, 4L, 2L))
    assert(s.map(_.getAs[Long]("goal_diff")).toSeq == Seq(2L, -1L, -1L))
  }

  test("teamForm: last-N points, averages, and WWDLL form string") {
    val f = SportsAnalytics.teamForm(matches, results, lastN = 2)
      .orderBy("team_id").collect()
    val a = f.find(_.getAs[Long]("team_id") == 1L).get
    assert(a.getAs[Long]("points") == 1L)      // L (m12) + D (m11)
    assert(a.getAs[String]("form") == "LD")    // most recent first
    val c = f.find(_.getAs[Long]("team_id") == 3L).get
    assert(c.getAs[String]("form") == "DW")
    assert(c.getAs[Double]("avg_goals_for") == 2.5)
  }

  test("headToHead: symmetric pair record") {
    val h = SportsAnalytics.headToHead(matches, results)
      .filter(col("team_lo") === 1L && col("team_hi") === 2L).head()
    assert(h.getAs[Long]("meetings") == 2L)
    assert(h.getAs[Long]("lo_wins") == 1L)
    assert(h.getAs[Long]("draws") == 1L)
    assert(h.getAs[Long]("hi_wins") == 0L)
    assert(h.getAs[Double]("avg_total_goals") == 1.5)
  }

  test("leagueAnalytics: §2.12 league_summary + statistical_insights shape") {
    val r = SportsAnalytics.leagueAnalytics(matches, results, teams).head()
    assert(r.getAs[Long]("matches_played") == 4L)
    assert(r.getAs[Long]("total_goals") == 11L)
    assert(r.getAs[Double]("avg_goals_per_match") == 2.75)
    assert(r.getAs[Double]("home_win_rate") == 25.0)
    assert(r.getAs[Double]("away_win_rate") == 25.0)
    assert(r.getAs[Double]("draw_rate") == 50.0)
    assert(r.getAs[Double]("high_scoring_percentage") == 75.0)
    assert(r.getAs[Long]("total_teams") == 3L)
  }

  test("topPerformers: floor, contributions, guarded ratio") {
    val players = Seq(
      (100L, "Lionel", "Messi"), (101L, "Erling", "Haaland"), (102L, "Bench", "Guy"))
      .toDF("player_id", "first_name", "last_name")
    val stats = Seq(
      (100L, 1L, "2025", 20, 18, 12),
      (101L, 2L, "2025", 20, 25, 3),
      (102L, 1L, "2025", 3, 2, 0)) // below floor
      .toDF("player_id", "team_id", "season", "matches_played", "goals", "assists")
    val top = SportsAnalytics.topPerformers(players, stats, teams,
      season = Some("2025"), minMatches = 10).collect()
    assert(top.length == 2)
    assert(top(0).getAs[String]("player_name") == "Lionel Messi") // 30 > 28
    assert(top(0).getAs[Int]("goal_contributions") == 30)
    assert(top(1).getAs[Double]("goals_per_match") == 1.25)
  }

  test("transferCandidates: hot prospects and bargains off latest market value") {
    val players = Seq(
      (100L, "Young", "Star", java.sql.Date.valueOf("2002-03-01")),
      (101L, "Old", "Value", java.sql.Date.valueOf("1995-03-01")),
      (102L, "Mid", "Guy", java.sql.Date.valueOf("1998-03-01")))
      .toDF("player_id", "first_name", "last_name", "date_of_birth")
    val mv = Seq(
      (100L, java.sql.Date.valueOf("2025-01-01"), 6.0e6),
      (100L, java.sql.Date.valueOf("2024-01-01"), 1.0e6), // stale, must lose
      (101L, java.sql.Date.valueOf("2025-01-01"), 2.0e6),
      (102L, java.sql.Date.valueOf("2025-01-01"), 4.0e6))
      .toDF("player_id", "valuation_date", "value_eur")
    val out = SportsAnalytics.transferCandidates(players, mv,
        asOf = lit("2025-06-01").cast("date"))
      .orderBy("player_id").collect()
    assert(out.map(_.getAs[String]("category")).toSeq == Seq("hot_prospect", "bargain"))
    assert(out(0).getAs[Double]("mv") == 6.0e6)
  }
}
