package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's concrete analytics API over sports-shaped frames
  * (graft.schema.Schemas) — the queries a user of
  * Coding-champ/Sport-Data-Pipeline actually calls, as lazy
  * DataFrame → DataFrame transformations (SURVEY.md §3.1: SQL + pandas
  * post-processing collapse into one Catalyst plan).
  *
  * Includes the §2.12 "declared-but-unimplemented" shapes
  * (generate_league_analytics, trends) as real queries.
  */
object SportsAnalytics {

  /** get_top_performers (reference src/analytics/engine.py:336-352):
    * activity floor, goal contributions, guarded per-match ratio, top-k. */
  def topPerformers(players: DataFrame, stats: DataFrame, teams: DataFrame,
                    season: Option[String] = None, minMatches: Int = 10,
                    limit: Int = 20): DataFrame = {
    val base = stats
      .filter(season.map(s => col("season") === s).getOrElse(lit(true)))
      .filter(col("matches_played") >= minMatches)
      .join(players, "player_id")
      .join(broadcast(teams), "team_id")
    base.select(
        col("player_id"),
        concat_ws(" ", col("first_name"), col("last_name")).as("player_name"),
        col("name").as("team_name"),
        col("matches_played"), col("goals"), col("assists"),
        (col("goals") + col("assists")).as("goal_contributions"),
        // guarded division (engine.py:344)
        when(col("matches_played") > 0,
          col("goals").cast("double") / col("matches_played")).otherwise(0.0)
          .as("goals_per_match"))
      .orderBy(col("goal_contributions").desc, col("player_id").asc)
      .limit(limit)
  }

  /** Per-team form over the last N finished matches (engine.py:137-191,
    * the O(teams×matches) Python loop made set-based): explode matches
    * into (team, side) rows, rank by recency, aggregate points (3/1/0),
    * goals for/against, and the WWDLL-style form string. */
  def teamForm(matches: DataFrame, results: DataFrame, lastN: Int = 5): DataFrame = {
    val m = matches.filter(col("status") === "finished")
      .join(results, "match_id")
    val homeSide = m.select(
      col("home_team_id").as("team_id"), col("match_id"), col("match_date_time"),
      col("home_score").as("gf"), col("away_score").as("ga"))
    val awaySide = m.select(
      col("away_team_id").as("team_id"), col("match_id"), col("match_date_time"),
      col("away_score").as("gf"), col("home_score").as("ga"))
    val sides = homeSide.unionByName(awaySide)
      .withColumn("points",
        when(col("gf") > col("ga"), 3).when(col("gf") === col("ga"), 1).otherwise(0))
      .withColumn("letter",
        when(col("gf") > col("ga"), "W").when(col("gf") === col("ga"), "D").otherwise("L"))
    val recent = sides
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("team_id"))
          .orderBy(col("match_date_time").desc, col("match_id").desc)))
      .filter(col("rn") <= lastN)
    recent.groupBy("team_id")
      .agg(
        count(lit(1)).as("matches"),
        sum(col("points")).cast("long").as("points"),
        avg(col("gf")).as("avg_goals_for"),
        avg(col("ga")).as("avg_goals_against"),
        // most-recent first, matching the reference's form reading order
        concat_ws("", transform(
          array_sort(collect_list(struct(col("rn"), col("letter")))),
          s => s.getField("letter"))).as("form"))
  }

  /** Head-to-head record for an unordered team pair (engine.py:193-229) —
    * symmetric-pair groupBy, no self-join. */
  def headToHead(matches: DataFrame, results: DataFrame): DataFrame = {
    val m = matches.filter(col("status") === "finished").join(results, "match_id")
    val (lo, hi) = Joins.symmetricPair(col("home_team_id"), col("away_team_id"))
    m.withColumn("team_lo", lo).withColumn("team_hi", hi)
      .withColumn("lo_won",
        when((col("home_team_id") === col("team_lo")) && (col("home_score") > col("away_score")), 1)
          .when((col("away_team_id") === col("team_lo")) && (col("away_score") > col("home_score")), 1)
          .otherwise(0))
      .withColumn("draw", when(col("home_score") === col("away_score"), 1).otherwise(0))
      .groupBy("team_lo", "team_hi")
      .agg(
        count(lit(1)).as("meetings"),
        sum(col("lo_won")).cast("long").as("lo_wins"),
        sum(col("draw")).cast("long").as("draws"),
        avg(col("home_score") + col("away_score")).as("avg_total_goals"))
      .withColumn("hi_wins", col("meetings") - col("lo_wins") - col("draws"))
  }

  /** generate_league_analytics (§2.12 — shape specified by the dashboard
    * consumer, reports.py:155-213, never implemented in the reference):
    * league_summary + statistical_insights in one aggregation pass. */
  def leagueAnalytics(matches: DataFrame, results: DataFrame, teams: DataFrame): DataFrame = {
    val m = matches.filter(col("status") === "finished").join(results, "match_id")
    val totals = m.agg(
      count(lit(1)).as("matches_played"),
      sum(col("home_score") + col("away_score")).cast("long").as("total_goals"),
      avg(col("home_score") + col("away_score")).as("avg_goals_per_match"),
      avg(when(col("home_score") > col("away_score"), 1.0).otherwise(0.0))
        .multiply(100).as("home_win_rate"),
      avg(when(col("home_score") < col("away_score"), 1.0).otherwise(0.0))
        .multiply(100).as("away_win_rate"),
      avg(when(col("home_score") === col("away_score"), 1.0).otherwise(0.0))
        .multiply(100).as("draw_rate"),
      avg(when(col("home_score") + col("away_score") >= 3, 1.0).otherwise(0.0))
        .multiply(100).as("high_scoring_percentage"))
    totals.crossJoin(teams.agg(count(lit(1)).as("total_teams")))
  }

  /** Standings snapshot (standing_row semantics, schema.sql:759-776):
    * points, goal difference, rank with the reference's tiebreak order. */
  def standings(matches: DataFrame, results: DataFrame): DataFrame = {
    val form = teamFormAll(matches, results)
    form.withColumn("position",
      rank().over(Window.orderBy(
        col("points").desc, col("goal_diff").desc,
        col("goals_for").desc, col("team_id").asc)).cast("long"))
  }

  private def teamFormAll(matches: DataFrame, results: DataFrame): DataFrame = {
    val m = matches.filter(col("status") === "finished").join(results, "match_id")
    val sides = m.select(
        col("home_team_id").as("team_id"),
        col("home_score").as("gf"), col("away_score").as("ga"))
      .unionByName(m.select(
        col("away_team_id").as("team_id"),
        col("away_score").as("gf"), col("home_score").as("ga")))
    sides
      .withColumn("points",
        when(col("gf") > col("ga"), 3).when(col("gf") === col("ga"), 1).otherwise(0))
      .groupBy("team_id")
      .agg(
        count(lit(1)).as("played"),
        sum(col("points")).cast("long").as("points"),
        sum(col("gf")).cast("long").as("goals_for"),
        sum(col("ga")).cast("long").as("goals_against"))
      .withColumn("goal_diff", col("goals_for") - col("goals_against"))
  }

  /** Transfer candidates (reports.py:327-391): latest market value per
    * player (W7 as-of read), hot prospects (age≤25, mv≥5M) and bargains
    * (age≥28, mv≤3M) tagged in one pass. */
  def transferCandidates(players: DataFrame, marketValues: DataFrame,
                         asOf: Column = current_date()): DataFrame = {
    val latestMv = Ranking.latestPerKey(marketValues,
      Seq(col("player_id")), Seq(col("valuation_date")))
    val withAge = players.join(latestMv, "player_id")
      .withColumn("age",
        floor(months_between(asOf, col("date_of_birth")) / 12).cast("int"))
      .withColumn("mv", col("value_eur").cast("double"))
    withAge
      .withColumn("category",
        when(col("age") <= 25 && col("mv") >= 5e6, "hot_prospect")
          .when(col("age") >= 28 && col("mv") <= 3e6, "bargain"))
      .filter(col("category").isNotNull)
      .select("player_id", "first_name", "last_name", "age", "mv", "category")
  }
}
