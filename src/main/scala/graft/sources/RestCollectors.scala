package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST API collector mapping (SURVEY §2 S18/S19): football-data.org
  * response documents → typed team / player / match records, the field
  * and status-enum mapping of the reference's
  * `football_data_api_collector.py:55-151`
  * (`collect_teams` / `collect_players` / `collect_matches`).
  *
  * The engine never performs network I/O — responses arrive as bronze
  * JSON snapshots (one response document per row, [[Bronze]] pattern).
  * Parsing is schema-on-read (`from_json` with an explicit schema — no
  * sampling pass, mandatory at 100 TB) + `explode` for the one-response
  * → many-records fan-out; the whole mapping is expressions inside one
  * codegen stage, embarrassingly parallel across snapshot splits.
  *
  * Mapping semantics preserved from the reference:
  *  - teams: `str(id)`, `area.name` via null-safe access, `founded`
  *    nullable, `shortName`/`tla` defaulting to "" when absent.
  *  - players: full name = `name`, else `firstName + " " + lastName`
  *    when BOTH present, else "Unknown"; empty-string `position` → null;
  *    `dateOfBirth` ISO-parsed, absent → null.
  *  - matches: the 8-entry status ladder (`IN_PLAY`/`PAUSED` → live,
  *    …) with unknown AND absent statuses defaulting to "scheduled";
  *    `utcDate` with its `Z` → `+00:00` rewrite; `venue.name` null-safe;
  *    `round_label` = `matchday` (stringified) falling back to
  *    `round.name` — the reference's `get("matchday") or
  *    get("round", {}).get("name")`.
  */
object RestCollectors {

  /** football-data.org `/teams` response schema (the fields the mapping
    * consumes — unknown keys are ignored by from_json, like the
    * reference's dict access). */
  val TeamsSchema: StructType = StructType(Seq(
    StructField("teams", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("area", StructType(Seq(StructField("name", StringType)))),
      StructField("founded", LongType),
      StructField("shortName", StringType),
      StructField("tla", StringType)))))))

  /** `/teams/{id}` response schema — the `squad` array. */
  val SquadSchema: StructType = StructType(Seq(
    StructField("squad", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("firstName", StringType),
      StructField("lastName", StringType),
      StructField("dateOfBirth", StringType),
      StructField("nationality", StringType),
      StructField("position", StringType)))))))

  /** `/competitions/{id}/matches` response schema. `competition.id` and
    * `filters.season` stand in for the reference's league_id/season call
    * parameters — the API echoes the requested competition and season
    * filter back in the response envelope, so the values are identical. */
  val MatchesSchema: StructType = StructType(Seq(
    StructField("competition", StructType(Seq(StructField("id", LongType)))),
    StructField("filters", StructType(Seq(StructField("season", StringType)))),
    StructField("matches", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("homeTeam", StructType(Seq(StructField("id", LongType)))),
      StructField("awayTeam", StructType(Seq(StructField("id", LongType)))),
      StructField("utcDate", StringType),
      StructField("status", StringType),
      StructField("venue", StructType(Seq(StructField("name", StringType)))),
      StructField("matchday", LongType),
      StructField("round", StructType(Seq(StructField("name", StringType))))))))))

  /** collect_teams (reference :55-79): one row per `teams[]` element. */
  def collectTeams(responses: DataFrame, jsonCol: String = "body"): DataFrame =
    responses
      .select(explode(from_json(col(jsonCol), TeamsSchema).getField("teams")).as("t"))
      .select(
        col("t.id").cast("string").as("team_id"),
        col("t.name").as("name"),
        col("t.area.name").as("country"),
        col("t.founded").as("founded"),
        coalesce(col("t.shortName"), lit("")).as("short_name"),
        coalesce(col("t.tla"), lit("")).as("tla"))

  /** collect_players (reference :81-115): one row per `squad[]` element.
    * Name composition branch order matches the reference: `name` wins,
    * then first+last (both required), else "Unknown". */
  def collectPlayers(responses: DataFrame, jsonCol: String = "body"): DataFrame =
    responses
      .select(explode(from_json(col(jsonCol), SquadSchema).getField("squad")).as("p"))
      .select(
        col("p.id").cast("string").as("player_id"),
        when(col("p.name").isNotNull, col("p.name"))
          .when(col("p.firstName").isNotNull && col("p.lastName").isNotNull,
            concat_ws(" ", col("p.firstName"), col("p.lastName")))
          .otherwise(lit("Unknown")).as("name"),
        // try_to_date: "unknown"/malformed API strings degrade to null
        // under ANSI mode instead of aborting the whole collect
        try_to_date(col("p.dateOfBirth")).as("birth_date"),
        col("p.nationality").as("nationality"),
        nullif(col("p.position"), lit("")).as("position"))

  /** The reference's status_mapping dict (:119-128); unknown or absent
    * API statuses default to "scheduled". */
  private val StatusMapping = Seq(
    "SCHEDULED" -> "scheduled", "LIVE" -> "live", "IN_PLAY" -> "live",
    "PAUSED" -> "live", "FINISHED" -> "finished", "POSTPONED" -> "postponed",
    "CANCELLED" -> "cancelled", "SUSPENDED" -> "suspended")

  private def mapStatus(api: Column): Column =
    StatusMapping.foldLeft(when(lit(false), lit(""))) {
      case (acc, (k, v)) => acc.when(api === k, v)
    }.otherwise(lit("scheduled"))

  /** collect_matches (reference :117-155): one row per `matches[]`
    * element. `utc_datetime` is the parsed timestamp re-rendered as
    * "yyyy-MM-dd HH:mm:ss" UTC — a cross-engine-stable witness that the
    * Z → +00:00 rewrite and the ISO parse actually ran. `date_format`
    * renders in the SESSION time zone, so a UTC session is a hard
    * precondition (GraftSession pins it) — failing fast beats a
    * silently shifted "utc_datetime" on a Europe/Berlin session. */
  def collectMatches(responses: DataFrame, jsonCol: String = "body"): DataFrame = {
    val tz = responses.sparkSession.conf.get("spark.sql.session.timeZone")
    val isUtc =
      try java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)
        .normalized() == java.time.ZoneOffset.UTC
      catch { case _: Throwable => false }
    require(isUtc,
      s"collectMatches renders utc_datetime via date_format, which uses the session " +
        s"time zone (currently '$tz'); set spark.sql.session.timeZone=UTC " +
        "(GraftSession.builder does)")
    responses
      .select(from_json(col(jsonCol), MatchesSchema).as("r"))
      .select(col("r.competition.id").cast("string").as("competition"),
        col("r.filters.season").as("season"),
        explode(col("r.matches")).as("m"))
      .select(
        col("m.id").cast("string").as("match_id"),
        col("m.homeTeam.id").cast("string").as("home_team_id"),
        col("m.awayTeam.id").cast("string").as("away_team_id"),
        date_format(
          try_to_timestamp(regexp_replace(col("m.utcDate"), "Z$", "+00:00")),
          "yyyy-MM-dd HH:mm:ss").as("utc_datetime"),
        mapStatus(col("m.status")).as("status"),
        col("competition"),
        col("season"),
        col("m.venue.name").as("venue"),
        coalesce(col("m.matchday").cast("string"), col("m.round.name"))
          .as("round_label"))
  }
}
