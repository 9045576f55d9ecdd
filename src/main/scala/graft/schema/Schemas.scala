package graft.schema

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Canonical StructType registry (SURVEY.md §1): ONE schema source of
  * truth, resolving the reference's three-way drift (DDL vs SQLAlchemy vs
  * pydantic — SURVEY §1.3) in favor of `database/schema.sql`. Core tables
  * only; JSONB columns stay JSON strings (lazily parsed, §7.4 #3), enums
  * are StringType + domain constants for the Validate stage.
  */
object Schemas {

  /** Enum domains (database/schema.sql:25-67). */
  object Enums {
    val Sport = Seq("football", "basketball", "american_football")
    val MatchStatus = Seq("scheduled", "live", "finished", "postponed", "cancelled")
    val PriceType = Seq("open", "close", "live")
    val OddType = Seq("1x2", "asian_handicap", "over_under")
    val InjuryStatus = Seq("injured", "doubtful", "suspended", "recovered")
    val AbsenceType = Seq("injury", "illness", "suspension", "national_duty")
    val TransferFeeType = Seq("free", "loan", "transfer_fee", "unknown")
  }

  /** player (schema.sql:310-350). */
  val player: StructType = StructType(Seq(
    StructField("player_id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("date_of_birth", DateType),
    StructField("nationality", StringType),
    StructField("position", StringType),
    StructField("height_cm", IntegerType),
    StructField("weight_kg", IntegerType),
    StructField("market_value", DecimalType(14, 2)),
    StructField("career_stats", StringType)))   // JSONB → JSON string

  /** team (schema.sql club/team family). */
  val team: StructType = StructType(Seq(
    StructField("team_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("country", StringType),
    StructField("league", StringType)))

  /** match (schema.sql:598-630). */
  val matches: StructType = StructType(Seq(
    StructField("match_id", LongType, nullable = false),
    StructField("season_id", LongType),
    StructField("matchday", IntegerType),
    StructField("home_team_id", LongType),
    StructField("away_team_id", LongType),
    StructField("match_date_time", TimestampType),
    StructField("status", StringType),
    StructField("sport_specific_data", StringType)))

  /** match_result (schema.sql:632-651). */
  val matchResult: StructType = StructType(Seq(
    StructField("match_id", LongType, nullable = false),
    StructField("home_score", IntegerType),
    StructField("away_score", IntegerType)))

  /** season_player_stats (schema.sql:949-966). */
  val seasonPlayerStats: StructType = StructType(Seq(
    StructField("player_id", LongType, nullable = false),
    StructField("team_id", LongType),
    StructField("competition_id", LongType),
    StructField("season", StringType),
    StructField("matches_played", IntegerType),
    StructField("minutes_played", IntegerType),
    StructField("goals", IntegerType),
    StructField("assists", IntegerType),
    StructField("stats_data", StringType)))

  /** match_odd (schema.sql:729-745). */
  val matchOdd: StructType = StructType(Seq(
    StructField("match_id", LongType, nullable = false),
    StructField("provider", StringType),
    StructField("market", StringType),
    StructField("price_type", StringType),
    StructField("odds_home", DecimalType(10, 4)),
    StructField("odds_draw", DecimalType(10, 4)),
    StructField("odds_away", DecimalType(10, 4)),
    StructField("odd_timestamp", TimestampType)))

  /** player_market_value (schema.sql:986-997). */
  val playerMarketValue: StructType = StructType(Seq(
    StructField("player_id", LongType, nullable = false),
    StructField("valuation_date", DateType, nullable = false),
    StructField("value_eur", DecimalType(14, 2))))

  /** club_name_history — SCD2 (schema.sql:182-191); is_current derived. */
  val clubNameHistory: StructType = StructType(Seq(
    StructField("club_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("valid_from", DateType),
    StructField("valid_to", DateType)))

  /** scraped_data bronze capture (src/domain/utils.py:24-41). */
  val scrapedData: StructType = StructType(Seq(
    StructField("scraper_name", StringType),
    StructField("data", StringType),
    StructField("created_at", TimestampType)))

  val all: Map[String, StructType] = Map(
    "player" -> player, "team" -> team, "match" -> matches,
    "match_result" -> matchResult, "season_player_stats" -> seasonPlayerStats,
    "match_odd" -> matchOdd, "player_market_value" -> playerMarketValue,
    "club_name_history" -> clubNameHistory, "scraped_data" -> scrapedData)

  def emptyFrame(spark: SparkSession, name: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], all(name))

  def frame(spark: SparkSession, name: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), all(name))
}
