package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parsing

/** Concrete per-site field mappings (SURVEY.md §2.1 S8/S10/S13): the
  * reference's BeautifulSoup row parsers re-expressed as pure column
  * mappings over [[Bronze.extractTableRows]] cell arrays — the whole
  * page→typed-record path stays expression-only (codegen, no UDFs, one
  * input split per snapshot file at scale).
  */
object SiteParsers {

  private def cell(i: Int): Column = col("cells").getItem(i)

  /** S8 Transfermarkt squad table (reference
    * transfermarkt_squad_scraper.py:53-137; FIXTURES.md §5). Expected cell
    * layout: number | name | position | birth_date (dd.MM.yyyy) |
    * nationality | market_value. Header rows are dropped by the
    * number-parse guard. */
  def squadFromPages(pages: DataFrame): DataFrame =
    Bronze.tableRows(pages)
      .filter(size(col("cells")) >= 6)
      .select(
        col("snapshot_path"),
        Parsing.parseInt(cell(0)).cast("int").as("number"),
        Parsing.cleanText(cell(1)).as("name"),
        Parsing.cleanText(cell(2)).as("position"),
        Parsing.parseDateMulti(cell(3)).as("birth_date"),
        Parsing.cleanText(cell(4)).as("nationality"),
        Parsing.parseMarketValue(cell(5)).as("market_value"),
        cell(5).as("market_value_text"))
      .filter(col("number").isNotNull || col("market_value").isNotNull)

  /** S10 Transfermarkt injuries table (transfermarkt_injuries_scraper.py:
    * 76-151): player | reason | start | end | missed_games, with absence
    * typing (F28). */
  def injuriesFromPages(pages: DataFrame): DataFrame =
    Bronze.tableRows(pages)
      .filter(size(col("cells")) >= 5)
      .select(
        col("snapshot_path"),
        Parsing.cleanText(cell(0)).as("player_name"),
        Parsing.cleanText(cell(1)).as("reason"),
        Parsing.parseDateMulti(cell(2)).as("start_date"),
        Parsing.parseDateMulti(cell(3)).as("end_or_expected"),
        Parsing.parseInt(cell(4)).cast("int").as("missed_games"))
      .withColumn("absence_type",
        when(lower(col("reason")).rlike("suspen|sperre"), "suspension")
          .when(lower(col("reason")).rlike("ill|krank"), "illness")
          .when(lower(col("reason")).rlike("national|country"), "national_duty")
          .otherwise("injury"))
      .filter(col("player_name").isNotNull && col("start_date").isNotNull)

  /** S13 BetExplorer odds table (betexplorer_odds_scraper.py:16-96):
    * bookmaker | home | draw | away, any odds format (F9), with implied
    * probabilities (F10) and market label. */
  def odds1x2FromPages(pages: DataFrame, market: String = "1x2"): DataFrame =
    Bronze.tableRows(pages)
      .filter(size(col("cells")) >= 4)
      .select(
        col("snapshot_path"),
        lit(market).as("market_type"),
        Parsing.cleanText(cell(0)).as("bookmaker"),
        Parsing.toDecimalOdds(cell(1)).as("odds_home"),
        Parsing.toDecimalOdds(cell(2)).as("odds_draw"),
        Parsing.toDecimalOdds(cell(3)).as("odds_away"))
      // the reference's validator floor (models.py price >= 1.01) also
      // rejects header rows whose cells parse as bare column numbers
      .filter(col("odds_home") >= 1.01 && col("odds_away") >= 1.01)
      .withColumn("implied_home", Parsing.impliedProb(col("odds_home")))
      .withColumn("implied_draw", Parsing.impliedProb(col("odds_draw")))
      .withColumn("implied_away", Parsing.impliedProb(col("odds_away")))
      .withColumn("overround",
        coalesce(col("implied_home"), lit(0.0)) +
          coalesce(col("implied_draw"), lit(0.0)) +
          coalesce(col("implied_away"), lit(0.0)))
}
