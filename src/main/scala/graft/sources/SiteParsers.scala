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
        Parsing.parseInt(cell(0)).try_cast("int").as("number"),
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
        Parsing.parseInt(cell(4)).try_cast("int").as("missed_games"))
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

  // ---- S9 Transfermarkt transfers page ------------------------------

  private val Positions = Seq("GK", "DF", "MF", "FW", "CB", "RB", "LB",
    "CM", "CAM", "CDM", "RW", "LW")

  /** First element of `arr` satisfying `pred`, or null (mirrors the
    * reference's `next((c for c in cells if ...), None)`). */
  private def firstWhere(arr: Column, pred: Column => Column): Column =
    get(filter(arr, pred), lit(0))

  private def stripTags(c: Column): Column =
    trim(regexp_replace(c, "<[^>]*>", ""))

  /** S9 Transfermarkt transfers page → typed in/out transfer rows
    * (transfermarkt_transfers_scraper.py:16-144). Tables with class
    * `items`; direction from the preceding h2/h3 heading
    * (Zugänge/arrivals vs Abgänge/departures) falling back to the
    * header-cell language (von/from vs zu/to); per-row field discovery is
    * predicate-based over raw cells exactly like the reference: first
    * linked cell → player, whitelist text → position, bare 16..49 int →
    * age, €-cell → market value, fee-keyword cell → transfer fee (F8),
    * /verein/-link cell → club, dd.MM.yyyy cell → date. */
  def transfersFromPages(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    // Split so each segment starts at an items-table; the heading that
    // classifies table direction sits at the tail of the PREVIOUS segment.
    // NB: a zero-width lookahead match at position 0 yields NO leading
    // empty segment (Java 8 split semantics), so segments are filtered by
    // their own prefix rather than sliced by index.
    val segs = split(col(htmlCol), "(?i)(?=<table[^>]*class=\"[^\"]*items)")
    val withSeg = pages
      .withColumn("__segs", segs)
      .select(col("snapshot_path"),
        posexplode(col("__segs")).as(Seq("__i", "__cur")),
        col("__segs"))
      .filter(col("__cur").rlike("(?i)^<table[^>]*class=\"[^\"]*items"))
      .withColumn("__prev",
        when(col("__i") > 0, element_at(col("__segs"), col("__i")))
          .otherwise(lit("")))
      .drop("__segs")
    val table = regexp_extract(col("__cur"), "(?si)^(<table.*?</table>)", 1)
    val heading = lower(regexp_extract(col("__prev"),
      "(?si).*<h[23][^>]*>(.*?)</h[23]>", 1))
    val ths = lower(concat_ws(" ",
      regexp_extract_all(table, lit("(?si)<th[^>]*>(.*?)</th>"), lit(1))))
    val direction =
      when(heading.rlike("zug[äa]ng|arrival"), "in")
        .when(heading.rlike("abg[äa]ng|departure"), "out")
        .when(ths.rlike("\\bvon\\b|\\bfrom\\b"), "in")
        .when(ths.rlike("\\bzu\\b|\\bto\\b"), "out")
    val rowsRaw = expr(
      "slice(" +
        s"regexp_extract_all(regexp_extract(__cur, '(?si)^(<table.*?</table>)', 1), " +
        "'(?si)<tr[^>]*>.*?</tr>', 0), 2, 100000)") // skip header row

    val exploded = withSeg
      .withColumn("direction", direction)
      .filter(col("direction").isNotNull)
      .select(col("snapshot_path"), col("direction"),
        explode(rowsRaw).as("__row"))
      .withColumn("__cells",
        expr("regexp_extract_all(__row, '(?si)<td[^>]*>.*?</td>', 0)"))
      .filter(size(col("__cells")) >= 4)

    val cells = col("__cells")
    val playerCell = when(get(cells, lit(0)).rlike("(?i)<a"), get(cells, lit(0)))
      .otherwise(get(cells, lit(1)))
    val clubCell = firstWhere(cells,
      c => c.rlike("(?i)<a[^>]+href=\"[^\"]*/verein/"))
    val posList = Positions.map(lit(_))
    exploded.select(
        col("snapshot_path"), col("direction"),
        stripTags(regexp_extract(playerCell, "(?si)<a[^>]*>(.*?)</a>", 1))
          .as("player_name"),
        nullif(regexp_extract(playerCell, "(?si)<a[^>]+href=\"([^\"]*)\"", 1), lit(""))
          .as("player_url"),
        stripTags(firstWhere(cells, c => stripTags(c).isin(posList: _*)))
          .as("position"),
        firstWhere(transform(cells, stripTags(_)),
          t => t.rlike("^\\d{1,2}$") && t.cast("int") > 15 && t.cast("int") < 50)
          .cast("int").as("age"),
        // reference predicates run on cell *text* (get_text), not raw html
        Parsing.parseMarketValue(
          firstWhere(transform(cells, stripTags(_)), t => t.contains("€")))
          .as("market_value"),
        Parsing.parseTransferFee(
          firstWhere(transform(cells, stripTags(_)),
            t => lower(t).rlike("fee|ablöse|free|loan") || t.contains("€")))
          .as("transfer_fee"),
        stripTags(regexp_extract(clubCell,
          "(?si)<a[^>]+href=\"[^\"]*/verein/[^\"]*\"[^>]*>(.*?)</a>", 1))
          .as("club_name"),
        nullif(regexp_extract(clubCell,
          "(?si)<a[^>]+href=\"([^\"]*/verein/[^\"]*)\"", 1), lit(""))
          .as("club_url"),
        // try_to_date: a regex-shaped but invalid date ("31.02.2024")
        // must yield null under ANSI mode, not kill the query
        try_to_date(nullif(regexp_extract(
          firstWhere(cells, c => c.rlike("\\d{2}\\.\\d{2}\\.\\d{4}")),
          "(\\d{2}\\.\\d{2}\\.\\d{4})", 1), lit("")), "dd.MM.yyyy")
          .as("transfer_date"))
      .filter(col("player_name").isNotNull && col("player_name") =!= "")
  }

  // ---- S4/S6 FBref league schedule & season fixtures ----------------

  /** S4/S6 FBref "Scores & Fixtures" parser (fbref_season_scraper.py:
    * 17-114, fbref_scraper league-schedule path): tables whose id matches
    * `fixture|scores`; per body row the `/en/matches/<id>/` report link
    * keys the match, the ISO date and `h-a` score cells are
    * pattern-sniffed, and the first two `/en/squads/` links give
    * home/away team names — positional like the reference, not
    * column-indexed, so layout changes don't break it. */
  def fbrefFixturesFromPages(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val tables = expr(
      s"regexp_extract_all($htmlCol, '(?si)<table[^>]*\\\\bid=\"[^\"]*(?:fixture|scores)[^\"]*\"[^>]*>.*?</table>', 0)")
    val rows = expr(
      "regexp_extract_all(regexp_extract(__tbl, '(?si)<tbody[^>]*>(.*?)</tbody>', 1), " +
        "'(?si)<tr[^>]*>.*?</tr>', 0)")
    val row = col("__row")
    val cellTexts = transform(
      expr("regexp_extract_all(__row, '(?si)<t[dh][^>]*>.*?</t[dh]>', 0)"),
      c => stripTags(c))
    val squadNames = expr(
      "regexp_extract_all(__row, '(?si)<a[^>]+href=\"[^\"]*/en/squads/[^\"]*\"[^>]*>(.*?)</a>', 1)")
    pages
      .select(col("snapshot_path"), explode(tables).as("__tbl"))
      .select(col("snapshot_path"), explode(rows).as("__row"))
      .select(
        col("snapshot_path"),
        nullif(regexp_extract(row, "href=\"([^\"]*/en/matches/[^/\"]+/[^\"]*)\"", 1), lit(""))
          .as("match_url"),
        nullif(regexp_extract(row, "/en/matches/([^/\"]+)/", 1), lit(""))
          .as("match_id"),
        try_to_date(firstWhere(cellTexts, t => t.rlike("^\\d{4}-\\d{2}-\\d{2}$")))
          .as("match_date"),
        Parsing.parseScore(firstWhere(cellTexts, t => t.rlike("^\\d+-\\d+$")))
          .as("score"),
        stripTags(get(squadNames, lit(0))).as("home_team"),
        stripTags(get(squadNames, lit(1))).as("away_team"))
      .filter(col("match_url").isNotNull)
  }

  // ---- S12 Bet365 / bwin bookmaker odds -----------------------------

  /** Selector config for a bookmaker's odds page — the reference's
    * per-bookmaker dict (bet365_scraper.py:123-141). `teamsJoined` =
    * teams in one element split on " - " (bwin) vs two elements
    * (bet365). */
  final case class BookmakerSelectors(name: String, rowClass: String,
                                      teamsClass: String, oddsClass: String,
                                      teamsJoined: Boolean)

  val Bet365: BookmakerSelectors = BookmakerSelectors("bet365",
    "gl-Market_General", "gl-ParticipantFixtureDetails_TeamNames",
    "gl-ParticipantOddsOnly_Odds", teamsJoined = false)
  val Bwin: BookmakerSelectors = BookmakerSelectors("bwin",
    "grid-event-wrapper", "participants", "option-value", teamsJoined = true)

  /** S12 bookmaker odds page → (bookmaker, home_team, away_team,
    * odds_home/draw/away) (bet365_scraper.py:119-270). Match rows split
    * on the row-class marker; team/odds values pulled by element class;
    * odds accepted only in plain decimal form (the reference's
    * `isdigit()` guard → None otherwise). */
  def bookmakerOddsFromPages(pages: DataFrame, sel: BookmakerSelectors,
                             htmlCol: String = "html"): DataFrame = {
    val segs = split(col(htmlCol), s"(?i)(?=<[a-z][^>]*class=\"[^\"]*${sel.rowClass})")
    val classVals = (cls: String) => expr(
      s"""regexp_extract_all(__row, '(?si)class="[^"]*$cls[^"]*"[^>]*>([^<]*)<', 1)""")
    val teams = classVals(sel.teamsClass)
    val odds = transform(classVals(sel.oddsClass), v => trim(v))
    val oddsNum = (i: Int) =>
      when(get(odds, lit(i)).rlike("^\\d+(\\.\\d+)?$"), get(odds, lit(i)).cast("double"))
    val (home, away) =
      if (sel.teamsJoined) {
        val parts = split(trim(get(teams, lit(0))), "\\s+-\\s+")
        (get(parts, lit(0)), get(parts, lit(1)))
      } else (trim(get(teams, lit(0))), trim(get(teams, lit(1))))
    pages
      .withColumn("__segs", segs)
      // filter by prefix, not by index: a marker at position 0 produces no
      // leading empty segment (Java 8 split semantics)
      .select(col("snapshot_path"),
        explode(filter(col("__segs"),
          s => s.rlike(s"(?i)^<[a-z][^>]*class=\"[^\"]*${sel.rowClass}"))).as("__row"))
      .select(
        col("snapshot_path"),
        lit(sel.name).as("bookmaker"),
        home.as("home_team"),
        away.as("away_team"),
        oddsNum(0).as("odds_home"),
        oddsNum(1).as("odds_draw"),
        oddsNum(2).as("odds_away"))
      .filter(col("home_team").isNotNull && col("away_team").isNotNull)
  }

  // ---- S11 Transfermarkt market-value / agent page ------------------

  /** S11 player profile page → (agent_name, valuation_date, value_eur,
    * currency) (transfermarkt_market_scraper.py:33-89). Agent from the
    * first `/beraterfirma/` link; current market value from the
    * "… Mio./Tsd. € Letzte Änderung: dd.MM.yyyy" text (German number
    * format: dots are thousands separators, comma is the decimal).
    * Unlike the reference, a value without a date keeps a null date
    * rather than stamping wall-clock now (nondeterministic). */
  def marketValueFromPages(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val html = col(htmlCol)
    val text = regexp_replace(regexp_replace(html, "<[^>]*>", " "), "\\s+", " ")
    val valText = regexp_extract(text,
      "([0-9.,]+)\\s*(Mio\\.|Tsd\\.)?\\s*€\\s*Letzte Änderung:", 1)
    val scale = regexp_extract(text,
      "[0-9.,]+\\s*(Mio\\.|Tsd\\.)?\\s*€\\s*Letzte Änderung:", 1)
    // try_cast: a malformed value text ("12,5,3" → "12.5.3") must yield
    // null under ANSI mode, not a query-killing cast error
    val raw = nullif(regexp_replace(regexp_replace(valText, "\\.", ""), ",", "."), lit(""))
      .try_cast("double")
    val valueEur = raw * when(scale === "Mio.", 1e6)
      .when(scale === "Tsd.", 1e3).otherwise(1.0)
    pages.select(
      col("snapshot_path"),
      nullif(stripTags(regexp_extract(html,
        "(?si)<a[^>]+href=\"[^\"]*/beraterfirma/[^\"]*\"[^>]*>(.*?)</a>", 1)), lit(""))
        .as("agent_name"),
      try_to_date(nullif(regexp_extract(text,
        "Letzte Änderung:\\s*(\\d{2}\\.\\d{2}\\.\\d{4})", 1), lit("")), "dd.MM.yyyy")
        .as("valuation_date"),
      valueEur.as("value_eur"),
      when(valueEur.isNotNull, "EUR").as("currency"))
  }
}
