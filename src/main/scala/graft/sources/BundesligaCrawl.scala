package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S14: Bundesliga clubs → squads → players staged crawl, engine side
  * (reference `bundesliga/bundesliga_club_scraper.py:269-442` drives the
  * fetch loop; `:444-560` club overview/detail parsing, `:1039-1094`
  * player-link extraction, `:1096-1180` player parsing).
  *
  * The reference walks the three stages with nested async for-loops —
  * one page at a time, state in Python dicts. Here each stage is a
  * DataFrame over a snapshot directory and the "crawl" is two joins:
  *
  *   clubs(detail pages) ⋈ squad_url  links(squad pages) ⋈ player_url  players(player pages)
  *
  * so a 1000-executor cluster parses every page of every stage in
  * parallel and the club→player association is an equi-join instead of
  * loop bookkeeping. Fetch stays outside the engine (SURVEY §3.2); the
  * hydration-JSON enrichment fallback (`_enrich_club_from_hydration`,
  * `_player_hydration_fallback`) is the same `__NEXT_DATA__` extraction
  * used by [[Bronze.extractNextData]].
  */
object BundesligaCrawl {

  /** `<th>label</th><td>v</td>` / `<dt>label</dt><dd>v</dd>` fact-table
    * lookup (reference `_find_labeled_value` + `_regex_fact_table_fallback`),
    * label alternatives ORed. */
  private def labeled(html: Column, labels: Seq[String]): Column = {
    val lab = labels.mkString("(?:", "|", ")")
    nullif(trim(regexp_replace(coalesce(
      nullif(regexp_extract(html,
        s"(?si)<(?:th|dt)[^>]*>\\s*$lab\\s*:?\\s*</(?:th|dt)>\\s*<(?:td|dd)[^>]*>(.*?)</(?:td|dd)>", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?si)<span[^>]*>\\s*$lab\\s*:?\\s*</span>\\s*<span[^>]*>(.*?)</span>", 1), lit(""))),
      "<[^>]*>", "")), lit(""))
  }

  /** Page title: `<h1>` text, else og:title meta, with the
    * "… - Spielerprofil - …" suffix stripped (reference
    * `_extract_player_basic_info`). */
  private def pageTitle(html: Column): Column = {
    val h1 = nullif(trim(regexp_replace(
      regexp_extract(html, "(?si)<h1[^>]*>(.*?)</h1>", 1), "<[^>]*>", "")), lit(""))
    val og = nullif(regexp_extract(html,
      "(?si)<meta[^>]+property=\"og:title\"[^>]+content=\"([^\"]*)\"", 1), lit(""))
    trim(regexp_replace(coalesce(h1, og),
      "(?i)[-–|]?\\s*\\b(spielerprofil|player profile)\\b.*$", ""))
  }

  /** Short/German position token → long form (reference `map_position` +
    * the GK→Goalkeeper normalization the scraper applies three times). */
  def positionLongForm(p: Column): Column = {
    val t = lower(trim(p))
    when(t.isNull, lit(null).cast("string"))
      .when(t.isin("gk", "torwart", "goalkeeper", "keeper"), "Goalkeeper")
      .when(t.isin("df", "abwehr", "verteidiger", "defender", "defence", "defense"), "Defender")
      .when(t.isin("mf", "mittelfeld", "midfielder", "midfield"), "Midfielder")
      .when(t.isin("fw", "sturm", "stürmer", "angriff", "forward", "striker"), "Forward")
      .otherwise(trim(p))
  }

  /** Stage 1 — club records from detail-page snapshots
    * (`_extract_club_data` + hydration enrichment). `pages` needs
    * (urlCol, htmlCol). */
  def clubsFromPages(pages: DataFrame, htmlCol: String = "html",
                     urlCol: String = "source_url"): DataFrame = {
    val html = col(htmlCol)
    val hydration = Bronze.extractNextData(html)
    def hyd(path: String): Column = get_json_object(hydration, path)
    pages.select(
      col(urlCol).as("source_url"),
      coalesce(pageTitle(html), hyd("$.props.pageProps.club.name")).as("name"),
      coalesce(labeled(html, Seq("Gegründet", "Founded")),
        hyd("$.props.pageProps.club.founded"))
        .try_cast("int").as("founded_year"),
      coalesce(labeled(html, Seq("Stadion", "Stadium")),
        hyd("$.props.pageProps.club.stadium.name")).as("stadium"),
      coalesce(labeled(html, Seq("Trainer", "Coach", "Cheftrainer")),
        hyd("$.props.pageProps.club.coach.name")).as("coach"),
      // squad link: first kader/squad href on the page (_find_squad_url)
      nullif(regexp_extract(html,
        "(?si)<a[^>]+href=\"([^\"]*(?:kader|squad)[^\"]*)\"", 1), lit(""))
        .as("squad_url"))
      .filter(col("name").isNotNull)
  }

  private val PositionTokens =
    "position|pos|gk|df|mf|fw|torwart|goalkeeper|abwehr|verteidiger|defender|" +
      "mittelfeld|midfielder|sturm|stürmer|forward|striker"

  /** Stage 2 — player links from squad-page snapshots
    * (`_extract_player_links`): anchors matching
    * `/de/bundesliga/spieler/<slug>` inside a `<tr>`/`<article>` whose
    * text carries a position token; link text must look like a full name
    * (≥ 2 words). One row per (squad_url, player_url), deduped. */
  def playerLinksFromSquadPages(pages: DataFrame, htmlCol: String = "html",
                                urlCol: String = "squad_url"): DataFrame = {
    val containers = expr(
      s"regexp_extract_all($htmlCol, '(?si)<(?:tr|article)[^>]*>.*?</(?:tr|article)>', 0)")
    pages
      .select(col(urlCol).as("squad_url"), explode(containers).as("__c"))
      .filter(lower(regexp_replace(col("__c"), "<[^>]*>", " "))
        .rlike(s"\\b(?:$PositionTokens)\\b"))
      .select(col("squad_url"), explode(expr(
        "regexp_extract_all(__c, '(?si)<a[^>]+href=\"[^\"]*/de/bundesliga/spieler/[a-z0-9\\\\-]+[^\"]*\"[^>]*>.*?</a>', 0)"))
        .as("__a"))
      .select(col("squad_url"),
        regexp_extract(col("__a"),
          "href=\"([^\"]*/de/bundesliga/spieler/[a-z0-9\\-]+[^\"]*)\"", 1).as("player_url"),
        trim(regexp_replace(regexp_extract(col("__a"), "(?si)>(.*)</a>$", 1),
          "<[^>]*>", "")).as("link_text"))
      .filter(size(split(col("link_text"), "\\s+")) >= 2)
      .distinct()
  }

  /** Stage 3 — player records from player-page snapshots
    * (`_parse_player_data` + `_player_hydration_fallback`): name from
    * h1/og:title (first space splits first/last), labeled position /
    * shirt number / nationality with hydration-JSON fallback, position
    * normalized to long form. Carries the S14 depth columns:
    * `season_stats` (struct, [[seasonStats]]) and `senior_career`
    * (array of per-season structs, [[careerStats]] — the
    * `player.senior_career` JSONB shape of `database/schema.sql:330`). */
  def playersFromPages(pages: DataFrame, htmlCol: String = "html",
                       urlCol: String = "player_url"): DataFrame = {
    val html = col(htmlCol)
    val hydration = Bronze.extractNextData(html)
    def hyd(path: String): Column = get_json_object(hydration, path)
    val title = pageTitle(html)
    val numText = coalesce(labeled(html, Seq("Rückennummer", "Number", "Trikotnummer")),
      hyd("$.props.pageProps.player.shirtNumber"))
    val num = nullif(regexp_extract(numText, "(\\d+)", 1), lit("")).try_cast("int")
    val nameParts = split(title, " ", 2)
    // The season-stat pipeline is staged across separate projections on
    // purpose: the tagged-pair arrays (regex extraction + the 21-pattern
    // classifier per pair) are EXPENSIVE and referenced by every stat
    // field — as one inline expression each of the 21 fields would carry
    // its own copy, and higher-order functions get no codegen CSE (the
    // first cut benched 4.5 s at sf0.1 for exactly this reason).
    // CollapseProject keeps expensive multiply-referenced aliases in
    // their own Project, so each stage evaluates once per row.
    // Codegen-size control (r11 verdict item 3): the 21-field season_stats
    // assembly — each field a regexp-extract/replace chain plus try_cast,
    // plus the presence-CASE guard re-testing all 21 — generates more
    // than Janino's 64 KB per-method limit as ONE projection, and Spark
    // then RETRIES THE WHOLE STAGE INTERPRETED (the r11 sweep's one
    // fallback, under q_career_stats): a silent throughput cliff at
    // scale. Fix: compute the typed per-field values as named columns in
    // TWO half-projections separated by [[graft.plans.CodegenBarrier]]s
    // (each half ≈ 11 regex chains compiles fine), then assemble the
    // struct + guard from cheap column refs. Values and semantics are
    // bit-identical to the single-projection form — same expressions,
    // same order, only the codegen unit boundaries move. The foldSlots
    // stages need no barrier: higher-order `aggregate` is
    // CodegenFallback, a natural codegen boundary already.
    val tagged = pages.select(
        col(urlCol).as("player_url"),
        get(nameParts, lit(0)).as("first_name"),
        coalesce(trim(get(nameParts, lit(1))), lit("")).as("last_name"),
        positionLongForm(coalesce(labeled(html, Seq("Position")),
          hyd("$.props.pageProps.player.position"))).as("position"),
        when(num.between(1, 99), num).as("shirt_number"),
        coalesce(labeled(html, Seq("Nationalität", "Nationality")),
          hyd("$.props.pageProps.player.nationality")).as("nationality"),
        seasonTagged(html, "\\bkey\\b", "\\bvalue\\b").as("__ss_rows"),
        seasonTagged(html, "label", "value").as("__ss_boxes"),
        careerStats(html).as("senior_career"))
      .withColumn("__ss_rowvals", foldSlots(col("__ss_rows"), lastWins = true))
      .withColumn("__ss_boxvals", foldSlots(col("__ss_boxes"), lastWins = false))
    val typedCols = SeasonStatMapping.zipWithIndex.map {
      case ((_, name, isFloat), i) =>
        val v = coalesce(get(col("__ss_rowvals"), lit(i)),
          get(col("__ss_boxvals"), lit(i)))
        (if (isFloat) statFloat(v) else statInt(v)).as(s"__sv_$name")
    }
    val (firstHalf, secondHalf) = typedCols.splitAt(SeasonStatMapping.length / 2)
    val svNames = SeasonStatMapping.map { case (_, name, _) => s"__sv_$name" }
    val withTyped = graft.plans.CodegenBarrier(
        graft.plans.CodegenBarrier(tagged.select(col("*") +: firstHalf: _*))
          .select(col("*") +: secondHalf: _*))
    val seasonStruct = when(
      svNames.map(c => col(c).isNotNull).reduce(_ || _),
      struct(SeasonStatMapping.map { case (_, name, _) =>
        col(s"__sv_$name").as(name) }: _*))
    withTyped
      .withColumn("season_stats", seasonStruct)
      .select("player_url", "first_name", "last_name", "position",
        "shirt_number", "nationality", "season_stats", "senior_career")
      .filter(col("first_name").isNotNull && col("first_name") =!= "")
  }

  // ---- S14 depth: season-stat grid + career table ------------------

  /** get_text(' ', strip=True) equivalent. */
  private def stripTags(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** (label-regex-lowercase, field, isFloat) in the REFERENCE'S mapping
    * order (`bundesliga_club_scraper.py:1474-1496`) — order IS
    * semantics: each key/value pair is claimed by the FIRST matching
    * pattern, mirroring the reference's break-on-first-match (so an
    * "Eigentore" key is claimed by 'tore|goals', exactly as there). */
  private val SeasonStatMapping: Seq[(String, String, Boolean)] = Seq(
    ("einsätze|appearances", "appearances", false),
    ("tore|goals", "goals", false),
    ("vorlagen|assists", "assists", false),
    ("gelbe karten|yellow", "yellow_cards", false),
    ("rote karten|red", "red_cards", false),
    ("gew\\.? zweikämpfe|duels won", "duels_won", false),
    ("gew\\.? kopfduelle|aerial duels won", "aerial_duels_won", false),
    ("sprints", "sprints", false),
    ("intensive läufe|intensive runs", "intensive_runs", false),
    ("laufdistanz", "distance_km", true),
    ("speed|km/h", "top_speed_kmh", true),
    ("flanken|crosses", "crosses", false),
    ("fouls|begangene fouls", "fouls_committed", false),
    ("ballbesitzphasen|possession phases", "possession_phases", false),
    ("shots on goal|shots on target|torschüsse|torschüsse aufs? tor", "shots_on_target", false),
    ("abgewehrte schüsse|paraden|saves", "saves", false),
    ("eigentore|own goals?", "own_goals", false),
    ("^elfmeter-tore|penalties scored", "penalties_scored", false),
    ("^elfmeter(?!-tore)|penalties$", "penalties_taken", false),
    ("minuten|minutes", "minutes_played", false),
    ("pfosten\\s*/\\s*latte|woodwork", "woodwork", false))

  /** Index of the first mapping pattern the (lower-cased) key matches,
    * −1 when none — the per-pair claim of the reference's inner loop. */
  private def seasonFieldIdx(keyLc: Column): Column = {
    val arms = SeasonStatMapping.zipWithIndex.map {
      case ((pat, _, _), i) => (keyLc.rlike(pat), lit(i))
    }
    arms.tail.foldLeft(when(arms.head._1, arms.head._2)) {
      case (acc, (c, v)) => acc.when(c, v)
    }.otherwise(lit(-1))
  }

  /** `int` parse of the reference: strip thousands dots, comma→dot, then
    * the first integer run. `try_cast`, not `cast`: under ANSI mode a
    * digit run beyond Int range would otherwise throw mid-query; a
    * malformed scraped stat must degrade to null, never kill the job. */
  private def statInt(v: Column): Column =
    nullif(regexp_extract(
      regexp_replace(regexp_replace(v, "\\.", ""), ",", "."),
      "-?\\d+", 0), lit("")).try_cast("int")

  /** `float` parse of the reference: first decimal run, comma→dot. */
  private def statFloat(v: Column): Column =
    translate(nullif(regexp_extract(v, "-?\\d+[.,]?\\d*", 0), lit("")),
      ",", ".").cast("double")

  /** Tagged (claimed-field, value-text) structs for every adjacent
    * key/value (or label/value) div pair on the page — the regex
    * stand-in for the reference's row-container walk; inside a grid row
    * or stat-box the two divs are adjacent. This is the expensive step
    * (pair regex over the page + the 21-pattern classifier per pair);
    * evaluate it ONCE per row behind its own projection. */
  private def seasonTagged(html: Column, keyCls: String, valCls: String): Column = {
    val pair = s"(?si)<div[^>]*class=\"[^\"]*$keyCls[^\"]*\"[^>]*>.*?</div>\\s*" +
      s"<div[^>]*class=\"[^\"]*$valCls[^\"]*\"[^>]*>.*?</div>"
    val keyRe = s"(?si)<div[^>]*class=\"[^\"]*$keyCls[^\"]*\"[^>]*>(.*?)</div>"
    val valRe = s"(?si)<div[^>]*class=\"[^\"]*$valCls[^\"]*\"[^>]*>(.*?)</div>"
    val base = transform(regexp_extract_all(html, lit(pair), lit(0)), p =>
      struct(
        seasonFieldIdx(lower(stripTags(regexp_extract(p, keyRe, 1)))).as("f"),
        stripTags(regexp_extract(p, valRe, 1)).as("v")))
    // Second pass adds the parse-success flag over the ALREADY-extracted
    // (f, v) struct (HOFs get no codegen CSE — referencing the regex
    // extractions again would re-run them): the reference commits a
    // field only when its typed parse succeeds, so the flag is the
    // field-type parse, not a has-a-digit heuristic.
    transform(base, s => struct(
      s.getField("f").as("f"),
      s.getField("v").as("v"),
      parseOk(s.getField("f"), s.getField("v")).as("ok")))
  }

  /** Would the typed parse of value `v` for field index `f` succeed?
    * Mirrors [[seasonStatsFromSlots]]'s per-field statInt/statFloat
    * choice — a value like a 12-digit run contains digits yet
    * try_casts to null, and the reference keeps the earlier value (or
    * lets the stat-box pass fill) in that case. */
  private def parseOk(f: Column, v: Column): Column = {
    val floatIdx = SeasonStatMapping.zipWithIndex.collect {
      case ((_, _, true), i) => i
    }
    val isFloat = floatIdx.map(i => f === lit(i))
      .foldLeft(lit(false))(_ || _)
    when(isFloat, statFloat(v).isNotNull).otherwise(statInt(v).isNotNull)
  }

  /** Fold tagged pairs into one value slot per mapping field.
    * `lastWins = true` is pass 1 (the reference overwrites on every
    * match); `false` is the stat-box pass (only fills empty slots). A
    * pair only claims its slot when its TYPED parse succeeded (the
    * `ok` flag [[seasonTagged]] precomputed — the reference sets a
    * field only on successful numeric parse). */
  private def foldSlots(tagged: Column, lastWins: Boolean): Column = {
    val init = array_repeat(lit(null).cast("string"), SeasonStatMapping.length)
    aggregate(tagged, init, (acc, s) => {
      val take = s.getField("f") >= 0 && s.getField("ok")
      transform(acc, (v, j) => {
        val hit = take && j === s.getField("f")
        if (lastWins) when(hit, s.getField("v")).otherwise(v)
        else when(hit && v.isNull, s.getField("v")).otherwise(v)
      })
    })
  }

  /** Assemble the season-stat struct from the two slot arrays (cheap
    * per-field lookups). Null struct when nothing matched, like the
    * reference's `return None`; grid slots take precedence, stat-box
    * slots fill the gaps. */
  private def seasonStatsFromSlots(rowVals: Column, boxVals: Column): Column = {
    val fields = SeasonStatMapping.zipWithIndex.map {
      case ((_, name, isFloat), i) =>
        val v = coalesce(get(rowVals, lit(i)), get(boxVals, lit(i)))
        (if (isFloat) statFloat(v) else statInt(v)).as(name)
    }
    when(fields.map(_.isNotNull).reduce(_ || _), struct(fields: _*))
  }

  /** Season-stat struct from a player page
    * (`_extract_player_season_stats_enhanced`): pass 1 reads the dynamic
    * key/value grid, LAST successful match wins per field (the reference
    * overwrites in pass 1); pass 2 reads `stat-box` label/value pairs
    * and only fills fields pass 1 missed. Single-column convenience form
    * — [[playersFromPages]] stages the same pieces across projections so
    * the expensive tagging runs once per row. */
  def seasonStats(html: Column): Column =
    seasonStatsFromSlots(
      foldSlots(seasonTagged(html, "\\bkey\\b", "\\bvalue\\b"), lastWins = true),
      foldSlots(seasonTagged(html, "label", "value"), lastWins = false))

  /** Career table from a player page (`_extract_player_career_stats`):
    * first `<table>` classed career|history|statistik, header row
    * dropped, rows with ≥ 3 cells kept; season/team/league from the
    * first three cells, appearances/goals/assists from cells 3–5 when
    * digit-only (the reference's `isdigit` guard). Returns the
    * `senior_career` array-of-structs shape. */
  def careerStats(html: Column): Column = {
    val tbl = regexp_extract(html,
      "(?si)<table[^>]*class=\"[^\"]*(?:career|history|statistik)[^\"]*\"[^>]*>(.*?)</table>", 1)
    val allRows = regexp_extract_all(tbl, lit("(?si)<tr[^>]*>(.*?)</tr>"), lit(1))
    val dataRows = when(size(allRows) > 1,
      slice(allRows, lit(2), size(allRows) - 1))
      .otherwise(array().cast("array<string>"))
    val cellArrays = transform(dataRows, r =>
      transform(regexp_extract_all(r, lit("(?si)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1)),
        c => stripTags(c)))
    // try_cast: an all-digit cell longer than Int range must yield null
    // under ANSI mode, not a query-killing cast error
    def digitInt(c: Column): Column = when(c.rlike("^\\d+$"), c.try_cast("int"))
    transform(filter(cellArrays, c => size(c) >= 3), c => struct(
      get(c, lit(0)).as("season"),
      get(c, lit(1)).as("team"),
      get(c, lit(2)).as("league"),
      digitInt(get(c, lit(3))).as("appearances"),
      digitInt(get(c, lit(4))).as("goals"),
      digitInt(get(c, lit(5))).as("assists")))
  }

  // ---- S15 matchday scraper ----------------------------------------

  /** Match-report links on a matchday overview page
    * (`bundesliga_matchday_scraper.py:177-187`): hrefs matching
    * `/(en|de)/bundesliga/matchday/<season>/<md>/<slug>`, query strings
    * stripped, deduped and sorted. */
  def matchLinksFromOverview(pages: DataFrame, season: String, matchday: Int,
                             htmlCol: String = "html"): DataFrame = {
    val seasonRe = java.util.regex.Pattern.quote(season)
    pages
      .select(col("snapshot_path"), explode(expr(
        s"""regexp_extract_all($htmlCol, '(?i)href="([^"]*)"', 1)""")).as("__href"))
      .select(col("snapshot_path"),
        regexp_extract(col("__href"), "^([^?]*)", 1).as("match_url"))
      .filter(col("match_url")
        .rlike(s"(?i)/(en|de)/bundesliga/matchday/$seasonRe/$matchday/[a-z0-9\\-]+"))
      .distinct()
      .orderBy("match_url")
  }

  /** S15 match-report page → typed match record
    * (`bundesliga_matchday_scraper.py:188-268`): ld+json `SportsEvent`
    * object for teams / scores / kickoff / stadium / referee, with the
    * reference's fallbacks — `<title>` "A vs B" for teams, first
    * "d - d" text for the score, labeled fact values for stadium and
    * referee, officiatingCrew role scan. */
  def matchdayFromPages(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val html = col(htmlCol)
    val ldBlocks = expr(
      s"""regexp_extract_all($htmlCol, '(?si)<script[^>]+type="application/ld\\\\+json"[^>]*>(.*?)</script>', 1)""")
    // the reference picks the FIRST object typed as a sports event
    val ev = get(filter(ldBlocks, b =>
      lower(get_json_object(b, "$['@type']"))
        .isin("sportsevent", "soccer", "soccerseasongame", "event")), lit(0))
    def j(path: String): Column = get_json_object(ev, path)
    val titleTxt = regexp_extract(html, "(?si)<title[^>]*>(.*?)</title>", 1)
    val home = coalesce(j("$.homeTeam.name"), j("$.competitor[0].name"),
      nullif(trim(regexp_extract(titleTxt, "(?i)^(.*?)\\s+vs\\s+", 1)), lit("")))
    val away = coalesce(j("$.awayTeam.name"), j("$.competitor[1].name"),
      nullif(trim(regexp_extract(titleTxt, "(?i)\\s+vs\\s+(\\S+(?:\\s+\\S+)*?)\\s*(?:[-|–].*)?$", 1)), lit("")))
    val bodyText = regexp_replace(regexp_replace(html, "<[^>]*>", " "), "\\s+", " ")
    val scoreH = coalesce(j("$.homeScore"),
      nullif(regexp_extract(bodyText, "(\\d{1,2})\\s*[-:–]\\s*(\\d{1,2})", 1), lit("")))
    val scoreA = coalesce(j("$.awayScore"),
      nullif(regexp_extract(bodyText, "(\\d{1,2})\\s*[-:–]\\s*(\\d{1,2})", 2), lit("")))
    // officiatingCrew scan: first element whose role metadata names a
    // referee. Bound 8 covers a full modern crew (referee, 2 assistants,
    // fourth official, VAR, AVAR + spares) — the previous bound of 4
    // missed a referee listed after the assistants.
    val crewRef = (0 until 8).map { i =>
      when(lower(concat_ws(" ",
        coalesce(j(s"$$.officiatingCrew[$i].roleName"), lit("")),
        coalesce(j(s"$$.officiatingCrew[$i].jobTitle"), lit("")),
        coalesce(j(s"$$.officiatingCrew[$i].description"), lit(""))))
        .rlike("referee|schiedsrichter"), j(s"$$.officiatingCrew[$i].name"))
    }.reduce(coalesce(_, _))
    val refLabeled = nullif(trim(regexp_extract(bodyText,
      "(?i)(?:Referee|Schiedsrichter)\\s*[:\\-–—]?\\s*([A-Za-zÄÖÜäöüß'\\-\\.]+(?:\\s+[A-Za-zÄÖÜäöüß'\\-\\.]+){0,4})", 1)), lit(""))
    pages.select(
        col("snapshot_path"),
        home.as("home_team"),
        away.as("away_team"),
        when(scoreH.rlike("^\\d{1,2}$"), scoreH.cast("int")).as("home_score"),
        when(scoreA.rlike("^\\d{1,2}$"), scoreA.cast("int")).as("away_score"),
        j("$.startDate").as("kickoff_utc"),
        coalesce(j("$.location.name"), j("$.location.address.name"),
          labeled(html, Seq("Stadium", "Stadion", "Venue", "Spielort"))).as("stadium"),
        coalesce(j("$.referee.name"), crewRef, refLabeled).as("referee"),
        lit("bundesliga").as("source"))
      .filter(col("home_team").isNotNull && col("away_team").isNotNull)
  }

  /** The staged-crawl join: one row per (club, player), the frame the
    * reference assembles as `players_by_club`. Clubs without a resolvable
    * squad or players drop out (inner joins — same as the reference's
    * try/except-skip). */
  def crawl(clubDetailPages: DataFrame, squadPages: DataFrame,
            playerPages: DataFrame): DataFrame = {
    val clubs = clubsFromPages(clubDetailPages)
    val links = playerLinksFromSquadPages(squadPages)
    val players = playersFromPages(playerPages)
    clubs.join(links, "squad_url")
      .join(players, "player_url")
      .select(col("name").as("club_name"), col("founded_year"), col("stadium"),
        col("coach"), col("player_url"), col("first_name"), col("last_name"),
        col("position"), col("shirt_number"), col("nationality"))
  }
}
