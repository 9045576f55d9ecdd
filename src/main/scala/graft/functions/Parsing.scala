package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The reference's parsing/normalization expression library (SURVEY.md §2.9
  * F1–F16, F20–F31) as native Column functions — codegen-friendly, no UDFs.
  *
  * Semantics mirror the cited reference functions (file:line into
  * /root/reference/) but are implemented from the Spark function set.
  */
object Parsing {

  /** F1 `clean_text` (src/common/parsing.py:17-21): collapse whitespace,
    * trim, empty→null. */
  def cleanText(s: Column): Column =
    nullif(trim(regexp_replace(s, "\\s+", " ")), lit(""))

  /** F2 `parse_int` (parsing.py:24-28): strip thousands dots, first
    * signed integer run; null when absent. */
  def parseInt(s: Column): Column =
    // try_cast: a scraped digit run beyond Long range must degrade to
    // null under ANSI mode, never throw mid-query
    nullif(regexp_extract(translate(s, ".", ""), "(-?\\d+)", 1), lit("")).try_cast("long")

  /** F3 `parse_decimal` (parsing.py:31-36): comma decimals → dot, first
    * decimal number; null when absent. */
  def parseDecimal(s: Column): Column =
    nullif(regexp_extract(translate(s, ",", "."), "(-?\\d+(?:\\.\\d+)?)", 1), lit(""))
      .cast("double")

  /** F4 multi-format date parse (parsing.py:8-14,39-48): first format that
    * parses wins; ANSI-safe via try_to_timestamp. */
  val DateFormats: Seq[String] =
    Seq("dd.MM.yyyy", "yyyy-MM-dd", "dd/MM/yyyy", "MMM d yyyy", "d MMM yyyy")
  def parseDateMulti(s: Column): Column =
    coalesce(DateFormats.map(f => try_to_timestamp(s, lit(f)).cast(DateType)): _*)

  /** F5 `_to_number` (fbref_match_scraper.py:173-194): "—"/"-"→null,
    * stoppage "90+2"→92, "55%"→55.0, comma decimals. */
  /** ANSI-safe numeric cast: null (not an error) on malformed input. */
  private def numOrNull(c: Column): Column = {
    val t = translate(c, ",", ".")
    when(t.rlike("^-?\\d+(\\.\\d+)?$"), t.cast("double"))
  }

  /** The ONE engine-side `_to_number` (previously duplicated in
    * FbrefStats with drifted semantics — the two had already diverged on
    * multi-term stoppage time). Reference-exact shape:
    * "90+2+1" → 93 (ANY number of +-terms, all-digits),
    * "+5%"/"−5%" → signed percent, comma decimals, ""/"—"/"-" → null. */
  def toNumber(s: Column): Column = {
    val t = trim(s)
    val dotted = regexp_replace(t, ",", ".")
    val numRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)$"
    val pctBody = regexp_replace(dotted, "%$", "")
    when(t.isNull || t.isin("", "—", "-"), lit(null).cast("double"))
      // stoppage time "90+2" / "90+2+1" → sum (reference: all parts digits)
      .when(t.rlike("^\\d+(\\+\\d+)+$"),
        aggregate(split(t, "\\+"), lit(0.0), (acc, x) => acc + x.cast("double")))
      .when(t.rlike("%$"),
        when(pctBody.rlike(numRe), pctBody.cast("double")))
      .when(dotted.rlike(numRe), dotted.cast("double"))
      .otherwise(lit(null).cast("double"))
  }

  /** F6 `_parse_minute` (fbref_match_scraper.py:486-497): "45'+2" → 47. */
  def parseMinute(s: Column): Column = {
    val base = regexp_extract(s, "^(\\d+)", 1)
    val extra = regexp_extract(s, "\\+(\\d+)", 1)
    when(base =!= "",
      base.try_cast("long") + coalesce(nullif(extra, lit("")).try_cast("long"), lit(0L)))
  }

  /** F7 canonical market-value parser (transfermarkt_squad_scraper.py:
    * 151-175 + 3 variants): "€50.00m"→5.0e7, "500k"/"Th."/"Tsd."→*1e3,
    * "Mio."→*1e6, "Mrd."→*1e9. Null for "-"/unparseable. */
  def parseMarketValue(s: Column): Column = {
    val t = lower(trim(s))
    val num = nullif(regexp_extract(translate(t, ",", "."), "(\\d+(?:\\.\\d+)?)", 1), lit(""))
      .cast("double")
    val mult =
      when(t.rlike("mrd"), 1e9)
        .when(t.rlike("(mio|m\\b|m$)"), 1e6)
        .when(t.rlike("(tsd|th\\.|k\\b|k$)"), 1e3)
        .otherwise(1.0)
    when(t.isin("-", "—", ""), lit(null).cast("double")).otherwise(num * mult)
  }

  /** F8 transfer-fee typing (transfermarkt_transfers_scraper.py:167-186):
    * struct(fee_type, amount, raw). */
  def parseTransferFee(s: Column): Column = {
    val t = lower(trim(s))
    val feeType =
      when(t.rlike("free|ablösefrei"), "free")
        .when(t.rlike("loan|leihe"), "loan")
        .when(t.rlike("\\d"), "transfer_fee")
        .otherwise("unknown")
    struct(
      feeType.as("fee_type"),
      when(feeType === "transfer_fee", parseMarketValue(s)).as("amount"),
      s.as("raw_text"))
  }

  /** F9 odds conversion (betexplorer_odds_scraper.py:98-123): fractional
    * "3/2"→2.5, American "+150"→2.5 / "-110"→1.909…, decimal passthrough. */
  def toDecimalOdds(s: Column): Column = {
    val t = trim(s)
    val frac = t.rlike("^\\d+/\\d+$")
    val amer = t.rlike("^[+-]\\d+$")
    when(frac,
      lit(1.0) + split(t, "/").getItem(0).cast("double") / split(t, "/").getItem(1).cast("double"))
      .when(amer && t.startsWith("+"), lit(1.0) + regexp_extract(t, "(\\d+)", 1).cast("double") / 100.0)
      .when(amer, lit(1.0) + lit(100.0) / regexp_extract(t, "(\\d+)", 1).cast("double"))
      .otherwise(numOrNull(t))  // null (not an ANSI error) on non-odds text
  }

  /** F10 implied probability (src/domain/models.py:519-532). */
  def impliedProb(price: Column): Column =
    when(price >= 1.01, lit(1.0) / price)

  /** F11 score parse (src/common/scraper_utils.py:28-45): "2-1"/"2:1" →
    * struct(home_score, away_score); null for non-scores. */
  def parseScore(s: Column): Column = {
    val norm = translate(trim(s), ":", "-")
    val h = nullif(regexp_extract(norm, "^(\\d+)\\s*-\\s*(\\d+)$", 1), lit("")).try_cast("int")
    val a = nullif(regexp_extract(norm, "^(\\d+)\\s*-\\s*(\\d+)$", 2), lit("")).try_cast("int")
    when(h.isNotNull && a.isNotNull, struct(h.as("home_score"), a.as("away_score")))
  }

  /** F12 match-status classification (scraper_utils.py:48-60): minute
    * ticks / HT / ET / PEN → live; FT / AET → finished; else scheduled. */
  def classifyStatus(s: Column): Column = {
    val t = upper(trim(s))
    when(t.rlike("^\\d+'") || t.isin("HT", "ET", "PEN", "LIVE"), "live")
      .when(t.isin("FT", "AET", "FIN", "FINISHED", "ENDED"), "finished")
      .otherwise("scheduled")
  }

  /** F13 result classification (src/analytics/engine.py:405-409). */
  def classifyResult(home: Column, away: Column): Column =
    when(home > away, "home_win").when(home < away, "away_win").otherwise("draw")

  /** F15 name concat (engine.py:338). */
  def fullName(first: Column, last: Column): Column = concat_ws(" ", first, last)

  /** F16 anniversary-aware age (engine.py:305 SQL semantics — the
    * canonical of the reference's two divergent versions; asOf
    * parameterized for determinism). */
  def ageYears(birthDate: Column, asOf: Column): Column =
    floor(months_between(asOf, birthDate) / 12).cast("int")

  /** F20 slug / diacritic folding (src/api/endpoints/clubs.py:87-95). */
  def slugify(s: Column): Column = {
    val deUmlaut = regexp_replace(
      regexp_replace(regexp_replace(lower(s), "ü", "ue"), "ö", "oe"), "ä", "ae")
    val ssFold = regexp_replace(deUmlaut, "ß", "ss")
    regexp_replace(regexp_replace(trim(ssFold), "[^a-z0-9]+", "-"), "(^-|-$)", "")
  }

  /** F21 transfermarkt id from href (parsing.py:55-66). */
  def tmIdFromHref(href: Column): Column =
    coalesce(
      nullif(regexp_extract(href, "/spieler/(\\d+)", 1), lit("")),
      nullif(regexp_extract(href, "/verein/(\\d+)", 1), lit("")),
      nullif(regexp_extract(href, "/(\\d+)(?:/|$)", 1), lit("")))

  /** F27 entity type from a zerozero URL (zerozero_scraper.py:18-38): the
    * dispatch ladder routing four scrapers' bronze captures. Checked in
    * reference order against the lowercased URL *path* (host stripped, so
    * a domain like "spieler-markt.de" can't false-positive). */
  def entityTypeFromUrl(url: Column): Column = {
    val path = lower(regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))
    when(path.rlike("/(match|spiel)/"), "match")
      .when(path.rlike("/(referee|schiedsrichter)/"), "referee")
      .when(path.rlike("/(stadium|stadion)/"), "stadium")
      .when(path.rlike("/(player|spieler)/"), "player")
      .when(path.rlike("/(coach|trainer)/"), "coach")
      .when(path.rlike("/(team|verein)/"), "team")
      .otherwise("unknown")
  }

  /** F29 deterministic external id (flashscore_scraper.py:296 — semantic
    * key, NOT python hash()): sha2 over the natural key. */
  // Null parts get an explicit sentinel: concat_ws silently SKIPS nulls,
  // so ("Arsenal", null, date) and ("Arsenal", date) would otherwise hash
  // to the same id and upserts would overwrite the wrong row. Non-null
  // inputs hash exactly as before.
  // KEY-FORMAT BREAK (round 11→12): the sentinel changed from a space to NUL ("\u0000"),
  // so externalId values for any key tuple CONTAINING A NULL part differ
  // from pre-round-12 values. Persisted external_id-keyed upsert state
  // (e.g. live_scores / odds tables built by the streaming sinks) whose
  // natural keys can be null must be rebuilt (re-mint ids from natural
  // keys) before mixing with new batches — otherwise the same logical
  // row upserts under two ids and silently duplicates. All-non-null key
  // tuples are unaffected. Same migration as surrogateId below.
  def externalId(parts: Column*): Column =
    sha2(concat_ws("_",
      parts.map(p => coalesce(p.cast("string"), lit("\u0000"))): _*), 256)

  /** Surrogate key for distributed get-or-create (SURVEY §7.3 hard part):
    * 64-bit hash of the natural key replaces SERIAL sequences. */
  // Parts are hashed as SEPARATE xxhash64 inputs (type-tagged, no
  // concatenation), with the same NUL sentinel as externalId for nulls:
  // a plain-space sentinel would make ("x", null) and ("x", " ") mint
  // the same surrogate — the silent-merge bug this exists to prevent.
  // KEY-FORMAT BREAK (round 11→12): surrogates minted before the
  // separate-input + NUL-sentinel form differ from today's values;
  // get-or-create tables persisted under the old format must be rebuilt
  // (re-mint from natural keys) before mixing with new batches.
  def surrogateId(parts: Column*): Column =
    xxhash64(parts.map(p => coalesce(p.cast("string"), lit("\u0000"))): _*)
}
