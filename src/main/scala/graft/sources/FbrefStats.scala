package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** S5: FBref match-page stats parser, `data-stat`-keyed (reference
  * `src/data_collection/scrapers/fbref_match_scraper.py:197-283` player
  * tables, `:286-345` team tables, `:348-400` GK tables — GK pages are
  * `table#stats_keeper_*`, which the `stats_` prefix already selects).
  *
  * The reference walks the DOM with BeautifulSoup per page; here each page
  * is one row and the whole parse is a pure-expression pipeline
  * (regexp extract → posexplode → group), so Catalyst sees one distributed
  * plan: no UDFs, no driver loops, embarrassingly parallel over snapshot
  * files at 100 TB.
  *
  * Semantics mirrored from the reference:
  *   - tables selected by id prefix `stats_` — including tables embedded in
  *     HTML comments (FBref ships them commented; a regex scan sees through
  *     comments exactly like the reference's explicit comment re-parse)
  *   - a row is keyed by `<th data-stat="player" data-append-csv="ID">`
  *     (attribute order-insensitive); rows without the key are skipped
  *   - `<tr class="thead|summary">` separator rows are skipped
  *   - every `<td data-stat="K">V</td>` contributes K→V; duplicate keys
  *     resolve LAST-WINS across (table, row, cell) order — the reference's
  *     `players[id].update(row_stats)` merge
  *   - cell text is tag-stripped and trimmed (`get_text(strip=True)`)
  *   - numeric coercion [[toNumber]] = `_to_number`
  *     (fbref_match_scraper.py:172-195): "" / "—" / "-" → null,
  *     "90+2" → 92, "55%" → 55, comma decimals → dot
  *   - typed core columns per CORE_MAP (fbref_match_scraper.py:48-67) /
  *     TEAM_CORE_KEYS (:70-85), full stat map kept as `metrics_extra` JSON
  *     (fbref_match_scraper.py:792)
  */
object FbrefStats {

  /** `_to_number` — delegates to the single canonical implementation
    * ([[graft.functions.Parsing.toNumber]]); this file previously
    * carried its own copy and the two had drifted. */
  def toNumber(v: Column): Column = graft.functions.Parsing.toNumber(v)

  /** All `<table id="stats_…">…</table>` fragments of a page (document
    * order), commented or not. */
  def statTables(html: Column): Column =
    regexp_extract_all(html,
      lit("(?si)<table[^>]*\\bid=\"stats_[^\"]*\"[^>]*>.*?</table>"), lit(0))

  /** Team-stats table fragments: id contains `team_stats` or `summary`
    * (reference parse_team_stats selector, fbref_match_scraper.py:293-297;
    * rows are then filtered by the squad-href key, so the over-broad
    * `summary` match is harmless, as in the reference). */
  def teamTables(html: Column): Column =
    regexp_extract_all(html,
      lit("(?si)<table[^>]*\\bid=\"[^\"]*(?:team_stats|summary)[^\"]*\"[^>]*>.*?</table>"),
      lit(0))

  /** `<tr>` fragments of a table's tbody, minus `thead`/`summary`
    * separator rows. */
  private def bodyRows(table: Column): Column =
    filter(
      regexp_extract_all(
        regexp_extract(table, "(?si)<tbody[^>]*>(.*?)</tbody>", 1),
        lit("(?si)<tr[^>]*>.*?</tr>"), lit(0)),
      r => !r.rlike("(?i)^<tr[^>]*class=\"[^\"]*\\b(thead|summary)\\b"))

  /** FBref player id from the row-heading th (attribute order varies). */
  private def playerIdOf(row: Column): Column = coalesce(
    nullif(regexp_extract(row,
      "(?si)<th[^>]*data-stat=\"player\"[^>]*data-append-csv=\"([^\"]+)\"", 1), lit("")),
    nullif(regexp_extract(row,
      "(?si)<th[^>]*data-append-csv=\"([^\"]+)\"[^>]*data-stat=\"player\"", 1), lit("")))

  /** FBref team id from the row-heading squad link
    * (`/en/squads/<id>/…`, fbref_match_scraper.py:319-323). The scan is
    * bounded to the th fragment — `((?!</th>).)*?` instead of `.*?`,
    * which under (?s) would cross `</th>` and key a link-less heading
    * row (e.g. a "Total" row) by the first squad link in a later td. */
  private def teamIdOf(row: Column): Column = nullif(regexp_extract(row,
    "(?si)<th[^>]*>((?!</th>).)*?<a[^>]+href=\"[^\"]*/en/squads/([^/\"]+)/[^\"]*\"", 2), lit(""))

  /** `(key, value)` entries of a row's `<td data-stat>` cells, document
    * order; values tag-stripped + trimmed. */
  private def tdEntries(row: Column): Column =
    transform(
      regexp_extract_all(row, lit("(?si)<td[^>]*\\bdata-stat=\"[^\"]*\"[^>]*>.*?</td>"), lit(0)),
      f => struct(
        regexp_extract(f, "data-stat=\"([^\"]*)\"", 1).as("key"),
        trim(regexp_replace(
          regexp_extract(f, "(?s)^<td[^>]*>(.*)</td>$", 1),
          "<[^>]*>", "")).as("value")))

  /** Exploded per-cell view: one row per (page, rowId, data-stat key) with
    * (table, row, cell) position for last-wins merging. */
  private def keyValues(pages: DataFrame, htmlCol: String, pageKey: Seq[String],
                        tables: Column => Column, rowIdOf: Column => Column,
                        idName: String): DataFrame = {
    val keys = pageKey.map(col)
    pages
      .select(keys :+ posexplode(tables(col(htmlCol))).as(Seq("t_idx", "__tbl")): _*)
      .select(keys ++ Seq(col("t_idx"), posexplode(bodyRows(col("__tbl"))).as(Seq("r_idx", "__row"))): _*)
      .withColumn(idName, rowIdOf(col("__row")))
      .filter(col(idName).isNotNull)
      .select(keys ++ Seq(col(idName), col("t_idx"), col("r_idx"),
        posexplode(tdEntries(col("__row"))).as(Seq("e_idx", "__e"))): _*)
      .select(keys ++ Seq(col(idName), col("t_idx"), col("r_idx"), col("e_idx"),
        col("__e.key").as("stat_key"), col("__e.value").as("stat_value")): _*)
  }

  /** Merged per-entity stat entries: exactly one value per
    * (page, id, data-stat), last occurrence wins. */
  private def mergedKeyValues(pages: DataFrame, htmlCol: String, pageKey: Seq[String],
                              tables: Column => Column, rowIdOf: Column => Column,
                              idName: String): DataFrame =
    keyValues(pages, htmlCol, pageKey, tables, rowIdOf, idName)
      .groupBy((pageKey :+ idName :+ "stat_key").map(col): _*)
      .agg(max_by(col("stat_value"),
        struct(col("t_idx"), col("r_idx"), col("e_idx"))).as("stat_value"))

  /** Player stat map per (page, fbref_player_id): raw string values,
    * last table/row wins — `parse_player_tables` (and GK tables, which are
    * `stats_keeper_*`). */
  def playerStats(pages: DataFrame, htmlCol: String = "html",
                  pageKey: Seq[String] = Seq("snapshot_path")): DataFrame =
    mergedKeyValues(pages, htmlCol, pageKey, statTables, playerIdOf, "fbref_player_id")
      .groupBy((pageKey :+ "fbref_player_id").map(col): _*)
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("stat_key"), col("stat_value"))))).as("stats"))

  /** Player core columns (CORE_MAP): fbref data-stat key → (column, is
    * int). xg/xa stay double, everything else ints
    * (fbref_match_scraper.py:722-731). */
  private val PlayerCore: Seq[(String, String, Boolean)] = Seq(
    ("minutes", "minutes", true),
    ("shots", "shots_total", true),
    ("shots_on_target", "shots_on_target", true),
    ("xg", "xg", false),
    ("xa", "xa", false),
    ("passes", "passes", true),
    ("passes_completed", "passes_completed", true),
    ("tackles", "tackles", true),
    ("interceptions", "interceptions", true),
    ("clearances", "clearances", true),
    ("dribbles_completed", "dribbles_completed", true),
    ("key_passes", "key_passes", true),
    ("progressive_passes", "progressive_passes", true),
    ("cards_yellow", "yellows", true),
    ("cards_red", "reds", true),
    ("fouls", "fouls_committed", true),
    ("fouled", "fouls_drawn", true))

  /** Typed player match stats: CORE_MAP columns + `n_keys` + the full map
    * as `metrics_extra` JSON — the player_match_stats row shape
    * (fbref_match_scraper.py:717-795). */
  def playerMatchStats(pages: DataFrame, htmlCol: String = "html",
                       pageKey: Seq[String] = Seq("snapshot_path")): DataFrame = {
    val merged = mergedKeyValues(pages, htmlCol, pageKey, statTables, playerIdOf, "fbref_player_id")
    val coreAggs = PlayerCore.map { case (fbKey, dbCol, isInt) =>
      val raw = max(when(col("stat_key") === fbKey, col("stat_value")))
      val num = toNumber(raw)
      (if (isInt) num.try_cast("long") else num).as(dbCol)
    }
    merged
      .groupBy((pageKey :+ "fbref_player_id").map(col): _*)
      .agg(coreAggs.head, coreAggs.tail ++ Seq(
        count(lit(1)).as("n_keys"),
        to_json(map_from_entries(array_sort(
          collect_list(struct(col("stat_key"), col("stat_value")))))).as("metrics_extra")): _*)
  }

  /** Team core columns (TEAM_CORE_KEYS): synonym lists in reference dict
    * order — the LAST present synonym wins (`for k_src in dict: core[dst] =
    * stats[k_src]`), so coalesce in reverse order. */
  private val TeamCore: Seq[(Seq[String], String, Boolean)] = Seq(
    (Seq("possession"), "possession", false),
    (Seq("sh", "shots"), "shots_total", true),
    (Seq("sot", "shots_on_target"), "shots_on_target", true),
    (Seq("c", "corners", "crs"), "corners", true),
    (Seq("fouls"), "fouls", true),
    (Seq("offsides"), "offsides", true),
    (Seq("passes"), "passes", true),
    (Seq("passes_completed"), "passes_completed", true),
    (Seq("xg"), "xg", false),
    (Seq("xa"), "xa", false))

  /** Typed team match stats keyed by (page, fbref_team_id) — the
    * team_match_stats row shape (fbref_match_scraper.py:798-860). */
  def teamMatchStats(pages: DataFrame, htmlCol: String = "html",
                     pageKey: Seq[String] = Seq("snapshot_path")): DataFrame = {
    val merged = mergedKeyValues(pages, htmlCol, pageKey, teamTables, teamIdOf, "fbref_team_id")
    val coreAggs = TeamCore.map { case (fbKeys, dbCol, isInt) =>
      val raw = coalesce(fbKeys.reverse.map(k =>
        max(when(col("stat_key") === k, col("stat_value")))): _*)
      val num = toNumber(raw)
      (if (isInt) num.try_cast("long") else num).as(dbCol)
    }
    merged
      .groupBy((pageKey :+ "fbref_team_id").map(col): _*)
      .agg(coreAggs.head, coreAggs.tail :+
        to_json(map_from_entries(array_sort(
          collect_list(struct(col("stat_key"), col("stat_value")))))).as("metrics_extra"): _*)
  }

  // ------------------------------------------------------------------
  // Oracle harness: synthesize FBref-shaped pages from lineitem, parse
  // them back, and emit typed columns DuckDB can compute directly from
  // the table — a round-trip proof of the parser's value semantics.
  // ------------------------------------------------------------------

  /** q_match_stats: one synthetic match page per orderkey; players are
    * deduped (orderkey, linenumber) lineitems. Two stats_ tables per page
    * — the second comment-wrapped with swapped th attribute order and a
    * nested tag, overriding `shots` (last-wins) and adding
    * `shots_on_target` + (even linenumbers only) `xg` with a comma
    * decimal; `minutes` is "90+2" stoppage-form for linenumber 7; `fouls`
    * is the em-dash null. A `thead`-class spacer row and a non-stats table
    * must be ignored. */
  def matchStatsFromLineitem(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 500)
      .groupBy(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .agg(max(col("l_quantity")).cast("int").as("qty"),
        max(col("l_extendedprice")).cast("decimal(18,2)").as("price"))

    val pid = concat(lit("p"), col("ok"), lit("-"), col("ln"))
    val minutesRaw = when(col("ln") === 7, lit("90+2"))
      .otherwise((col("ln") * 10).cast("string"))
    val row1 = concat(
      lit("<tr><th data-stat=\"player\" data-append-csv=\""), pid,
      lit("\">Player</th><td data-stat=\"minutes\">"), minutesRaw,
      lit("</td><td data-stat=\"shots\">"), col("qty").cast("string"),
      lit("</td><td data-stat=\"fouls\">—</td></tr>"))
    val xgCell = when(col("ln") % 2 === 0,
      concat(lit("<td data-stat=\"xg\">"),
        regexp_replace(col("price").cast("string"), "\\.", ","), lit("</td>")))
      .otherwise(lit(""))
    val row2 = concat(
      lit("<tr><th data-append-csv=\""), pid,
      lit("\" data-stat=\"player\">P</th><td data-stat=\"shots\"><strong>"),
      (col("qty") + 1).cast("string"),
      lit("</strong></td><td data-stat=\"shots_on_target\">"),
      (col("qty") / 2).cast("int").cast("string"), lit("</td>"), xgCell, lit("</tr>"))

    val pages = src
      .groupBy("ok")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ln"), row1.as("h")))),
          s => s.getField("h")), "").as("t1"),
        array_join(transform(
          array_sort(collect_list(struct(col("ln"), row2.as("h")))),
          s => s.getField("h")), "").as("t2"))
      .select(col("ok"), concat(
        lit("<html><body><table id=\"info\"><tbody><tr>" +
          "<th data-stat=\"player\" data-append-csv=\"IGNORED\">x</th>" +
          "<td data-stat=\"minutes\">999</td></tr></tbody></table>" +
          "<table id=\"stats_player_summary\"><thead><tr>" +
          "<th data-stat=\"player\">Player</th></tr></thead><tbody>" +
          "<tr class=\"thead\"><td data-stat=\"junk\">x</td></tr>"),
        col("t1"),
        lit("</tbody></table><!-- <table id=\"stats_misc\"><tbody>"),
        col("t2"),
        lit("</tbody></table> --></body></html>")).as("html"))

    playerMatchStats(pages, "html", Seq("ok"))
      .select(
        col("fbref_player_id").as("player_id"),
        col("minutes"), col("shots_total"), col("shots_on_target"),
        col("xg"), col("fouls_committed"), col("n_keys"))
      .orderBy("player_id")
  }

  /** q_team_stats: team-table round trip from supplier rows — one
    * team_stats page per nation; exercises squad-href keying, the
    * sh-vs-shots synonym precedence (both present, `shots` must win),
    * the crs corner synonym, percent possession, and comma-decimal xg. */
  def teamStatsFromSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.supplier(spark, dir)
      .select(
        col("s_suppkey").as("sk"),
        col("s_nationkey").as("nk"),
        pmod(col("s_suppkey"), lit(100)).cast("int").as("poss"),
        (pmod(col("s_suppkey"), lit(20)) + 1).cast("int").as("shots"),
        pmod(col("s_suppkey"), lit(15)).cast("int").as("crs"),
        abs(col("s_acctbal")).cast("decimal(12,2)").as("xg"))
    val rowHtml = concat(
      lit("<tr><th><a href=\"/en/squads/t"), col("sk"), lit("/Team-"), col("sk"),
      lit("\">T</a></th><td data-stat=\"possession\">"), col("poss").cast("string"),
      lit("%</td><td data-stat=\"sh\">99</td><td data-stat=\"shots\">"),
      col("shots").cast("string"),
      lit("</td><td data-stat=\"crs\">"), col("crs").cast("string"),
      lit("</td><td data-stat=\"xg\">"),
      regexp_replace(col("xg").cast("string"), "\\.", ","), lit("</td></tr>"))
    val pages = src
      .groupBy("nk")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("sk"), rowHtml.as("h")))),
        s => s.getField("h")), "").as("rows"))
      .select(col("nk"), concat(
        lit("<html><body><table id=\"team_stats\"><tbody>"),
        col("rows"), lit("</tbody></table></body></html>")).as("html"))
    teamMatchStats(pages, "html", Seq("nk"))
      .select(col("fbref_team_id"), col("possession"), col("shots_total"),
        col("corners"), col("xg"))
      .orderBy("fbref_team_id")
  }
}
