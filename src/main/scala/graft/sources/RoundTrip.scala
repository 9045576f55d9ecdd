package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-trip oracle harnesses: synthesize site-shaped pages from the
  * corpus tables, push them through the real parsers, and emit typed
  * columns the DuckDB oracle recomputes directly from the tables. Any
  * defect in the parser's segmentation, predicates, or coercion breaks
  * the hash match — the same proof pattern as
  * [[FbrefStats.matchStatsFromLineitem]].
  */
object RoundTrip {

  /** Fan expression-dense synthesized pages across the session's cores.
    * The synthetic corpus arrives as ONE small parquet split, so without
    * this a parse-heavy round trip runs as a single task and the bench
    * measures one core of 32 — an artifact of the tiny input, not a
    * scale property (production inputs are many splits and parallelize
    * naturally; the rows here are a few KB each, so the extra exchange
    * is negligible). */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** q_transfers: one Transfermarkt-style transfers page per nation.
    * Even custkeys are listed in the Zugänge (in) table, odd in the
    * Abgänge (out) table; fee text cycles free / loan / €…m by
    * custkey % 3 (exercising F8 fee typing); the bare age cell, position
    * whitelist cell, /verein/ club link, and dd.MM.yyyy date cell
    * exercise the predicate-based field discovery of
    * [[SiteParsers.transfersFromPages]]. */
  def transfersFromCustomers(spark: SparkSession, dir: String): DataFrame = {
    val positions = array(lit("GK"), lit("DF"), lit("MF"), lit("FW"))
    val c = Tables.customer(spark, dir)
      .select(
        col("c_custkey").as("ck"),
        col("c_name").as("nm"),
        col("c_nationkey").as("nk"),
        (lit(18) + pmod(col("c_custkey"), lit(30))).cast("int").as("age"),
        element_at(positions, (pmod(col("c_custkey"), lit(4)) + 1).cast("int")).as("pos"),
        abs(col("c_acctbal")).cast("decimal(12,2)").as("fee_m"),
        date_format(date_add(lit("2023-07-01").cast("date"),
          pmod(col("c_custkey"), lit(60)).cast("int")), "dd.MM.yyyy").as("dt"))
    // "Leihe" alone would not match the reference's fee-cell keyword list
    // (fee|ablöse|€|free|loan) — real pages write "Leihe / loan"
    val feeCell = when(pmod(col("ck"), lit(3)) === 0, lit("ablösefrei"))
      .when(pmod(col("ck"), lit(3)) === 1, lit("Leihe / loan"))
      .otherwise(concat(lit("€"), col("fee_m").cast("string"), lit("m")))
    val rowHtml = concat(
      lit("<tr><td><a href=\"/p/profil/spieler/"), col("ck"), lit("\">"), col("nm"),
      lit("</a></td><td>"), col("pos"),
      lit("</td><td>"), col("age").cast("string"),
      lit("</td><td><a href=\"/n/startseite/verein/"), col("nk"), lit("\">Nation "),
      col("nk"), lit("</a></td><td>"), feeCell,
      lit("</td><td>"), col("dt"), lit("</td></tr>"))
    val rows = c.withColumn("__row", rowHtml)
    def tableOf(rowsCol: String): org.apache.spark.sql.Column = concat(
      lit("<table class=\"items\"><tr><th>Spieler</th><th>Pos</th><th>Alter</th>" +
        "<th>Verein</th><th>Ablöse</th><th>Datum</th></tr>"),
      col(rowsCol), lit("</table>"))
    val pages = rows
      .groupBy(col("nk"))
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("ck"), when(pmod(col("ck"), lit(2)) === 0, col("__row")).otherwise("").as("h")))),
          s => s.getField("h")), "").as("in_rows"),
        array_join(transform(array_sort(collect_list(
          struct(col("ck"), when(pmod(col("ck"), lit(2)) === 1, col("__row")).otherwise("").as("h")))),
          s => s.getField("h")), "").as("out_rows"))
      .select(col("nk"),
        concat(lit("<html><body><h2>Zugänge</h2>"), tableOf("in_rows"),
          lit("<h3>Abgänge</h3>"), tableOf("out_rows"),
          lit("</body></html>")).as("html"))
      .withColumn("snapshot_path", concat(lit("nation_"), col("nk")))

    SiteParsers.transfersFromPages(pages)
      .select(
        col("direction"), col("player_name"), col("position"), col("age"),
        col("transfer_fee.fee_type").as("fee_type"),
        col("transfer_fee.amount").as("fee_amount"),
        col("club_name"), col("transfer_date"))
      .orderBy("player_name")
  }

  /** q_squad: Transfermarkt squad-table round trip (S8) — one page per
    * nation; exercises the positional cell mapping, dd.MM.yyyy birth
    * dates (F6 parseDateMulti), €…m market values (F7), and the
    * header-row drop in [[SiteParsers.squadFromPages]]. */
  def squadFromCustomers(spark: SparkSession, dir: String): DataFrame = {
    val positions = array(lit("GK"), lit("DF"), lit("MF"), lit("FW"))
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").as("ck"),
      col("c_name").as("nm"),
      col("c_nationkey").as("nk"),
      (pmod(col("c_custkey"), lit(98)) + 1).cast("int").as("num"),
      element_at(positions, (pmod(col("c_custkey"), lit(4)) + 1).cast("int")).as("pos"),
      date_format(date_add(lit("1980-01-01").cast("date"),
        pmod(col("c_custkey"), lit(8000)).cast("int")), "dd.MM.yyyy").as("born"),
      (pmod(col("c_custkey"), lit(90)) + 1).cast("int").as("mv_m"))
    val rowHtml = concat(
      lit("<tr><td>"), col("num"),
      lit("</td><td><a href=\"/p/spieler/"), col("ck"), lit("\">"), col("nm"),
      lit("</a></td><td>"), col("pos"),
      lit("</td><td>"), col("born"),
      lit("</td><td>Nation "), col("nk"),
      lit("</td><td>€"), col("mv_m"), lit(".00m</td></tr>"))
    val pages = c
      .groupBy("nk")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ck"), rowHtml.as("h")))),
        s => s.getField("h")), "").as("rows"))
      .select(
        concat(lit("nation_"), col("nk")).as("snapshot_path"),
        concat(
          lit("<table class=\"items\"><tr><th>#</th><th>Player</th><th>Pos</th>" +
            "<th>Born</th><th>Nat</th><th>Value</th></tr>"),
          col("rows"), lit("</table>")).as("html"))
    SiteParsers.squadFromPages(pages)
      .select(col("number"), col("name"), col("position"), col("birth_date"),
        col("nationality"), col("market_value"))
      .orderBy("name")
  }

  /** q_injuries: injuries-table round trip (S10) — absence typing (F28)
    * from the reason text, date parsing, missed-games int. */
  def injuriesFromCustomers(spark: SparkSession, dir: String): DataFrame = {
    val reasons = array(lit("Hamstring injury"), lit("Rotsperre"),
      lit("Krank"), lit("National team duty"))
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").as("ck"),
      col("c_name").as("nm"),
      col("c_nationkey").as("nk"),
      element_at(reasons, (pmod(col("c_custkey"), lit(4)) + 1).cast("int")).as("reason"),
      date_format(date_add(lit("2024-01-01").cast("date"),
        pmod(col("c_custkey"), lit(300)).cast("int")), "dd.MM.yyyy").as("start"),
      date_format(date_add(lit("2024-01-15").cast("date"),
        pmod(col("c_custkey"), lit(300)).cast("int")), "dd.MM.yyyy").as("until"),
      pmod(col("c_custkey"), lit(12)).cast("int").as("missed"))
    val rowHtml = concat(
      lit("<tr><td>"), col("nm"),
      lit("</td><td>"), col("reason"),
      lit("</td><td>"), col("start"),
      lit("</td><td>"), col("until"),
      lit("</td><td>"), col("missed"), lit("</td></tr>"))
    val pages = c
      .groupBy("nk")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ck"), rowHtml.as("h")))),
        s => s.getField("h")), "").as("rows"))
      .select(
        concat(lit("nation_"), col("nk")).as("snapshot_path"),
        concat(
          lit("<table><tr><th>Player</th><th>Reason</th><th>From</th>" +
            "<th>Until</th><th>Games</th></tr>"),
          col("rows"), lit("</table>")).as("html"))
    SiteParsers.injuriesFromPages(pages)
      .select(col("player_name"), col("reason"), col("start_date"),
        col("end_or_expected"), col("missed_games"), col("absence_type"))
      .orderBy("player_name")
  }

  /** q_career_stats: S14-depth round trip — one Bundesliga-style player
    * page per customer carrying a career table (header row, three season
    * rows, a short decoy row that the ≥3-cells filter must drop, and a
    * non-numeric goals cell in season 3 exercising the isdigit guard)
    * plus a season-stat grid: key/value rows for Einsätze / Tore /
    * Laufdistanz (German decimal comma) and stat-box entries for Tore
    * (must LOSE to the grid row) and Sprints (only present as a box —
    * must fill). Parsed by [[BundesligaCrawl.playersFromPages]]; the
    * oracle recomputes every value from `customer` arithmetic. */
  def careerFromCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").as("ck"),
      col("c_name").as("nm"),
      col("c_nationkey").as("nk"))
    val seasonNames = Seq("2021/22", "2022/23", "2023/24")
    def careerRow(i: Int): org.apache.spark.sql.Column = {
      val goalsCell =
        if (i == 3) lit("-")
        else pmod(col("ck") * i, lit(20)).cast("string")
      concat(
        lit("<tr><td>"), lit(seasonNames(i - 1)),
        lit("</td><td>Nation "), col("nk"),
        lit("</td><td>Liga "), pmod(col("ck"), lit(3)),
        lit("</td><td>"), pmod(col("ck") + i, lit(40)),
        lit("</td><td>"), goalsCell,
        lit("</td><td>"), pmod(col("ck") + 7 * i, lit(15)),
        lit("</td></tr>"))
    }
    def kvRow(key: String, value: org.apache.spark.sql.Column) = concat(
      lit(s"""<div class="row"><div class="key">$key</div><div class="value">"""),
      value, lit("</div></div>"))
    def statBox(label: String, value: org.apache.spark.sql.Column) = concat(
      lit(s"""<div class="stat-box"><div class="label">$label</div><div class="value">"""),
      value, lit("</div></div>"))
    val html = concat(
      lit("<html><body><h1>"), col("nm"), lit("</h1>"),
      kvRow("Einsätze", concat(pmod(col("ck"), lit(40)), lit(" Spiele"))),
      kvRow("Tore", pmod(col("ck"), lit(20))),
      kvRow("Laufdistanz",
        concat(pmod(col("ck"), lit(400)), lit(","), pmod(col("ck"), lit(10)), lit(" km"))),
      statBox("Tore", pmod(col("ck"), lit(20)) + 1),
      statBox("Sprints", pmod(col("ck"), lit(90))),
      lit("<table class=\"career-history\"><tr><th>Saison</th><th>Team</th>" +
        "<th>Liga</th><th>Spiele</th><th>Tore</th><th>Vorlagen</th></tr>"),
      careerRow(1), careerRow(2), careerRow(3),
      lit("<tr><td>decoy</td><td>short</td></tr></table></body></html>"))
    val pages = fanOut(c.select(
      concat(lit("https://example.test/de/bundesliga/spieler/"), col("ck"))
        .as("player_url"),
      html.as("html")))
    BundesligaCrawl.playersFromPages(pages)
      .select(
        regexp_extract(col("player_url"), "(\\d+)$", 1).cast("long").as("ck"),
        col("season_stats.appearances").as("cur_appearances"),
        col("season_stats.goals").as("cur_goals"),
        col("season_stats.sprints").as("cur_sprints"),
        col("season_stats.distance_km").as("cur_distance_km"),
        // explode_outer, deliberately: plain explode lets
        // InferFiltersFromGenerate add `isnotnull(career) && size>0`,
        // and predicate pushdown inlines the whole career parse into a
        // filter that sinks below the fan-out exchange — re-running the
        // expensive parse in the single-split scan stage. Every page
        // here has 3 career rows, so outer ≡ inner.
        explode_outer(col("senior_career")).as("cs"))
      .select(col("ck"),
        col("cs.season").as("season"), col("cs.team").as("team"),
        col("cs.league").as("league"),
        col("cs.appearances").as("appearances"),
        col("cs.goals").as("goals"), col("cs.assists").as("assists"),
        col("cur_appearances"), col("cur_goals"), col("cur_sprints"),
        col("cur_distance_km"))
      .orderBy("ck", "season")
  }

  /** q_idmap_mapping / q_idmap_conflicts: the J7 external-id registry
    * exercised end-to-end. `current` maps each residue class of custkey
    * to its smallest member; `staged` claims map orderkey residues to the
    * ordering customer — colliding residues create intra-batch conflicts,
    * overlaps with `current` create cross-registry conflicts. */
  private def idmapInputs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val current = Tables.customer(spark, dir)
      .groupBy(pmod(col("c_custkey"), lit(500)).cast("string").as("external_id"))
      .agg(min(col("c_custkey")).as("internal_id"))
      .select(lit("reg").as("source"), col("external_id"), col("internal_id"))
    val staged = Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 2000)
      .select(lit("reg").as("source"),
        pmod(col("o_orderkey"), lit(700)).cast("string").as("external_id"),
        col("o_custkey").as("internal_id"))
    (current, staged)
  }

  def idmapMapping(spark: SparkSession, dir: String): DataFrame = {
    val (current, staged) = idmapInputs(spark, dir)
    graft.operators.ExternalIdMap.register(current, staged).mapping
      .orderBy("source", "external_id", "internal_id")
  }

  def idmapConflicts(spark: SparkSession, dir: String): DataFrame = {
    val (current, staged) = idmapInputs(spark, dir)
    graft.operators.ExternalIdMap.register(current, staged).conflicts
      .orderBy("source", "external_id", "claimed_internal_id")
  }
}
