package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze-layer snapshot ingestion (SURVEY.md §2.1 S-series, §3.2): the
  * engine ingests archived page/API snapshots — never live network I/O —
  * exactly as the reference itself dumps them (flashscore_scraper.py:84-97,
  * courtside_scraper.py:898-959).
  *
  *  - JSON snapshot drops → [[readJsonSnapshots]] (S16–S20)
  *  - whole-page HTML dumps → [[readHtmlSnapshots]] + [[extractTableRows]]
  *    (S5–S13: the `parse html table → rows` one-to-many pattern as
  *    parse-expression + explode, no custom Generator needed)
  *  - generic raw-capture append → [[scrapedDataFrame]] (K7 bronze sink
  *    shape, src/domain/utils.py:24-41)
  *
  * At scale each snapshot file is one input split; parsing is per-row and
  * embarrassingly parallel.
  */
object Bronze {

  /** S20-style static JSON source (multiline documents). */
  def readJsonSnapshots(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)

  /** Whole-file HTML snapshots: one row per page with its source path. */
  def readHtmlSnapshots(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .withColumn("snapshot_path", input_file_name())
      .withColumnRenamed("value", "html")

  /** Extract `<tr>` rows of the first matching `<table>` as an array of
    * cell-text arrays — the S5/S8 parser core as pure expressions:
    * regexp table slice → row split → per-row cell extraction → tag strip.
    * Compose with `explode` for the one-to-many UDTF pattern. */
  def extractTableRows(html: Column): Column = {
    val table = regexp_extract(html, "(?s)<table[^>]*>(.*?)</table>", 1)
    val rows = filter(
      transform(split(table, "(?i)<tr[^>]*>"),
        r => regexp_extract(r, "(?s)(.*?)(?:</tr>|$)", 1)),
      r => r.rlike("(?i)<t[dh]"))
    transform(rows, r =>
      transform(
        filter(split(r, "(?i)<t[dh][^>]*>"), c => c.rlike("\\S")),
        // (?s) so the strip spans newlines: without DOTALL, content
        // after </td> on a LATER line of a pretty-printed cell found no
        // match at all and leaked into the cell value.
        c => trim(regexp_replace(
          regexp_replace(c, "(?is)</t[dh]>.*$", ""),
          "<[^>]*>", ""))))
  }

  /** Exploded (row_idx, cells) view of the first table in each page. */
  def tableRows(pages: DataFrame, htmlCol: String = "html"): DataFrame =
    pages
      .withColumn("__rows", extractTableRows(col(htmlCol)))
      .select(col("snapshot_path"),
        posexplode(col("__rows")).as(Seq("row_idx", "cells")))

  /** S14/S16 Next.js hydration fallback (reference
    * bundesliga_club_scraper.py / courtside_scraper.py `__NEXT_DATA__`
    * extraction): pull the embedded JSON blob out of the page; feed the
    * result to `functions.JsonNorm` / `from_json`. */
  def extractNextData(html: Column): Column =
    nullif(regexp_extract(html,
      "(?s)<script[^>]*id=\"__NEXT_DATA__\"[^>]*>(.*?)</script>", 1), lit(""))

  /** K7 generic raw-capture record: (scraper_name, data JSON, created_at). */
  def scrapedDataFrame(df: DataFrame, scraperName: String): DataFrame =
    df.select(
      lit(scraperName).as("scraper_name"),
      to_json(struct(df.columns.map(col): _*)).as("data"),
      current_timestamp().as("created_at"))

  /** K13 CSV snapshot writer (fbref_season_scraper.py:143-162). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(path)
}
