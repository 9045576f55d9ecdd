package graft

import org.apache.spark.sql.functions._

import graft.operators.{EntityResolution, Merge, Validate}
import graft.sources.SiteParsers

/** End-to-end layered pipeline (SURVEY.md §3.2 bronze→silver→gold): raw
  * HTML snapshot → typed squad records → constraint validation →
  * fuzzy entity resolution against the master table → last-writer-wins
  * upsert → gold aggregate. Asserts the layers compose without any
  * driver-side loops.
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("bronze HTML -> silver resolve+upsert -> gold aggregate") {
    // bronze: one scraped squad page (with one typo'd known player)
    val html = """<table>
      |<tr><th>#</th><th>Player</th><th>Pos</th><th>Born</th><th>Nat</th><th>Value</th></tr>
      |<tr><td>10</td><td>Lionel Messi</td><td>RW</td><td>24.06.1987</td><td>Argentina</td><td>€50.00m</td></tr>
      |<tr><td>9</td><td>Erling Haland</td><td>ST</td><td>21.07.2000</td><td>Norway</td><td>€180.00m</td></tr>
      |<tr><td>7</td><td>New Guy</td><td>LW</td><td>01.02.2004</td><td>France</td><td>€5.00m</td></tr>
      |</table>""".stripMargin
    val pages = Seq(html).toDF("html").withColumn("snapshot_path", lit("squad1"))
    val squad = SiteParsers.squadFromPages(pages)
      .withColumn("country", col("nationality"))
    assert(squad.count() == 3)

    // silver 1: constraint validation — nothing quarantined here
    val validated = Validate.validate(squad, Seq(
      Validate.notNull("name"),
      Validate.atLeast("market_value", 0.0)))
    assert(validated.quarantine.count() == 0)

    // silver 2: fuzzy resolution against the player master
    val master = Seq(
      (1L, "Lionel Messi", "Argentina"),
      (2L, "Erling Haaland", "Norway"))
      .toDF("id", "name", "country")
    val res = EntityResolution.resolve(validated.valid, master,
      nameCol = "name", blockCol = "country", idCol = "id")
    assert(res.matched.count() == 2)  // exact + one-typo both auto-match
    assert(res.create.count() == 1)   // "New Guy" is a new entity

    // silver 3: upsert matched rows into the current squad state
    val current = Seq((1L, 4.5e7, 1)).toDF("entity_id", "market_value", "version")
    val staged = res.matched
      .select(col("entity_id"), col("market_value"), lit(2).as("version"))
    val merged = Merge.upsertLatest(current, staged,
      keys = Seq("entity_id"), version = Seq("version"))
    assert(merged.count() == 2)
    assert(merged.filter(col("entity_id") === 1L).head().getDouble(1) == 5.0e7)

    // gold: aggregate over the merged state
    val total = merged.agg(sum(col("market_value").cast("decimal(18,2)"))
      .cast("double")).head().getDouble(0)
    assert(total == 5.0e7 + 1.8e8)
  }
}
