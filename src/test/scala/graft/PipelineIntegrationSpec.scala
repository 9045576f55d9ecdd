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

  test("corpus cleanup pipeline: quality -> exact dedup -> near-dup -> split -> pack") {
    import graft.scale.{Dedup, TextAnalysis, TrainingData}
    val dir = TestSpark.Sf0001
    val docs = graft.sources.Tables.documents(spark, dir)
    val total = docs.count()

    // stage 1: Gopher-style quality gate
    val survivors = TextAnalysis.qualityFilter(spark, dir)
      .filter(col("pass"))
      .select("doc_id")
    val nQuality = survivors.count()
    assert(nQuality > 0 && nQuality <= total)

    // stage 2: exact dedup — drop all but the first doc of each
    // fingerprint group
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val dupLosers = fp
      .join(Dedup.exactDupGroups(docs, TextAnalysis.fingerprint(col("text")))
        .select(col("fingerprint"), col("first_doc")), "fingerprint")
      .filter(col("doc_id") =!= col("first_doc"))
      .select("doc_id")
    // stage 3: near-dup removal — higher doc_id of each minhash pair dies
    val nearLosers = Dedup.minhashPairs(spark, dir).select(col("d2").as("doc_id"))
    val clean = docs.join(survivors, "doc_id")
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(nearLosers, Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nQuality)

    // stage 4: deterministic stratified split — every doc gets exactly one
    val splits = clean
      .select(col("doc_id"), TrainingData.splitOf(col("doc_id")).as("split"))
    assert(splits.count() == nClean)
    val bySplit = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == nClean)
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))

    // stage 5: pack the train split into token-budget sequences; no
    // sequence may exceed budget + the largest single document
    val budget = 512L
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val packed = clean.join(splits.filter(col("split") === "train"), "doc_id")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("seq_id", floor((sum(col("tokens")).over(w) - col("tokens")) / budget))
      .groupBy("seq_id").agg(sum("tokens").as("seq_tokens"), max("tokens").as("max_doc"))
    val over = packed.filter(col("seq_tokens") > lit(budget) + col("max_doc")).count()
    assert(over == 0, "a packed sequence exceeded budget + one document")
  }

  test("corpus cleanup pipeline v2: span scrub -> quality trim -> stratified sample") {
    import graft.scale.{Search, TextAnalysis, TrainingData}
    val dir = TestSpark.Sf0001
    val docs = graft.sources.Tables.documents(spark, dir)
    val total = docs.count()

    // stage 1: cross-document boilerplate scrub — spans survive exactly
    // once corpus-wide; totals are conserved
    val scrub = Search.spanDedup(docs)
    val t = scrub.agg(sum("n_spans").as("s"), sum("n_kept").as("k")).head()
    assert(t.getLong(1) <= t.getLong(0))
    assert(scrub.count() == total, "every doc must be accounted for")

    // stage 2: percentile quality trim per language — each stratum keeps
    // strictly fewer-or-equal docs, and at least the top half
    val trims = TextAnalysis.qualityTrim(spark, dir).collect()
    trims.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) * 2 >= r.getLong(1),
        s"lang ${r.getString(0)} lost more than the bottom half")
    }

    // stage 3: deterministic eval subset — 5 per language, stable across
    // two independent evaluations
    val s1 = TrainingData.groupSample(spark, dir).collect().toSeq
    val s2 = TrainingData.groupSample(spark, dir).collect().toSeq
    assert(s1 == s2, "stratified sample must be deterministic")
    assert(s1.groupBy(_.getString(0)).forall(_._2.size == 5))
  }
}
