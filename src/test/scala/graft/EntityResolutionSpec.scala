package graft

import graft.functions.Normalize
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyRatio matches thefuzz.fuzz.ratio reference values") {
    val r = evalExpr(
      Normalize.fuzzyRatio(lit("new york mets"), lit("new york mets")),
      Normalize.fuzzyRatio(lit("new york mets"), lit("new york meats")),
      Normalize.fuzzyRatio(lit("abc"), lit("xyz")))
    assert(r.getInt(0) == 100)
    assert(r.getInt(1) == 96) // thefuzz.fuzz.ratio reference value
    assert(r.getInt(2) == 0)
  }

  test("normalizeForMatching strips accents and punctuation") {
    val r = evalExpr(
      Normalize.normalizeForMatching(lit("José  Álvarez-López")),
      Normalize.normalizeForMatching(lit("  FC   Köln!! ")))
    assert(r.getString(0) == "jose alvarez lopez")
    assert(r.getString(1) == "fc koln")
  }

  test("termLookup maps synonyms through normalization") {
    val mapping = Map("torwart" -> "GK", "goalkeeper" -> "GK", "portero" -> "GK")
    val r = evalExpr(
      Normalize.termLookup(lit("Torwart"), mapping),
      Normalize.termLookup(lit("GOALKEEPER "), mapping),
      Normalize.termLookup(lit("striker"), mapping, lit("UNK")))
    assert(r.getString(0) == "GK" && r.getString(1) == "GK" && r.getString(2) == "UNK")
  }

  test("TermConfig: JSON vocabulary loads, normalizes, and feeds termLookup") {
    import graft.functions.TermConfig
    val dir = java.nio.file.Files.createTempDirectory("graft_terms")
    java.nio.file.Files.writeString(dir.resolve("terms.json"),
      """{"category":"positions","code":"GK","synonyms":["goalkeeper","Torwart","Portero!"]}
        |{"category":"positions","code":"FW","synonyms":["striker","Stürmer"]}
        |{"category":"nationalities","code":"DE","synonyms":["Germany","Deutschland"]}""".stripMargin)
    val cfg = TermConfig.load(spark, dir.toString)
    assert(cfg("positions")("torwart") == "GK")
    assert(cfg("positions")("portero") == "GK")   // punctuation stripped
    assert(cfg("positions")("sturmer") == "FW")   // accent folded
    assert(cfg("nationalities")("deutschland") == "DE")
    val r = evalExpr(
      Normalize.termLookup(lit("  TORWART "), cfg("positions")),
      Normalize.termLookup(lit("Stürmer"), cfg("positions")))
    assert(r.getString(0) == "GK" && r.getString(1) == "FW")
    assert(TermConfig.StaticFallback("positions")("goalkeeper") == "GK")
  }

  test("resolve: three-way split (auto / review-or-match / create)") {
    val entities = Seq(
      (1L, "Borussia Dortmund", "DE"),
      (2L, "Bayern München", "DE"),
      (3L, "Real Madrid", "ES"))
      .toDF("id", "name", "country")
    val staged = Seq(
      ("Borussia Dortmund", "DE"),  // exact -> matched (100)
      ("Borussia Dortmond", "DE"),  // 1 typo -> matched (~94)
      ("Atletico Bilbao", "ES"),    // unrelated -> create
      ("FC Basel", "CH"))           // empty block -> create
      .toDF("name", "country")

    val res = EntityResolution.resolve(staged, entities,
      nameCol = "name", blockCol = "country", idCol = "id")

    val matchedNames = res.matched.select("name").as[String].collect().toSet
    val createNames = res.create.select("name").as[String].collect().toSet
    assert(matchedNames.contains("Borussia Dortmund"))
    assert(matchedNames.contains("Borussia Dortmond"))
    assert(createNames.contains("Atletico Bilbao"))
    assert(createNames.contains("FC Basel"))
    val exact = res.matched.filter(col("name") === "Borussia Dortmund")
      .select("match_score").as[Int].head()
    assert(exact == 100)
  }

  test("resolve: distinct staged rows with identical normalized names both survive") {
    val entities = Seq((1L, "Bayern München", "DE")).toDF("id", "name", "country")
    // Both normalize to "bayern munchen" but are distinct staged records
    // (different scrape_src); each must land in exactly one output.
    val staged = Seq(
      ("Bayern München", "DE", "tm"),
      ("bayern munchen!", "DE", "fbref"),
      ("Hansa Rostock", "DE", "tm"))
      .toDF("name", "country", "scrape_src")

    val res = EntityResolution.resolve(staged, entities,
      nameCol = "name", blockCol = "country", idCol = "id")
    val total = res.matched.count() + res.review.count() + res.create.count()
    assert(total == 3, s"every staged row lands in exactly one output (got $total)")
    val matchedSrc = res.matched.select("scrape_src").as[String].collect().toSet
    assert(matchedSrc == Set("tm", "fbref"))
    // caller-supplied uid path gives the same split
    val withUid = staged.withColumn("rec_id", monotonically_increasing_id())
    val res2 = EntityResolution.resolve(withUid, entities,
      nameCol = "name", blockCol = "country", idCol = "id",
      uidCol = Some("rec_id"))
    assert(res2.matched.count() == 2 && res2.create.count() == 1)
    assert(res2.matched.columns.contains("rec_id"))
  }

  test("resolve: uid-less pinning goes through the persisted-silver path when configured") {
    val entities = Seq((1L, "Borussia Dortmund", "DE")).toDF("id", "name", "country")
    val staged = Seq(
      ("Borussia Dortmund", "DE"),
      ("Hansa Rostock", "DE"))
      .toDF("name", "country")
    val dir = java.nio.file.Files.createTempDirectory("graft_silver_er").toString
    spark.conf.set("spark.graft.silver.dir", dir)
    try {
      val res = EntityResolution.resolve(staged, entities,
        nameCol = "name", blockCol = "country", idCol = "id")
      assert(res.matched.count() == 1 && res.create.count() == 1)
      val silverTables = new java.io.File(dir).listFiles().map(_.getName).toSet
      // name carries a per-call unique suffix (overwrite-safety)
      assert(silverTables.exists(_.startsWith("entity_resolution_staged_uids_")),
        s"uid pinning bypassed Silver.materialize; silver dir has $silverTables")
    } finally spark.conf.unset("spark.graft.silver.dir")
  }

  test("surrogate key-format break: the prescribed re-mint migration converges") {
    // Migration witness for the documented KEY-FORMAT BREAK
    // (functions/Parsing.scala): surrogates minted pre-round-12 used
    // concat_ws with a plain-space null sentinel; a get-or-create table
    // persisted under that format, mixed naively with new batches,
    // silently duplicates any entity whose natural key contains a null
    // (same key, different id per format). The prescribed fix — re-mint
    // every surrogate from the natural keys before mixing — must
    // converge to exactly one entity per natural key and be a fixed
    // point under re-merge.
    import graft.functions.Parsing
    def oldSurrogate(parts: org.apache.spark.sql.Column*) = // pre-r12 format
      xxhash64(concat_ws("_",
        parts.map(p => coalesce(p.cast("string"), lit(" "))): _*))
    val oldTable = Seq(("Arsenal", Option("EN")), ("Ajax", Option.empty[String]))
      .toDF("name", "country")
      .withColumn("entity_id", oldSurrogate(col("name"), col("country")))
    val newBatch = Seq(("Ajax", Option.empty[String]), ("Hansa Rostock", Option("DE")))
      .toDF("name", "country")
      .withColumn("entity_id", Parsing.surrogateId(col("name"), col("country")))
    // the bug when the migration is skipped: ("Ajax", null) carries a
    // DIFFERENT id in each format, so id-keyed get-or-create duplicates it
    val naive = oldTable.unionByName(newBatch).dropDuplicates("entity_id")
    assert(naive.filter(col("name") === "Ajax").count() == 2,
      "expected the unmigrated mix to expose the duplicate — formats agree?")
    // prescribed migration: re-mint from natural keys, then merge
    val rebuilt = oldTable.withColumn("entity_id",
      Parsing.surrogateId(col("name"), col("country")))
    val merged = rebuilt.unionByName(newBatch).dropDuplicates("entity_id")
    assert(merged.count() == 3, "one entity per natural key after rebuild")
    assert(merged.select("name", "country").distinct().count() == 3)
    // fixed point: re-merging the same batch changes nothing, and every
    // persisted id equals a fresh mint from its own natural key
    assert(merged.unionByName(newBatch).dropDuplicates("entity_id").count() == 3)
    val idsAgree = merged.select(
      (Parsing.surrogateId(col("name"), col("country")) === col("entity_id")).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(idsAgree, "migrated ids must equal fresh mints from natural keys")
  }
}
