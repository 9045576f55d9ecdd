package graft

import org.apache.spark.sql.functions._

/** End-to-end witness for `tools.Migrate` (r13 verdict, next #4): the
  * key-format-break migration runs as a tool on a REAL old-format
  * parquet fixture, not just as the hand-written convergence witness in
  * EntityResolutionSpec. Old format = pre-round-12 ids (concat_ws with a
  * plain-space null sentinel); the break only bites natural keys with a
  * null part. */
class MigrateSpec extends SparkSpec {
  import org.apache.spark.sql.Column

  // the pre-round-12 mint formats, reconstructed for the fixture
  private def oldSurrogate(parts: Column*): Column =
    xxhash64(concat_ws("_",
      parts.map(p => coalesce(p.cast("string"), lit(" "))): _*))
  private def oldExternal(parts: Column*): Column =
    sha2(concat_ws("_",
      parts.map(p => coalesce(p.cast("string"), lit(" "))): _*), 256)

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("Migrate accepts an existing-but-EMPTY target dir") {
    // the fresh-target guard deliberately allows an empty dir (mkdir'd
    // ahead by an operator); the write mode must not then refuse it
    import spark.implicits._
    val oldDir = freshDir("graft_migrate_emptyok")
    Seq(("A", "B")).toDF("name", "country")
      .withColumn("entity_id", oldSurrogate(col("name"), col("country")))
      .write.parquet(oldDir)
    val emptyTarget = java.nio.file.Files
      .createTempDirectory("graft_migrate_emptydir").toString
    val (in, out) = graft.tools.Migrate.migrate(spark, oldDir, emptyTarget,
      Seq("name", "country"), None, None, Nil)
    assert((in, out) == (1L, 1L))
  }

  test("a torn staging dir from a killed migration is overwritten by a re-run " +
      "and the target never exists torn") {
    import spark.implicits._
    val oldDir = freshDir("graft_migrate_torn")
    Seq(("A", "B")).toDF("name", "country")
      .withColumn("entity_id", oldSurrogate(col("name"), col("country")))
      .write.parquet(oldDir)
    val newDir = freshDir("graft_migrate_torn_out")
    // simulate a kill mid-write: a partial, markerless staging dir
    val staging = new java.io.File(newDir + ".inprogress")
    assert(staging.mkdirs())
    java.nio.file.Files.writeString(
      staging.toPath.resolve("part-torn.parquet"), "garbage")
    val (in, out) = graft.tools.Migrate.migrate(spark, oldDir, newDir,
      Seq("name", "country"), None, None, Nil)
    assert((in, out) == (1L, 1L))
    assert(!staging.exists(), "staging dir should have been promoted away")
    assert(new java.io.File(newDir, "_GRAFT_COMMIT").exists(),
      "promoted table missing the commit marker")
    assert(spark.read.parquet(newDir).count() == 1)
  }

  test("Migrate re-mints both id columns and converges with new batches") {
    import spark.implicits._
    val oldDir = freshDir("graft_migrate_old")
    val rows = Seq(("Arsenal", Option("EN")), ("Ajax", Option.empty[String]))
      .toDF("name", "country")
    rows.withColumn("entity_id", oldSurrogate(col("name"), col("country")))
      .withColumn("external_id", oldExternal(col("name"), col("country")))
      .write.parquet(oldDir)

    val newDir = freshDir("graft_migrate_new")
    val (rowsIn, entities) = graft.tools.Migrate.migrate(spark, oldDir,
      newDir, Seq("name", "country"), None, None, Nil)
    assert((rowsIn, entities) == (2L, 2L))

    // the fresh-written table carries the engine's commit marker, so
    // downstream parquetUpsert calls see a committed dir
    assert(new java.io.File(newDir, "_GRAFT_COMMIT").exists(),
      "migrated table missing the commit marker")

    // every persisted id equals a fresh mint from its own natural key
    val migrated = spark.read.parquet(newDir)
    val mismints = migrated.filter(
      col("entity_id") =!= graft.functions.Parsing.surrogateId(col("name"), col("country")) ||
      col("external_id") =!= graft.functions.Parsing.externalId(col("name"), col("country")))
    assert(mismints.isEmpty, mismints.collect().mkString(","))

    // the convergence the migration exists for: a new-format batch for
    // ("Ajax", null) upserts ONTO the migrated row instead of
    // duplicating it (unmigrated, this is the silent-duplicate bug)
    val batch = Seq(("Ajax", Option.empty[String]), ("Hansa", Option("DE")))
      .toDF("name", "country")
      .withColumn("entity_id",
        graft.functions.Parsing.surrogateId(col("name"), col("country")))
      .withColumn("external_id",
        graft.functions.Parsing.externalId(col("name"), col("country")))
    graft.operators.Merge.parquetUpsert(spark, batch, newDir,
      Seq("entity_id"), Nil)
    val after = spark.read.parquet(newDir)
    assert(after.count() == 3, "expected Arsenal + Ajax + Hansa")
    assert(after.filter(col("name") === "Ajax").count() == 1,
      "the null-key entity duplicated — migration did not converge")
  }

  test("Migrate collapses rows already duplicated by the format mix, " +
      "newest version winning") {
    import spark.implicits._
    // a table that already absorbed both formats: ("Ajax", null) exists
    // twice — old-format id with version 1, new-format id with version 2
    val oldDir = freshDir("graft_migrate_dup")
    val v1 = Seq(("Ajax", Option.empty[String], 1L, "stale")).toDF("name", "country", "v", "payload")
      .withColumn("entity_id", oldSurrogate(col("name"), col("country")))
    val v2 = Seq(("Ajax", Option.empty[String], 2L, "fresh")).toDF("name", "country", "v", "payload")
      .withColumn("entity_id",
        graft.functions.Parsing.surrogateId(col("name"), col("country")))
    v1.unionByName(v2).write.parquet(oldDir)

    val newDir = freshDir("graft_migrate_dedup")
    val (rowsIn, entities) = graft.tools.Migrate.migrate(spark, oldDir,
      newDir, Seq("name", "country"), Some("entity_id"), None, Seq("v"))
    assert((rowsIn, entities) == (2L, 1L),
      s"duplicate rows not collapsed: $rowsIn in, $entities out")
    val kept = spark.read.parquet(newDir).collect().head
    assert(kept.getAs[String]("payload") == "fresh",
      "last-writer-wins should keep the higher-version row")
  }

  test("Migrate refuses a non-fresh target and a missing natural key") {
    import spark.implicits._
    val oldDir = freshDir("graft_migrate_guard")
    Seq(("A", "B")).toDF("name", "country")
      .withColumn("entity_id", oldSurrogate(col("name"), col("country")))
      .write.parquet(oldDir)
    // target already holds data → refuse (migrating into existing state
    // would mix formats again)
    val e = intercept[IllegalArgumentException] {
      graft.tools.Migrate.migrate(spark, oldDir, oldDir,
        Seq("name", "country"), None, None, Nil)
    }
    assert(e.getMessage.contains("fresh dir"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.tools.Migrate.migrate(spark, oldDir, freshDir("graft_migrate_g2"),
        Seq("name", "nope"), None, None, Nil)
    }
    assert(e2.getMessage.contains("natural key column nope"), e2.getMessage)
    // an existing FILE target must refuse too (File.listFiles is null
    // for non-directories — a null-tolerant check would pass it)
    val fileTarget = java.nio.file.Files
      .createTempFile("graft_migrate_file", ".parquet")
    val e3 = intercept[IllegalArgumentException] {
      graft.tools.Migrate.migrate(spark, oldDir, fileTarget.toString,
        Seq("name", "country"), None, None, Nil)
    }
    assert(e3.getMessage.contains("fresh dir"), e3.getMessage)
    // the guard resolves through Hadoop's FileSystem: a scheme-prefixed
    // path to existing data must refuse too (a java.io.File check is
    // blind to "file:/..." and every remote scheme)
    val e4 = intercept[IllegalArgumentException] {
      graft.tools.Migrate.migrate(spark, oldDir, "file:" + oldDir,
        Seq("name", "country"), None, None, Nil)
    }
    assert(e4.getMessage.contains("fresh dir"), e4.getMessage)
  }
}
