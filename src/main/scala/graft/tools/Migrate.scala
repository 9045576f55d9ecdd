package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Key-format-break migration, shipped as a tool (r13 verdict, next #4).
  *
  * The break it migrates (documented at `functions/Parsing.scala`,
  * witnessed in EntityResolutionSpec): surrogate and external ids minted
  * before round 12 used `concat_ws` with a plain-space null sentinel, so
  * any natural key CONTAINING A NULL part mints a DIFFERENT id under
  * today's format (separate-input xxhash64 / NUL sentinel). A persisted
  * id-keyed table mixed naively with new batches silently duplicates
  * those entities — same natural key, one row per format. Until now the
  * prescribed fix ("re-mint every id from the natural keys before
  * mixing") was documentation plus a convergence witness; an operator
  * upgrading a deployment still hand-wrote it. This tool IS the
  * migration:
  *
  *   read old-format table → re-mint surrogate/external ids from the
  *   natural keys → [[graft.operators.Merge.parquetUpsert]] into a
  *   FRESH dir (old-format rows that collapse onto one re-minted id are
  *   deduplicated by the merge's last-writer-wins rank).
  *
  * The target dir must not already hold a table: migrating INTO
  * existing state would mix formats again — exactly the bug. The source
  * dir is never written; a failed run leaves it untouched and the
  * partial target is recognizable (parquetUpsert's commit-marker
  * protocol).
  *
  * Without a version column the keep-one winner is the merge's
  * content-hash tiebreak — deterministic given the row set (invariant
  * to partitioning and order), but arbitrary ACROSS distinct payloads;
  * pass `--version` when the table has a real recency column.
  *
  * Scale: one shuffle on the re-minted key (the merge), no driver-side
  * row movement — the same plan shape as every upsert in the engine.
  *
  * Usage (sbt or plain java, same as Verify/Bench):
  * {{{
  * runMain graft.tools.Migrate <oldTableDir> <newTableDir> <naturalKeys,comma>
  *     [--surrogate <col>] [--external <col>] [--version <cols,comma>]
  * }}}
  * With neither `--surrogate` nor `--external`, columns named
  * `entity_id` (surrogate) and `external_id` (external) are re-minted
  * when present — the engine's own naming convention.
  */
object Migrate {

  /** Re-mint ids from natural keys and merge-write to `newDir` (must be
    * fresh). Returns (rows read, entities written). */
  def migrate(spark: SparkSession, oldDir: String, newDir: String,
              naturalKeys: Seq[String], surrogateCol: Option[String],
              externalCol: Option[String],
              versionCols: Seq[String]): (Long, Long) = {
    require(naturalKeys.nonEmpty, "migration needs at least one natural key column")
    val target = new java.io.File(newDir)
    // an existing FILE target must refuse too: File.listFiles is null
    // for non-directories, and a null-tolerant emptiness check would
    // silently treat a data file as "fresh"
    require(!target.exists() ||
        (target.isDirectory && Option(target.listFiles()).forall(_.isEmpty)),
      s"target $newDir already holds data — migrating into existing state " +
        "would mix key formats again; use a fresh dir")
    val old = spark.read.parquet(oldDir)
    naturalKeys.foreach(k => require(old.columns.contains(k),
      s"natural key column $k not in ${old.columns.mkString(",")}"))
    // default convention: re-mint the engine's own id column names when
    // present — independently of any explicit flag for the OTHER column,
    // so a --surrogate-only invocation cannot silently leave a
    // conventionally-named external_id in the old format
    val surrogate = surrogateCol.orElse(
      Some("entity_id").filter(old.columns.contains))
    val external = externalCol.orElse(
      Some("external_id").filter(old.columns.contains))
    require(surrogate.nonEmpty || external.nonEmpty,
      "nothing to re-mint: no --surrogate/--external and no entity_id/" +
        "external_id column present")
    (surrogate ++ external).foreach(c => require(old.columns.contains(c),
      s"id column $c not in ${old.columns.mkString(",")}"))
    val keyCols = naturalKeys.map(col)
    var reminted = old
    surrogate.foreach { c => reminted = reminted.withColumn(c,
      graft.functions.Parsing.surrogateId(keyCols: _*)) }
    external.foreach { c => reminted = reminted.withColumn(c,
      graft.functions.Parsing.externalId(keyCols: _*)) }
    // merge on the re-minted id (a pure function of the natural keys, so
    // old-format duplicates of one logical entity now share a key and
    // the merge's rank-dedup keeps exactly one)
    val mergeKey = (surrogate orElse external).get
    val rowsIn = old.count()
    graft.operators.Merge.parquetUpsert(
      spark, reminted, newDir, Seq(mergeKey), versionCols)
    (rowsIn, spark.read.parquet(newDir).count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: Migrate <oldTableDir> <newTableDir> <naturalKeys,comma> " +
        "[--surrogate <col>] [--external <col>] [--version <cols,comma>]")
    val (oldDir, newDir) = (args(0), args(1))
    val naturalKeys = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def flag(name: String): Option[String] = {
      val i = args.indexOf(name)
      if (i < 0) None
      else { require(i + 1 < args.length, s"$name needs a value"); Some(args(i + 1)) }
    }
    val versions = flag("--version").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.local(cpus)
    try {
      val (rowsIn, entities) = migrate(spark, oldDir, newDir, naturalKeys,
        flag("--surrogate"), flag("--external"), versions)
      println(s"[migrate] $rowsIn old-format rows -> $entities entities " +
        s"(${rowsIn - entities} duplicate rows collapsed) in $newDir")
    } finally spark.stop()
  }
}
