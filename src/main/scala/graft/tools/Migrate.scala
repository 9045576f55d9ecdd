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
  *   natural keys → last-writer-wins rank-dedup on the re-minted id
  *   (the upsert sinks' exact winner semantics: version order, then a
  *   whole-row content-hash tiebreak) → one staged write promoted by a
  *   single rename into a FRESH dir, stamped with the engine's commit
  *   marker so downstream [[graft.operators.Merge.parquetUpsert]]
  *   calls see a committed table.
  *
  * The target dir must not already hold a table: migrating INTO
  * existing state would mix formats again — exactly the bug. The source
  * dir is never written; a failed run leaves it untouched, and the
  * target NEVER exists torn — the table is staged in a sibling dir,
  * commit-marked after the write returns, and promoted with one rename
  * (a killed run leaves only a staging dir the next run overwrites).
  *
  * Without a version column the keep-one winner is the merge's
  * content-hash tiebreak — deterministic given the row set (invariant
  * to partitioning and order), but arbitrary ACROSS distinct payloads;
  * pass `--version` when the table has a real recency column.
  *
  * Scale: one shuffle on the re-minted key (the rank-dedup) and one
  * write pass, no driver-side row movement and no intermediate
  * materialization — the row counts it reports are parquet-footer
  * reads, not data scans.
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
    // Resolve the target through Hadoop's FileSystem, exactly as the
    // write below will: a java.io.File guard is blind to scheme-
    // prefixed paths (hdfs://, s3a://, file:/), and a blind guard would
    // merge INTO an existing remote table — re-creating the very
    // format-mixing duplication this tool exists to eliminate. An
    // existing FILE target refuses too (it is data, not a fresh dir).
    val target = new org.apache.hadoop.fs.Path(newDir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(target) ||
        (fs.getFileStatus(target).isDirectory && fs.listStatus(target).isEmpty),
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
    // Dedup on the re-minted id (a pure function of the natural keys,
    // so old-format duplicates of one logical entity now share a key)
    // with parquetUpsert's EXACT winner semantics — version order, then
    // a whole-row content-hash tiebreak — but written DIRECTLY: the
    // target is fresh by construction, so the upsert's read-merge-swap
    // machinery (and its eager localCheckpoint, a micro-batch device
    // that would materialize the whole table to executor storage) buys
    // nothing here. One shuffle on the key, one write pass; the counts
    // are parquet-footer reads, not data scans.
    val mergeKey = (surrogate orElse external).get
    val tiebreak = org.apache.spark.sql.functions.xxhash64(
      org.apache.spark.sql.functions.struct(reminted.columns.map(col): _*))
    // CRASH-SAFE promote: the deduped table is fully written to a
    // staging sibling, the commit marker is created inside it AFTER the
    // parquet job returns, and only then does one rename make it the
    // target — so the target either does not exist or is complete and
    // marked. A killed migration leaves a torn STAGING dir that the
    // next run simply overwrites, and the fresh-target guard still
    // passes. (A direct write to the target would leave a torn table
    // that downstream parquetUpsert reads as live state — the live-dir
    // read path has no completeness check; only .next staging dirs do.)
    val staging = new org.apache.hadoop.fs.Path(newDir + ".inprogress")
    if (fs.exists(staging)) fs.delete(staging, true)
    graft.operators.Ranking.latestPerKey(
        reminted, Seq(col(mergeKey)), versionCols.map(col) :+ tiebreak)
      .write.mode("overwrite").parquet(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging,
      graft.operators.Merge.CommitMarker), true).close()
    // the guard proved the target absent or an EMPTY dir; an empty dir
    // must be removed first or rename semantics nest staging inside it
    if (fs.exists(target))
      require(fs.delete(target, false),
        s"could not remove empty target $newDir before the promote")
    require(fs.rename(staging, target),
      s"rename($staging -> $target) returned false — staged table left " +
        "in place, target untouched")
    (old.count(), spark.read.parquet(newDir).count())
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
