package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (dev loop only; the
    // driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    // Pair this output dir with its corpus: tools/compare.py refuses to
    // compare when the marker mismatches its own corpus argument (the
    // r12 stale-output-dir incident, now enforced by tooling). A SUBSET
    // run rewrites only its named outputs, so it must not re-stamp a dir
    // whose other outputs came from a different corpus (r13 ADVICE). A
    // FULL run rewrites everything it attempts, but "stamp then rewrite"
    // would leave a killed/partially-failed run's old-corpus outputs
    // under a fresh matching marker — so stale outputs are deleted
    // BEFORE stamping, making the marker truthful from the moment it
    // exists (a later crash leaves outputs absent, not silently stale).
    if (only.isDefined) tools.CorpusMarker.assertSubsetCompatible(sfDir, outDir)
    else tools.CorpusMarker.clearStaleOutputs(sfDir, outDir,
      SparkEntry.queries.keySet)
    tools.CorpusMarker.write(sfDir, outDir)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // name every query as it starts: any engine WARN between two of
      // these lines (codegen fallback, spill, broadcast timeout) is
      // attributable by log order alone — r12's Janino attribution
      // needed WARN-timestamp vs output-mtime forensics for lack of this
      System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
