package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev tool: write `.explain("formatted")` for named queries to
  * `<outDir>/<name>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/`. Uses the shared static
  * view (AQE off, output sort kept — the files should show the plan the
  * bench executes, including the final sort).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q_a,q_b,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val iso = ExplainAudit.staticSession(
      graft.GraftSession.local(cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt))
    iso.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(iso, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    iso.stop()
  }
}
