package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.Shims

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for every SparkEntry query and
  * flag scale smells — missing parquet filter pushdown, unexpected
  * cartesian products, full-scan sorts where a top-k was intended,
  * queries with no whole-stage-codegen span at all.
  * Usage: runMain graft.tools.ExplainAudit <sfDir> [namePrefix]
  *
  * Two measurement details matter (both bit this tool before):
  *  - AQE prints the INITIAL plan, which carries no WholeStageCodegen
  *    wrapping (codegen is applied per materialized query stage), so the
  *    codegen smell fired on everything. The audit session disables AQE —
  *    the statically planned tree is the right object for pushdown /
  *    codegen-span inspection.
  *  - Every oracle query ends in a deterministic output `orderBy` (the
  *    hash-compare needs a total order), which IS a global sort by
  *    design. The audit strips the outermost logical Sort first, so the
  *    GlobalSort smell only fires on INTERIOR sorts — the ones that
  *    would actually rewrite a top-k into a full cluster sort at 100 TB.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val prefix = if (args.length > 1) args(1) else ""
    val spark = graft.GraftSession.builder(cpus = 8)
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val audited = df.queryExecution.optimizedPlan match {
          case s: Sort if s.global => Shims.ofRows(spark, s.child)
          case _ => df
        }
        val plan = audited.queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "GlobalSort(no topk)" ->
            (plan.contains("Sort [") && !plan.contains("TakeOrderedAndProject")
              && plan.contains("Exchange rangepartitioning")),
          // codegen spans print as "*(n)" operator prefixes in toString
          // (the literal "WholeStageCodegen" label appears only in
          // explain("formatted"))
          "NoWholeStageCodegen" -> !plan.contains("*("))
          .collect { case (s, true) => s }
        println(s"\n========== $name ${if (smells.isEmpty) "" else "SMELLS: " + smells.mkString(",")}")
        audited.explain("formatted")
      }
    spark.stop()
  }
}
