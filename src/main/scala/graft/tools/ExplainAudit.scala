package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for every SparkEntry query and
  * flag scale smells — missing parquet filter pushdown, unexpected
  * cartesian products, full-scan sorts where a top-k was intended.
  * Usage: runMain graft.tools.ExplainAudit <sfDir> [namePrefix]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val prefix = if (args.length > 1) args(1) else ""
    val spark = graft.GraftSession.local(cpus = 8)
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "GlobalSort(no topk)" ->
            (plan.contains("Sort [") && !plan.contains("TakeOrderedAndProject")
              && plan.contains("Exchange rangepartitioning")),
          "NoWholeStageCodegen" -> !plan.contains("WholeStageCodegen"))
          .collect { case (s, true) => s }
        println(s"\n========== $name ${if (smells.isEmpty) "" else "SMELLS: " + smells.mkString(",")}")
        df.explain("formatted")
      }
    spark.stop()
  }
}
