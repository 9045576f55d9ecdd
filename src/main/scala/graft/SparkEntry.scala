package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an implemented operator from SURVEY.md §2 with
  * a matching DuckDB oracle in `oracleSql` (same column names, same
  * deterministic ordering) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topSpenders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_top_spenders" -> ((s, dir) => Analytics.topSpenders(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_top_spenders" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
        |       count(*) AS order_cnt,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spend
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2, 3
        |HAVING count(*) >= 5
        |ORDER BY total_spend DESC, c.c_custkey ASC
        |LIMIT 20""".stripMargin
  )
}
