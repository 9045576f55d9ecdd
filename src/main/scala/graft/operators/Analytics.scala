package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Gold-layer analytics queries (SURVEY.md §2.5–2.7) re-expressed over the
  * driver corpus (TESTDATA.md): customer≈player, nation≈team,
  * orders/lineitem≈match facts, events≈live stream.
  *
  * Numeric-determinism convention for oracle-checked outputs: monetary sums
  * go through `decimal(18,2)` (exact, order-independent) and are cast to
  * double at the end; derived ratios are single IEEE double operations over
  * those exact values, so Spark and the DuckDB oracle agree bitwise.
  */
object Analytics {

  /** Flagship — "top performers" (reference src/analytics/engine.py:336-352):
    * fact ⋈ dim ⋈ dim → activity floor → derived ratio → ordered top-k.
    * J1 + P2 + A3 + W1 in one plan.
    *
    * Scale: orders⋈customer shuffles on the key; nation is broadcast (25
    * rows — dims stay broadcast at any SF). Top-k is TakeOrderedAndProject.
    */
  def topSpenders(spark: SparkSession, dir: String, minOrders: Int = 5, k: Int = 20): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = Tables.nation(spark, dir)

    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))

    val agg = joined
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("order_cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spend"))
      .filter(col("order_cnt") >= minOrders)
      .withColumn("avg_spend", col("total_spend") / col("order_cnt"))
      .select("c_custkey", "c_name", "nation_name", "order_cnt", "total_spend", "avg_spend")

    Ranking.topK(agg, k, col("total_spend").desc, col("c_custkey").asc)
  }
}
