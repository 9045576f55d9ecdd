package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational reshaping — the wide↔long pivots and set operations the
  * reference does in pandas between query and chart
  * (`analytics/reports.py` builds wide metric dicts per entity; `P7`-ish
  * list comprehensions diff id sets). Here they are engine operators:
  * `unpivot` is a Generate (no shuffle — each wide row emits its long
  * rows locally), and INTERSECT/EXCEPT are one hash aggregate each, the
  * same distributed shape as `q_union_distinct`.
  */
object Reshape {

  /** Wide metric columns → long (id, metric, value) rows. */
  def melt(df: DataFrame, ids: Seq[String], metrics: Seq[String],
           metricCol: String = "metric", valueCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, metrics.map(col).toArray, metricCol, valueCol)

  /** q_unpivot: the per-nation entity counts as a wide aggregate, melted
    * to (nation, metric, value). Oracle: DuckDB's independent UNPIVOT.
    * Counts only — no float witnesses needed. */
  def unpivotQuery(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("customers"))
    val supp = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("suppliers"))
    val wide = Tables.nation(spark, dir).select(col("n_nationkey").as("nk"),
        col("n_name").as("nation"))
      .join(cust, Seq("nk"), "left")
      .join(supp, Seq("nk"), "left")
      .select(col("nation"), coalesce(col("customers"), lit(0L)).as("customers"),
        coalesce(col("suppliers"), lit(0L)).as("suppliers"))
    melt(wide, Seq("nation"), Seq("customers", "suppliers"))
      .orderBy("nation", "metric")
  }

  /** q_set_ops: customer keys ordering in BOTH halves of 1995
    * (INTERSECT) and in H1 but never H2 (EXCEPT), tagged and unioned —
    * Spark's `intersect`/`except` (distinct set semantics, one hash
    * aggregate per side) against DuckDB's native INTERSECT/EXCEPT. */
  def setOpsQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("ck"),
      year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
    val h1 = o.filter(col("y") === 1995 && col("m") <= 6).select("ck")
    val h2 = o.filter(col("y") === 1995 && col("m") > 6).select("ck")
    h1.intersect(h2).select(col("ck"), lit("both").as("tag"))
      .unionByName(h1.except(h2).select(col("ck"), lit("h1_only").as("tag")))
      .orderBy("ck", "tag")
  }
}
