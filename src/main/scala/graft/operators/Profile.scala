package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Column-level data profiling (q_profile) — the Deequ/Great-Expectations
  * "dataset statistics" pass every ingestion pipeline runs before trusting
  * a new drop: per column, row count, null count, exact distinct count,
  * and min/max. The reference eyeballs exactly these via ad-hoc DESCRIBE
  * queries during scraper debugging; here it is one distributed job whose
  * output is itself a queryable table.
  *
  * Values are profiled through a canonical VARCHAR cast so one result
  * schema covers heterogenous column types (min/max are therefore
  * LEXICOGRAPHIC on the string form — documented in the output, exact
  * across engines for the integer/string columns profiled here; doubles
  * are deliberately excluded since float→string formatting differs by
  * engine).
  *
  * Scale shape: ONE scan of the table fans each row into |cols| slim
  * (col_name, val) rows, then a two-level aggregation: level 1 groups by
  * (col_name, val) — map-side combining collapses repeated values before
  * the shuffle, and the exact distinct count comes without an Expand
  * plan (the no-Expand rule the rest of the engine follows); level 2
  * rolls up per column. Shuffle cardinality is Σ per-column distinct
  * values, not rows×cols.
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_rows, n_nulls, n_distinct,
    * min_val, max_val), one row per profiled column. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols
      .map(c => s"'$c', cast(`$c` as string)")
      .mkString(", ")
    val unpivoted = df.select(
      expr(s"stack(${cols.size}, $stackArgs) as (col_name, val)"))
    val perValue = unpivoted
      .groupBy("col_name", "val")
      .agg(count(lit(1)).as("cnt"))
    perValue
      .groupBy("col_name")
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("val").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
        count(col("val")).as("n_distinct"), // count(col) skips the null group
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
      .orderBy("col_name")
  }

  /** q_profile: profile lineitem's integer + string columns. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    columnProfile(
      Tables.lineitem(spark, dir),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus"))
}
