package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout write/read path (builder brief: "bucketing for
  * co-located joins").
  *
  * At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
  * both sides bucketed by the join key into the same bucket count lets
  * Spark plan a sort-merge join with NO Exchange on either side — the
  * shuffle is paid once at write time and amortized over every subsequent
  * join/aggregation on that key. This is the layout decision §4.1 maps the
  * reference's FK B-tree indexes onto.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-join needs no sort either). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the co-location check used by specs and ExplainAudit. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Date/key-partitioned layout (the reference's `idx_match_date` B-tree
    * mapped to physical layout, SURVEY §4.1): facts written under
    * `partitionCol=value/` directories so equality/range predicates prune
    * entire partitions at planning time — the other half of the 100 TB
    * layout story next to bucketing. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** True when the scan of `df` prunes on a partition filter (and is
    * therefore not reading every partition directory). */
  def hasPartitionPruning(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty
  }

  /** Cost-based-optimizer feed: collect table + per-column statistics so
    * Catalyst's CBO (join reorder, stats-driven broadcast decisions) has
    * real row counts and NDVs instead of file-size guesses. At 100 TB this
    * runs as a scheduled post-ingest job per silver/gold table — stale
    * stats silently degrade join order, so it belongs next to the write,
    * which is why it lives here with the layout writers. */
  def analyzeTable(spark: SparkSession, table: String, columns: Seq[String]): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** Catalog row-count statistic for a table, if ANALYZE has run. */
  def tableRowCount(spark: SparkSession, table: String): Option[BigInt] =
    spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0).trim == "Statistics")
      .flatMap(r => "(\\d+) rows".r.findFirstMatchIn(r.getString(1))
        .map(m => BigInt(m.group(1))))
}
