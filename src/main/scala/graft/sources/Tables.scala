package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's single load boundary (`load_data`,
  * reference src/analytics/engine.py:262-284) — but instead of SQL→pandas
  * materialization, each accessor returns a lazy DataFrame so Catalyst sees
  * the whole plan (scan → ... → sink) and can push filters/prune columns
  * into the parquet scan.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the API
  * (name → DataFrame) stays identical, so queries are layout-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * (PARQUET_TYPE_ILLEGAL). Read it as raw Long nanos and derive `ts_utc`
    * (µs-truncated TimestampType) — matching how DuckDB (the oracle) reads
    * the same file (ns truncated to µs). Raw `ts` stays for exact ordering.
    *
    * The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/TestSpark
    * all set it); this accessor only *checks* the flag — mutating session
    * conf from inside a table accessor would leak into unrelated reads.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")
    load(spark, dir, "events")
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
