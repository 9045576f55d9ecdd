package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A sort can give locality on ONE leading column; a Z-order sort gives
  * bounded locality on ALL clustered columns at once by interleaving the
  * bits of each column's normalized bucket value. Files/row-groups then
  * cover small hyper-rectangles of the key space, so parquet min/max
  * statistics prune scans for predicates on ANY clustered column — the
  * single biggest read-path lever for a 100 TB fact table queried along
  * several dimensions (the reference's B-tree index set,
  * database/schema.sql:1051-1095, serves exactly this multi-predicate
  * access pattern; partition pruning + Z-order is the lakehouse
  * equivalent).
  *
  * Scale shape: one aggregation pass for per-column [min, max] (a handful
  * of doubles to the driver — layout parameters, like IVF centroids), a
  * pure bit-interleave expression per row, then `repartitionByRange` +
  * `sortWithinPartitions` on the z-value (parallel range sort, no
  * single-partition stage). Bucketization is linear min-max here;
  * production swaps in range-sampled boundaries for heavily skewed
  * columns (the same reservoir sampler repartitionByRange already uses).
  */
object Layout {

  /** Bits per dimension (k columns × bits ≤ 63 to stay in a signed long). */
  val DefaultBits = 12

  /** Numeric view of a cluster column: timestamps → epoch seconds,
    * dates → epoch days, numerics → double. */
  private def numericize(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(name).dataType match {
      case _: TimestampType | _: TimestampNTZType =>
        col(name).cast("timestamp").cast("double")
      case _: DateType =>
        datediff(col(name), to_date(lit("1970-01-01"))).cast("double")
      case _ => col(name).cast("double")
    }
  }

  /** Morton z-value over `cols`, each normalized to `bits`-bit buckets by
    * the provided [lo, hi] ranges. Null sorts first (bucket 0). */
  def zvalue(cols: Seq[Column], ranges: Seq[(Double, Double)],
             bits: Int = DefaultBits): Column = {
    val k = cols.length
    require(k >= 2, "z-order needs at least 2 columns")
    require(k * bits <= 63, s"$k cols x $bits bits exceeds a signed long")
    val maxBucket = (1L << bits) - 1
    val buckets = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
          floor((c.cast("double") - lit(lo)) / lit(span) * maxBucket).cast("long"),
          lit(0L)), lit(maxBucket))
    }
    // interleave: output bit (i*k + c) = bit i of column c's bucket
    val terms = for {
      i <- 0 until bits
      (b, c) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(coalesce(b, lit(0L)), i).bitwiseAND(lit(1L)),
      i * k + c)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` by the Z-order of `clusterCols`: range-partition into
    * `numFiles` splits on the z-value and sort within each. The z column
    * is dropped after ordering — layout is carried by row order, not a
    * schema change. Write the result with one file per partition
    * (`df.write.parquet`) to materialize the layout. */
  def zorder(df: DataFrame, clusterCols: Seq[String], numFiles: Int,
             bits: Int = DefaultBits): DataFrame = {
    val statAggs = clusterCols.flatMap(c => Seq(
      min(numericize(df, c)).as(s"__lo_$c"),
      max(numericize(df, c)).as(s"__hi_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    val ranges = clusterCols.map { c =>
      (stats.getAs[Double](s"__lo_$c"), stats.getAs[Double](s"__hi_$c"))
    }
    df.withColumn("__z",
        zvalue(clusterCols.map(c => numericize(df, c)), ranges, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** q_zorder: the Morton code of every lineitem row over
    * (l_quantity, l_extendedprice) with exact global min/max ranges —
    * the arithmetic substrate of `zorder`, checkable bit-for-bit across
    * engines: the bucketization is plain IEEE double arithmetic in a
    * fixed operation order and the interleave plain integer bit ops, so
    * a SQL replay (clamp → floor → unrolled shift/mask terms) must agree
    * exactly. The min/max collect is a layout parameter (4 doubles),
    * like `zorder`'s own range pass. */
  def zvalueQuery(spark: org.apache.spark.sql.SparkSession,
                  dir: String): DataFrame = {
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"))
    val stats = li.agg(min("q"), max("q"), min("p"), max("p")).head()
    val ranges = Seq((stats.getDouble(0), stats.getDouble(1)),
      (stats.getDouble(2), stats.getDouble(3)))
    li.select(col("l_orderkey"), col("l_linenumber"),
        zvalue(Seq(col("q"), col("p")), ranges).as("z"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Per-split locality report for a clustered frame: for each partition,
    * the normalized min/max span of every probe column (0 = perfectly
    * local, 1 = the split covers the full value range — nothing prunable).
    * This is the measurable form of the row-group pruning benefit: a
    * predicate on a probe column skips every split whose [min, max]
    * misses it. */
  def localityReport(df: DataFrame, probeCols: Seq[String]): DataFrame = {
    val globalAggs = probeCols.flatMap(c => Seq(
      min(numericize(df, c)).as(s"lo_$c"),
      max(numericize(df, c)).as(s"hi_$c")))
    val global = df.agg(globalAggs.head, globalAggs.tail: _*).head()
    val aggs = probeCols.map { c =>
      val span = math.max(
        global.getAs[Double](s"hi_$c") - global.getAs[Double](s"lo_$c"),
        java.lang.Double.MIN_NORMAL)
      ((max(numericize(df, c)) - min(numericize(df, c))) / span)
        .as(s"frac_$c")
    }
    val allAggs = count(lit(1)).as("rows") +: aggs
    df.withColumn("__split", spark_partition_id())
      .groupBy("__split")
      .agg(allAggs.head, allAggs.tail: _*)
  }
}
