package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pareto-frontier (skyline) operator — the "best tradeoff" query the
  * reference answers with hand-written ORDER BY cascades over player/market
  * stats (`database.py:1253-1306` top-N rankings; a skyline is the
  * rank-free generalization: every row not dominated on all criteria).
  *
  * Two implementations, spec-asserted identical:
  *
  *  - [[skyline]] — generic d-dimension, two-phase: per-partition local
  *    skyline via `mapPartitions` (a dominance buffer; a partition's local
  *    skyline is a superset of that partition's contribution to the global
  *    skyline, so the union of local skylines contains the global one),
  *    then the same buffer once more over the candidate union in a single
  *    partition. The candidate volume is O(skyline size × partitions), not
  *    O(n) — at 100 TB phase 1 does all the data-volume work
  *    embarrassingly parallel (narrow, no shuffle) and phase 2 sees
  *    kilobytes. This is the registered-query path.
  *  - [[skyline2d]] — 2-D declarative variant: a row survives iff it holds
  *    the min y within its x group (duplicates both survive — dominance
  *    needs one strict inequality) and every strictly-smaller-x row has a
  *    larger y. "Strictly smaller x" is a dense_rank prefix frame (a value
  *    `rangeBetween(-1)` would be an x−1.0 OFFSET on the double — wrong
  *    semantics). Global-sort window: fine at dim-table scale, the generic
  *    path is the big-data one.
  *
  * All dimensions are minimized; negate a column to maximize it.
  */
object Skyline {

  /** Generic d-dim skyline. `dims` are "smaller is better" numeric columns
    * on `df` (no nulls; filter first). */
  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex)

    def dominates(a: Row, b: Row): Boolean = {
      var allLe = true
      var oneLt = false
      idx.foreach { i =>
        val cmp = java.lang.Double.compare(
          a.get(i).asInstanceOf[java.lang.Number].doubleValue(),
          b.get(i).asInstanceOf[java.lang.Number].doubleValue())
        if (cmp > 0) allLe = false
        if (cmp < 0) oneLt = true
      }
      allLe && oneLt
    }

    def localSkyline(it: Iterator[Row]): Iterator[Row] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { r =>
        if (!buf.exists(s => dominates(s, r))) {
          var i = 0
          while (i < buf.length) {
            if (dominates(r, buf(i))) buf.remove(i) else i += 1
          }
          buf += r
        }
      }
      buf.iterator
    }

    implicit val enc = Encoders.row(schema)
    // repartition(1), NOT coalesce(1): coalesce is a narrow dependency
    // that would fuse phase 1 into the single downstream task, serializing
    // the full-data pass. The exchange forces a stage boundary — phase 1
    // runs at input parallelism and only the candidate union (kilobytes)
    // is shuffled to the final single-task pass.
    df.mapPartitions(localSkyline)
      .repartition(1)
      .mapPartitions(localSkyline)
  }

  /** 2-D declarative variant: minimize `x` then `y` (see object doc). */
  def skyline2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val withDims = df.withColumn("__x", x).withColumn("__y", y)
      .withColumn("__xr", dense_rank().over(Window.orderBy(col("__x"))))
    val prefix = Window.orderBy(col("__xr"))
      .rangeBetween(Window.unboundedPreceding, -1)
    withDims
      .withColumn("__minYltX", min(col("__y")).over(prefix))
      .withColumn("__minYeqX", min(col("__y")).over(Window.partitionBy(col("__x"))))
      .filter((col("__minYltX").isNull || col("__minYltX") > col("__y")) &&
        col("__y") === col("__minYeqX"))
      .drop("__x", "__y", "__xr", "__minYltX", "__minYeqX")
  }

  /** q_skyline: parts on the cheap-but-big frontier — minimize
    * p_retailprice, maximize p_size (negated). Generic two-phase path;
    * the oracle is the independent classic NOT EXISTS dominance query.
    * Dominance is comparisons only (no double arithmetic), so
    * cross-engine parity is exact. */
  def skylineQuery(spark: SparkSession, dir: String): DataFrame =
    skyline(
      Tables.part(spark, dir)
        .select(col("p_partkey").as("partkey"),
          col("p_retailprice").as("price"),
          (-col("p_size")).cast("long").as("neg_size")),
      Seq("price", "neg_size"))
      .select(col("partkey"), col("price"), (-col("neg_size")).as("size"))
      .orderBy("partkey")
}
