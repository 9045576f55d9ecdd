package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for interactive exploration at corpus scale:
  * exact `countDistinct` forces either an Expand (with other aggs) or a
  * two-level shuffle holding every distinct key in memory; exact
  * percentiles need a full sort. The sketch versions are one-pass,
  * mergeable (partial aggregation on the map side like any sum), and
  * fixed-memory — HyperLogLog++ for cardinality, a Greenwald-Khanna
  * variant for quantiles — which is what a 100 TB dashboard query
  * actually runs. Error is a dialed parameter, checked in spec against
  * exact answers.
  */
object Approx {

  /** Per-group approximate distinct cardinalities alongside plain aggs —
    * the shape that with exact countDistinct would pay an Expand
    * multiplication per distinct column. `rsd` = target relative
    * standard deviation of the HLL++ estimate. */
  def distinctBy(df: DataFrame, groupCols: Seq[Column],
                 distinctCols: Seq[(String, Column)],
                 rsd: Double = 0.02): DataFrame = {
    val aggs = distinctCols.map { case (name, c) =>
      approx_count_distinct(c, rsd).cast("long").as(name)
    } :+ count(lit(1)).as("row_cnt")
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate quantiles of `value`, one pass, no sort. `accuracy` is
    * the inverse rank-error bound (10000 ⇒ rank error ≤ 0.01%). */
  def quantiles(df: DataFrame, value: Column, probs: Seq[Double],
                accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(value,
      array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Heavy hitters: items whose frequency exceeds `support` of all rows,
    * via Spark's distributed frequent-items sketch (Karp/Shenker/
    * Papadimitriou counter maps — bounded 1/support counters per
    * partition, merged associatively; one pass, no shuffle of the data,
    * only of the fixed-size maps). The result is a SUPERSET of the true
    * heavy hitters (false positives possible, false negatives not) —
    * exactly the guarantee a boilerplate-phrase or hot-key probe needs
    * before an exact (and expensive) groupBy confirms. Returns one row
    * per candidate item. */
  def heavyHitters(df: DataFrame, c: Column, support: Double = 0.01): DataFrame = {
    val itemsRow = df.select(c.as("hh_item")).stat.freqItems(Seq("hh_item"), support)
    itemsRow.select(explode(col("hh_item_freqItems")).as("item"))
  }
}
