package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / top-k / latest-per-key operators.
  *
  * Covers the reference's W1/W2/W7 surface (SURVEY.md §2.6):
  *  - global top-k (`nlargest`, reference src/analytics/engine.py:324-326)
  *  - last-N-per-group (`sort_values().tail(5)` per team, engine.py:145-152)
  *  - latest-snapshot-per-key (player_market_value UNIQUE(player_id,
  *    valuation_date), schema.sql:986-997)
  *
  * Scale notes: `topK` is `orderBy.limit` which Catalyst plans as
  * TakeOrderedAndProject — per-partition heap + driver merge of k rows, no
  * global sort shuffle. The windowed variants shuffle once on the partition
  * key; at 100 TB that is the unavoidable key-repartition and nothing more.
  */
object Ranking {

  /** Global top-k: true top-k plan (TakeOrderedAndProject), never a full sort.
    * `order` must be a deterministic total order (include a unique tiebreak).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k rows per group. One shuffle on `partitionCols`. */
  def topKPerGroup(df: DataFrame, k: Int, partitionCols: Seq[Column], order: Seq[Column],
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
      .drop(rankCol)
  }

  /** Latest row per key by event-time order (row_number desc = 1).
    * `order` is ascending "recency" columns; the most-recent row wins.
    * This is the read-side of last-writer-wins upsert semantics (K1). */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
