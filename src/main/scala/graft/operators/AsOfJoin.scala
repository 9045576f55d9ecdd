package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, the most recent right row of
  * the same key with right.time <(=) left.time.
  *
  * Covers the reference's as-of surface (SURVEY.md §2.4 J11, §2.6 W7):
  * SCD2 current-row resolution, open/close odds snapshots
  * (reference database/schema.sql:729-745), latest-market-value-before-date.
  *
  * Implementation is the union-sort trick, NOT a range join: tag both
  * inputs, union, and carry the last-seen right payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding rows frame. Cost is one
  * shuffle on the key + a per-partition sort — O(n log n), no row
  * multiplication. A naive `l JOIN r ON key AND r.t <= l.t` + argmax
  * explodes quadratically per key at 100 TB; this stays linear after sort.
  */
object AsOfJoin {

  /** @param leftTime / rightTime  any mutually comparable orderable column
    * @param rightPayload          right columns to surface (null if no match)
    * @param strict                true → right.time <  left.time,
    *                              false → right.time <= left.time
    * @param rightTieBreak         deterministic tiebreak among right rows
    *                              sharing (key, time); latest wins
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      strict: Boolean = false,
      rightTieBreak: Option[String] = None): DataFrame = {

    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.fields.head.dataType

    // At equal time: for <= the right row must be visible to the left row
    // (right sorts first); for < it must not (left sorts first).
    val (leftPrio, rightPrio) = if (strict) (0, 1) else (1, 0)

    val tieb = rightTieBreak.map(col).getOrElse(lit(0L))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(leftPrio).as("__prio"), lit(0L).as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(payloadType).as("__r"))
    // Null-keyed RIGHT rows are dropped: Window.partitionBy groups all
    // nulls into ONE partition, so without the filter a null-keyed left
    // row would "match" any null-keyed right row — join semantics (and
    // pandas merge_asof) say null never equals null. Null-keyed left
    // rows stay and emit with null asof_* columns, as a left join would.
    val r = right
      .filter(col(rightKey).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(rightPrio).as("__prio"), tieb.cast("long").as("__tie"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        payloadStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__prio").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = rightPayload.map(c => col("__m").getField(c).as(s"asof_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
