package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of a key belong to one
  * session while the inter-event gap stays under `gapMs`.
  *
  * Batch analogue of Structured Streaming session windows; the classic
  * two-window formulation — boundary flag via lag(), then a running sum
  * assigns session sequence numbers. One shuffle on the key, one
  * per-partition sort, no join.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key). `tsMs` must be a long; ordering
    * is (tsMs, tieBreak) and must be total for determinism. */
  def sessionize(df: DataFrame, key: Column, tsMs: Column, tieBreak: Column,
                 gapMs: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(tsMs.asc, tieBreak.asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__gap", tsMs - lag(tsMs, 1).over(order))
      .withColumn("__new", when(col("__gap").isNull || col("__gap") > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__gap", "__new")
  }
}
