package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped operators beyond plain equi-joins (SURVEY.md §2.4).
  *
  *  - symmetric-pair normalization (J5 — head-to-head self-join semantics,
  *    reference src/analytics/engine.py:193-229): instead of the reference's
  *    O(matches²) per-row scan, normalize the unordered pair to
  *    (least, greatest) and aggregate — one shuffle, no self-join.
  *  - semi/anti joins (J6 get-or-create flows, src/database/services/
  *    bundesliga.py:18-39): existence checks without materializing the
  *    right side's columns; Spark plans them as broadcast/shuffled
  *    hash-join LeftSemi/LeftAnti with no row multiplication.
  */
object Joins {

  /** Normalized unordered-pair key: (least(a,b), greatest(a,b)).
    * H2H "team A vs team B regardless of venue" becomes a plain groupBy. */
  def symmetricPair(a: Column, b: Column): (Column, Column) =
    (least(a, b), greatest(a, b))

  /** Rows of `left` with at least one match in `right` (EXISTS). */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Rows of `left` with no match in `right` (NOT EXISTS) — the "create"
    * side of get-or-create dimension resolution. */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")
}
