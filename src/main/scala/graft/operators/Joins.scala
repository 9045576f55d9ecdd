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

  /** Sorted-neighborhood entity-resolution blocking (q_sorted_neighborhood)
    * — the THIRD blocking family next to token blocking
    * (EntityResolution's approx prefilter) and LSH banding: sort all
    * records by a blocking key and compare each record only to its `w`
    * successors in sort order. Candidates are exactly n·w — linear, skew-
    * immune (a hot token floods token blocking; sort order cannot
    * concentrate), and complementary in recall (catches near-dups whose
    * variant token would miss the token block but which sort adjacently).
    *
    * The global sort position comes from
    * [[Ranking.distributedGlobalRank]] (range exchange + offset
    * broadcast — no single-partition window), and the neighbor pairing is
    * an EQUI-join on rank+offset (offsets exploded 1..w), not a range
    * self-join — so the whole thing is shuffle-bounded by n·w rows.
    * Survivors are scored with plain Levenshtein (engine-portable for the
    * ASCII keys used here) and cut at `maxDist`. */
  def sortedNeighborhood(records: DataFrame, id: Column, name: Column,
                         w: Int = 2, maxDist: Int = 2): DataFrame = {
    val ranked = Ranking.distributedGlobalRank(
        records.select(id.as("id"), name.as("name")),
        Seq(col("name").asc, col("id").asc), rankCol = "rnk", nCol = "__n")
      .select("id", "name", "rnk")
    val probes = ranked
      .select(col("id").as("id1"), col("name").as("name1"),
        explode(sequence(col("rnk") + 1, col("rnk") + w)).as("rnk"))
    probes.join(
        ranked.select(col("id").as("id2"), col("name").as("name2"), col("rnk")),
        Seq("rnk"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "name1", "name2", "dist")
      .orderBy("id1", "id2")
  }

  /** q_sorted_neighborhood over customer names. */
  def sortedNeighborhoodQuery(spark: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame =
    sortedNeighborhood(graft.sources.Tables.customer(spark, dir),
      col("c_custkey"), col("c_name"))
}
