package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** Fuzzy entity resolution (SURVEY.md §2.4 J8 — reference
  * src/common/entity_mapper.py:41-154): match staged records against a
  * canonical entity table by approximate name similarity, with a three-way
  * outcome split:
  *
  *   score ≥ autoThreshold   → matched   (auto-merge)
  *   review ≤ score < auto   → review    (mapping_review_queue, K14)
  *   score < reviewThreshold → create    (new entity)
  *
  * Scale design: the reference scans the whole entity table per candidate
  * (O(n·m) Python loop). Here candidates come from a *blocked* equi-join on
  * a cheap blocking key, a codegen Levenshtein pre-filter trims the block,
  * and only survivors pay the exact fuzzy-ratio UDF; best match per staged
  * row via one ranked window. At 100 TB the blocking key bounds the join
  * fanout; swap in MinHash-LSH buckets (scale.Dedup) when name blocks skew.
  */
object EntityResolution {

  /** Result of a resolution pass. */
  final case class Resolution(matched: DataFrame, review: DataFrame, create: DataFrame)

  /** @param staged    rows to resolve; must contain `nameCol` and `blockCol`
    * @param entities  canonical table; must contain `idCol`, `nameCol`, `blockCol`
    * @param prefilterMargin approx-ratio slack below reviewThreshold that
    *        still enters exact scoring (guards against approx underestimate)
    */
  def resolve(
      staged: DataFrame,
      entities: DataFrame,
      nameCol: String,
      blockCol: String,
      idCol: String,
      autoThreshold: Int = 90,
      reviewThreshold: Int = 75,
      prefilterMargin: Int = 15): Resolution = {

    val s = staged.withColumn("__sname", Normalize.normalizeForMatching(col(nameCol)))
    val e = entities.select(
      col(idCol).as("__eid"),
      col(nameCol).as("__ename_raw"),
      col(blockCol).as("__eblock"))
      .withColumn("__ename", Normalize.normalizeForMatching(col("__ename_raw")))

    // Blocked candidate join; the codegen Levenshtein approximation trims
    // the block before the exact-ratio UDF. A staged row whose candidates
    // are all trimmed (or whose block is empty) simply produces no best
    // row — it falls out to `create` via the anti-join below.
    val candidates = s.join(e, s(blockCol) === col("__eblock"), "inner")
      .withColumn("__approx", Normalize.fuzzyRatioApprox(col("__sname"), col("__ename")))
      .filter(col("__approx") >= reviewThreshold - prefilterMargin)
      .withColumn("__score", Normalize.fuzzyRatio(col("__sname"), col("__ename")))
      .filter(col("__score") >= reviewThreshold)

    val best = candidates
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__sname"), col(blockCol))
          .orderBy(col("__score").desc, col("__eid").asc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__approx", "__ename")

    val matched = best.filter(col("__score") >= autoThreshold)
      .withColumnRenamed("__eid", "entity_id")
      .withColumnRenamed("__score", "match_score")
      .drop("__sname", "__ename_raw", "__eblock")
    val review = best.filter(col("__score") < autoThreshold)
      .withColumnRenamed("__eid", "candidate_entity_id")
      .withColumnRenamed("__score", "match_score")
      .drop("__sname", "__ename_raw", "__eblock")
    val create = Joins.anti(s, best.select(col("__sname").as("__bname"), col("__eblock")),
        col("__sname") === col("__bname") && s(blockCol) === col("__eblock"))
      .drop("__sname")

    Resolution(matched, review, create)
  }
}
