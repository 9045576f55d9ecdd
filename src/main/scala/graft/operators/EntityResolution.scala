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
    * @param uidCol    unique per-staged-row key. Every staged row lands in
    *        exactly one of matched/review/create keyed by this column; two
    *        distinct rows whose names normalize identically stay distinct.
    *        When absent a synthetic id is minted and the staged frame is
    *        pinned (eager localCheckpoint) so all three output branches see
    *        the same ids; at scale pass a real key instead.
    */
  def resolve(
      staged: DataFrame,
      entities: DataFrame,
      nameCol: String,
      blockCol: String,
      idCol: String,
      autoThreshold: Int = 90,
      reviewThreshold: Int = 75,
      prefilterMargin: Int = 15,
      uidCol: Option[String] = None): Resolution = {

    val withUid = uidCol match {
      case Some(u) => staged.withColumn("__sid", col(u))
      case None =>
        // Pin the minted ids so all three output branches see the same
        // values. Silver.materialize picks the deployment strategy:
        // eager localCheckpoint locally, a persisted parquet silver table
        // when spark.graft.silver.dir is set (fault-tolerant path). The
        // table name is unique PER CALL: a fixed name would let a later
        // resolve() (or a concurrent session sharing the silver prefix)
        // overwrite parquet parts a live Resolution still lazily reads.
        // Superseded tables are garbage, collected by the same lifecycle
        // rule as ResultCache's orphaned versions.
        graft.scale.Silver.materialize(
          staged.withColumn("__sid", monotonically_increasing_id()),
          s"entity_resolution_staged_uids_${java.util.UUID.randomUUID().toString.take(8)}")
    }
    val s = withUid.withColumn("__sname", Normalize.normalizeForMatching(col(nameCol)))
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

    // Best match per STAGED ROW (not per normalized name): partitioning by
    // __sid keeps two distinct staged records with identical normalized
    // names from collapsing into one output row.
    val best = candidates
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__sid"))
          .orderBy(col("__score").desc, col("__eid").asc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__approx", "__ename")

    // __sid is internal: the caller's uid column (if any) is still present
    // under its own name.
    def clean(df: DataFrame): DataFrame = df.drop("__sid")
    val matched = clean(best.filter(col("__score") >= autoThreshold)
      .withColumnRenamed("__eid", "entity_id")
      .withColumnRenamed("__score", "match_score")
      .drop("__sname", "__ename_raw", "__eblock"))
    val review = clean(best.filter(col("__score") < autoThreshold)
      .withColumnRenamed("__eid", "candidate_entity_id")
      .withColumnRenamed("__score", "match_score")
      .drop("__sname", "__ename_raw", "__eblock"))
    val create = clean(Joins.anti(s, best.select(col("__sid").as("__bsid")),
        col("__sid") === col("__bsid"))
      .drop("__sname"))

    Resolution(matched, review, create)
  }

  /** Simplified Soundex phonetic key — the classic cheap blocking key for
    * name-matching ER (reference entity_mapper.py's fuzzy matching would
    * sit downstream of exactly this blocking pass): first letter + the
    * first three consonant-class codes, adjacent duplicates collapsed,
    * vowels dropped, zero-padded to 4.
    *
    * Differences from archival Soundex, chosen for ENGINE PORTABILITY:
    * H/W are coded 0 like vowels (not "transparent"), because the
    * transparent-H/W rule needs lookahead no regexp-free string pipeline
    * expresses; and run-collapse happens per digit class via six literal
    * regexp passes (`11+`→`1` …) because DuckDB's RE2 has no
    * backreferences. Both engines run the IDENTICAL transformation
    * chain, so keys agree byte-for-byte. */
  def phoneticKey(term: Column): Column = {
    val up = upper(term)
    val codes = translate(up,
      "AEIOUYHWBFPVCGJKQSXZDTLMNR",
      "00000000111122222222334556")
    val collapsed = (1 to 6).foldLeft(codes)((c, d) =>
      regexp_replace(c, s"$d$d+", d.toString))
    val tail = translate(substring(collapsed, 2, 1000), "0", "")
    concat(substring(up, 1, 1), rpad(substring(tail, 1, 3), 3, "0"))
  }

  /** Phonetic collision groups across the combined vocabulary of
    * document text and part names (q_phonetic): every phonetic key under
    * which ≥ 2 distinct terms collide — the blocking-quality report an
    * ER pipeline reads before trusting [[phoneticKey]] blocks ("red" and
    * "rod" share R300: one block, candidates for the expensive fuzzy
    * ratio; terms in singleton blocks never pay it).
    *
    * Scale shape: two token projections union into a distinct-term
    * vocabulary (map-side combining — vocab-, not corpus-, sized); the
    * key is a pure codegen string chain; the group-by shuffles the vocab
    * only. The CSV witness is bounded by the block size. */
  def phoneticBlocksQuery(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    import graft.sources.Tables
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .unionAll(Tables.part(spark, dir)
        .select(explode(split(col("p_name"), " ")).as("term")))
      .distinct()
    terms.withColumn("code", phoneticKey(col("term")))
      .groupBy("code")
      .agg(count(lit(1)).as("n_terms"),
        array_join(sort_array(collect_list(col("term"))), ",").as("terms_csv"))
      .filter(col("n_terms") >= 2L)
      .orderBy("code")
  }
}
