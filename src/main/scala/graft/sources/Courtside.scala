package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.JsonNorm

/** Courtside fixture-list completeness gate + game-page enrichment
  * (SURVEY §2 S16 depth — reference `courtside_scraper.py:199-216,
  * 243-378` and `scraper_utils.is_incomplete_fixture`,
  * `src/common/scraper_utils.py:63-81`).
  *
  * The reference flattens captured game nodes, gates each on
  * completeness — both team identifiers present AND score evidence
  * (a unified score string, or BOTH individual scores; exactly one of
  * the two score keys is the xor-incomplete case) — and re-visits the
  * game page of every incomplete fixture, where the `__NEXT_DATA__`
  * hydration JSON yields the full record that fills the gaps.
  *
  * Spark shape: the gate is a pure expression over the parsed node, so
  * the capture set splits into a complete branch (passes through
  * untouched — never joins, never shuffles) and an incomplete branch
  * that equi-joins the (normalized) game-page table on fixture id and
  * COALESCE-merges per field, page value first — the enriched record
  * replaces what it carries and preserves capture values it lacks
  * (reference `_enrich_single_game` returning the hydration record,
  * anchor fields surviving). At 100 TB only the incomplete fraction
  * shuffles, keyed by fixture id.
  *
  * Null ≡ absent: the reference gates on dict KEY presence, so a key
  * present with value None counts as "both score keys present" →
  * complete. A typed engine collapses present-null and absent to null;
  * such no-information fixtures gate as incomplete here and go through
  * enrichment — a conservative, data-improving deviation (documented
  * ruling, same class as the F29 hash note).
  */
object Courtside {

  /** `is_incomplete_fixture` over a parsed game node and its normalized
    * flat record: team evidence per side = name OR id; score evidence =
    * the unified `score` STRING (present → complete even if it later
    * parses to nulls, matching the reference's isinstance(str) check) OR
    * both normalized scores non-null. */
  def isIncompleteFixture(node: Column, flat: Column): Column =
    !((flat.getField("home").isNotNull || flat.getField("home_id").isNotNull) &&
      (flat.getField("away").isNotNull || flat.getField("away_id").isNotNull) &&
      (node.getField("score").isNotNull ||
        (flat.getField("home_score").isNotNull &&
          flat.getField("away_score").isNotNull)))

  private val Fields = Seq("home", "away", "home_id", "away_id",
    "home_score", "away_score")

  /** Gate + enrich: `captures` rows carry a raw game-node JSON column;
    * `pages` rows carry game-page HTML whose `__NEXT_DATA__` hydration
    * JSON normalizes to the full record. Complete captures pass through
    * unmodified; incomplete ones match the page table on fixture id and
    * take `coalesce(page.field, capture.field)` per field. Emits the
    * canonical flat columns plus `needed_enrichment`. Non-key capture
    * columns are preserved — except ones named like the canonical
    * outputs (id, home, …), which the normalized record supersedes.
    * Duplicate page snapshots of one fixture are reduced to a single
    * deterministic record (struct-min) before the join, so re-archived
    * pages can't fan incomplete fixtures out into duplicate rows.
    *
    * Plan shape: ONE pass over captures — the gate rides the join
    * condition (`id match AND needed_enrichment`), so complete rows
    * simply never match and the unconditional `coalesce(page, capture)`
    * is the identity for them. A filter-split + union would instead
    * execute the capture scan (and its whole parse expression chain)
    * once per branch — Spark does not share the subtree — doubling the
    * dominant cost. The price is that under a (non-broadcast) shuffle
    * join complete rows shuffle too; for a parse-heavy capture source
    * the saved second scan wins, and the page side is the broadcast
    * side in the expected regime anyway. */
  def enrichFixtures(captures: DataFrame, rawCol: String,
                     pages: DataFrame, htmlCol: String): DataFrame = {
    val generated = Set("id", "needed_enrichment") ++ Fields
    val passthrough = captures.columns
      .filterNot(c => c == rawCol || generated.contains(c)).toSeq
    val node = JsonNorm.parseGameNode(col(rawCol))
    val base = captures
      .withColumn("__f", JsonNorm.normalizeGameNode(node))
      .withColumn("needed_enrichment", isIncompleteFixture(node, col("__f")))
      .select(passthrough.map(col) ++ Seq(col("__f.id").as("id")) ++
        Fields.map(f => col(s"__f.$f").as(f)) :+ col("needed_enrichment"): _*)

    val page = pages
      .select(JsonNorm.normalizeGameJson(Bronze.extractNextData(col(htmlCol))).as("__p"))
      .select(col("__p.id").as("__pid") +:
        Fields.map(f => col(s"__p.$f").as(s"__p_$f")): _*)
      .groupBy(col("__pid"))
      .agg(min(struct(Fields.map(f => col(s"__p_$f")): _*)).as("__pp"))
      .select(col("__pid") +:
        Fields.map(f => col(s"__pp.__p_$f").as(s"__p_$f")): _*)

    base
      .join(page, col("id") === col("__pid") && col("needed_enrichment"), "left")
      .select(passthrough.map(col) ++ Seq(col("id")) ++
        Fields.map(f => coalesce(col(s"__p_$f"), col(f)).as(f)) :+
        col("needed_enrichment"): _*)
  }
}
