package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-id mapping registry (SURVEY.md §2.4 J7 — reference
  * src/database/services/external_id_mapping_service_async.py:40-100,
  * tables in database/migrations/0002_external_id_mappings.sql): maps
  * `(source, external_id) → internal_id` with conflict *detection* rather
  * than the reference's raised `MappingConflictError` — a conflicting
  * batch row lands in an error DataFrame instead of aborting the job
  * (the distributed-friendly rebuild noted in SURVEY §7.3 #2).
  */
object ExternalIdMap {

  final case class Registered(mapping: DataFrame, conflicts: DataFrame)

  /** Merge staged `(source, external_id, internal_id)` claims into the
    * current mapping. New pairs append; re-assertions of the same mapping
    * are no-ops; a staged claim whose pair already maps to a DIFFERENT
    * internal id is a conflict (current mapping wins, claim reported).
    *
    * Conflicts are detected both against the current mapping AND within
    * the batch itself: two staged claims for the same (source,
    * external_id) with different internal_ids (the reference's
    * MappingConflictError case) pick a deterministic winner
    * (min internal_id); losing claims land in `conflicts` with the winner
    * as `existing_internal_id`. The registry never ends up with two
    * internal ids for one external key. */
  def register(current: DataFrame, staged: DataFrame): Registered = {
    val cur = current.select(col("source"), col("external_id"),
      col("internal_id").as("__cur_id"))
    val stg = staged.select("source", "external_id", "internal_id").distinct()
    val winners = stg.groupBy("source", "external_id")
      .agg(min("internal_id").as("internal_id"),
        countDistinct("internal_id").as("__n_ids"))
    val intraConflicts = stg
      .join(winners.filter(col("__n_ids") > 1)
        .select(col("source"), col("external_id"),
          col("internal_id").as("__win_id")),
        Seq("source", "external_id"), "inner")
      .filter(col("internal_id") =!= col("__win_id"))
      .select(col("source"), col("external_id"),
        col("internal_id").as("claimed_internal_id"),
        col("__win_id").as("existing_internal_id"))
    val joined = winners.drop("__n_ids")
      .join(cur, Seq("source", "external_id"), "left")
    val curConflicts = joined
      .filter(col("__cur_id").isNotNull && col("__cur_id") =!= col("internal_id"))
      .select(col("source"), col("external_id"),
        col("internal_id").as("claimed_internal_id"),
        col("__cur_id").as("existing_internal_id"))
    val fresh = joined.filter(col("__cur_id").isNull)
      .select("source", "external_id", "internal_id")
    Registered(current.unionByName(fresh), intraConflicts.unionByName(curConflicts))
  }

  /** Resolve staged rows through the mapping: adds `internal_id`
    * (null → the get-or-create path, J6/`Joins.anti`). */
  def resolve(staged: DataFrame, mapping: DataFrame): DataFrame =
    staged.join(mapping, Seq("source", "external_id"), "left")
}
