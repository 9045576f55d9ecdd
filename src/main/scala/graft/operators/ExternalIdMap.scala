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
    * internal id is a conflict (current mapping wins, claim reported). */
  def register(current: DataFrame, staged: DataFrame): Registered = {
    val cur = current.select(col("source"), col("external_id"),
      col("internal_id").as("__cur_id"))
    val stg = staged.select("source", "external_id", "internal_id").distinct()
    val joined = stg.join(cur, Seq("source", "external_id"), "left")
    val conflicts = joined
      .filter(col("__cur_id").isNotNull && col("__cur_id") =!= col("internal_id"))
      .withColumnRenamed("__cur_id", "existing_internal_id")
      .withColumnRenamed("internal_id", "claimed_internal_id")
    val fresh = joined.filter(col("__cur_id").isNull)
      .select("source", "external_id", "internal_id")
    Registered(current.unionByName(fresh), conflicts)
  }

  /** Resolve staged rows through the mapping: adds `internal_id`
    * (null → the get-or-create path, J6/`Joins.anti`). */
  def resolve(staged: DataFrame, mapping: DataFrame): DataFrame =
    staged.join(mapping, Seq("source", "external_id"), "left")
}
