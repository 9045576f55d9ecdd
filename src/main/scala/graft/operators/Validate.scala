package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint validation stage (SURVEY.md §7.3): the Spark rebuild of the
  * reference's pydantic field validation + DDL CHECK constraints
  * (src/domain/models.py:451-532, database/schema.sql CHECKs) — rows are
  * never rejected mid-pipeline; they split into a (valid, quarantine)
  * pair, quarantine rows carrying the list of violated rule names
  * (the mapping_review_queue pattern, K14).
  *
  * Rules are plain Column predicates, so the whole check evaluates inside
  * one codegen'd projection — no UDFs, no second pass: one scan, two
  * filtered outputs.
  */
object Validate {

  final case class Rule(name: String, predicate: Column)

  /** Common rule builders mirroring the reference's validators. */
  def notNull(c: String): Rule = Rule(s"${c}_null", col(c).isNotNull)
  def inDomain(c: String, values: Seq[String]): Rule =
    Rule(s"${c}_domain", col(c).isNull || col(c).isin(values: _*))
  def atLeast(c: String, min: Double): Rule =
    Rule(s"${c}_min", col(c).isNull || col(c) >= min)
  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_format", col(c).isNull || col(c).rlike(regex))

  final case class Validated(valid: DataFrame, quarantine: DataFrame)

  /** Split `df` by the conjunction of `rules`; quarantine rows get a
    * `violations` array column naming every failed rule. */
  def validate(df: DataFrame, rules: Seq[Rule]): Validated = {
    val viol = array_compact(array(rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*))
    val tagged = df.withColumn("violations", viol)
    Validated(
      valid = tagged.filter(size(col("violations")) === 0).drop("violations"),
      quarantine = tagged.filter(size(col("violations")) > 0))
  }

  /** q_validate: the quarantine side of a 3-rule validation of events —
    * a not-null rule that never fires (proving passing rules stay out of
    * the violation list), a domain rule excluding 'error', and a minimum
    * on value. Violation names appear in rule order, the same CASE
    * ladder the SQL replay builds. The array is witnessed as a
    * comma-joined scalar: the oracle harness hashes cell values and
    * cannot canonicalize array cells, so both sides emit the joined
    * string (order is deterministic — rule order — on both engines). */
  def quarantineQuery(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "event_type", "value")
    validate(ev, Seq(
        notNull("event_id"),
        inDomain("event_type", Seq("click", "view", "purchase", "signup")),
        atLeast("value", 1.0)))
      .quarantine
      .withColumn("violations", array_join(col("violations"), ","))
      .orderBy("event_id")
  }
}
