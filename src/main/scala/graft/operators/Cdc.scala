package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog (CDC) application: compact an insert/update/delete event
  * stream to its net effect and apply it to a base snapshot.
  *
  * This generalizes the reference's upsert family (K1/K10,
  * src/database/manager.py bulk_upsert — insert-or-update only) with the
  * missing third verb: hard deletes. A CDC feed (Debezium-style
  * op ∈ {I, U, D} + a monotone sequence) is the standard 100 TB shape
  * for keeping a lakehouse mirror of an OLTP store — the nightly full
  * re-extract the reference's daily player refresh does
  * (scraping_orchestrator.py:333-352) stops scaling long before that.
  *
  * Scale shape: ONE shuffle of the changelog on the key for compaction —
  * and the compaction is an argmax AGGREGATE (`max(struct(seq, …))`,
  * partial-combining map-side), not a ranked window, so a hot key whose
  * million updates all land in one day still combines before the
  * shuffle. The apply is then a single key-partitioned full-outer join
  * against the base; at production scale both sides share a bucketed
  * layout and the join is exchange-free (see graft.sources.Bucketing).
  */
object Cdc {

  /** Net effect of a changelog: the record with the highest `seqCol` per
    * key, carrying its op and every payload column. Ties are impossible
    * with a monotone per-key sequence (CDC log offset); if the feed can
    * repeat offsets, disambiguate upstream — argmax over a non-total
    * order is feed corruption, not a tie to break silently. */
  def compact(changelog: DataFrame, keyCols: Seq[String],
              seqCol: String): DataFrame = {
    val payload = changelog.columns.filterNot(c =>
      keyCols.contains(c) || c == seqCol)
    val w = max(struct(col(seqCol) +: payload.map(col): _*)).as("__w")
    changelog.groupBy(keyCols.map(col): _*).agg(w)
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Apply a compacted-or-raw changelog to `base`. Both frames share
    * `keyCols`; the changelog additionally has `seqCol` and `opCol`
    * (values 'I'/'U'/'D' — I and U are both upserts; D removes the key).
    * Output schema: keys, then every base payload column (changelog
    * wins where the changelog carries the column, otherwise passed
    * through untouched — partial-row CDC feeds are the norm), then any
    * changelog-only payload columns (null for untouched base rows),
    * then a `src` provenance flag. A D on an absent key is a no-op
    * (idempotent replay). The base must not itself contain `opCol` —
    * the op verb is feed metadata, never payload. */
  def applyChangelog(base: DataFrame, changelog: DataFrame,
                     keyCols: Seq[String], seqCol: String,
                     opCol: String = "op"): DataFrame = {
    require(!base.columns.contains(opCol),
      s"base must not contain the op column '$opCol'")
    val latest = compact(changelog, keyCols, seqCol)
    val basePayload = base.columns.filterNot(keyCols.contains)
    val shared = basePayload.filter(latest.columns.contains)
    val logOnly = latest.columns.filterNot(c =>
      keyCols.contains(c) || c == opCol || basePayload.contains(c))
    val b = shared.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val l = shared.foldLeft(latest)((d, c) => d.withColumnRenamed(c, s"__l_$c"))
    b.join(l, keyCols, "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= "D")
      .select(keyCols.map(col) ++
        basePayload.map(c =>
          if (shared.contains(c)) coalesce(col(s"__l_$c"), col(s"__b_$c")).as(c)
          else col(c)) ++
        logOnly.map(col) :+
        when(col(opCol).isNull, lit("base")).otherwise(lit("cdc")).as("src"): _*)
  }

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** q_cdc_apply: customer balances as the base snapshot, a synthetic
    * CDC feed derived from orders (seq = o_orderkey; every 17th record
    * a delete, every 13th an insert under a fresh key range, the rest
    * updates), applied to the final state. Exercises all four outcomes:
    * untouched base rows, updated rows, inserted keys, and deleted keys
    * — including delete-then-later-update (latest seq wins) and deletes
    * of never-present keys (no-op). */
  def cdcApplyQuery(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val base = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("cust_key"),
        dec2(col("c_acctbal")).cast("double").as("acctbal"))
    val log = graft.sources.Tables.orders(spark, dir).select(
      (col("o_custkey") + when(col("o_orderkey") % 13 === 0, lit(500000L))
        .otherwise(lit(0L))).as("cust_key"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 17 === 0, lit("D"))
        .when(col("o_orderkey") % 13 === 0, lit("I"))
        .otherwise(lit("U")).as("op"),
      dec2(col("o_totalprice")).cast("double").as("acctbal"))
    applyChangelog(base, log, Seq("cust_key"), "seq").orderBy("cust_key")
  }
}
