package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental equi-join maintenance (delta processing).
  *
  * The reference recomputes analytics joins from scratch on a daily
  * schedule (main.py:176, engine.py's full-table queries); at 100 TB the
  * join's inputs change by a fraction of a percent per cycle and a full
  * recompute re-shuffles everything. Classic incremental view
  * maintenance factors the new state instead: with disjoint splits
  * A = A₀ ⊎ ΔA and B = B₀ ⊎ ΔB,
  *
  *   A ⋈ B  =  (A₀ ⋈ B₀)  ⊎  (ΔA ⋈ B₀)  ⊎  (A₀ ⋈ ΔB)  ⊎  (ΔA ⋈ ΔB)
  *
  * where A₀ ⋈ B₀ is the already-materialized previous result, read back
  * — never recomputed. The three delta terms each have a SMALL side, so
  * they run as broadcast joins: the big stored tables A₀/B₀ are scanned
  * but never shuffled, which is the whole point — the daily cost is
  * O(|Δ| + scan), not O(|A|+|B|) shuffle. (When deltas outgrow the
  * broadcast threshold Spark's AQE falls back to a shuffled join on its
  * own; the algebra is unchanged.) Companion to Merge.additiveUpsert
  * (A8 incremental AGGREGATE maintenance); deletions route through
  * Cdc.applyChangelog on the materialized result.
  */
object Incremental {

  /** The three delta terms of the join factorization, delta sides
    * broadcast-hinted. `keys` are the shared equi-join columns. */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame =
    broadcast(aDelta).join(bOld, keys)
      .unionByName(aOld.join(broadcast(bDelta), keys))
      .unionByName(broadcast(aDelta).join(bDelta, keys))

  /** Full maintained result: previous materialization ∪ delta terms. */
  def maintainJoin(jOld: DataFrame, aOld: DataFrame, aDelta: DataFrame,
                   bOld: DataFrame, bDelta: DataFrame,
                   keys: Seq[String]): DataFrame =
    jOld.unionByName(joinDelta(aOld, aDelta, bOld, bDelta, keys))

  /** q_incr_join: orders ⋈ customer maintained incrementally — orders
    * split on o_orderkey % 10, customers on c_custkey % 7 (deterministic
    * stand-ins for "yesterday's snapshot" vs "today's delta"), each
    * output row tagged with the factorization term that produced it.
    * The oracle is the plain monolithic join with the tag recomputed as
    * a CASE over the same predicates: proves the four terms are disjoint
    * and total — result identity, not just row counts. */
  def incrJoinQuery(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey").as("cust_key"),
      col("o_totalprice").cast("decimal(18,2)").cast("double").as("total_price"))
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("cust_key"), col("c_name"))
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn("via", lit(t))
    val aDelta = orders.filter(col("o_orderkey") % 10 === 0)
    val aOld = orders.filter(col("o_orderkey") % 10 =!= 0)
    val bDelta = cust.filter(col("cust_key") % 7 === 0)
    val bOld = cust.filter(col("cust_key") % 7 =!= 0)
    val jOld = tag(aOld.join(bOld, Seq("cust_key")), "old")
    jOld.unionByName(
        tag(broadcast(aDelta).join(bOld, Seq("cust_key")), "a_delta"))
      .unionByName(tag(aOld.join(broadcast(bDelta), Seq("cust_key")), "b_delta"))
      .unionByName(tag(broadcast(aDelta).join(bDelta, Seq("cust_key")), "both_delta"))
      .select(col("o_orderkey"), col("cust_key"), col("total_price"),
        col("c_name"), col("via"))
      .orderBy("o_orderkey")
  }
}
