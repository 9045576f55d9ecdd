package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed PageRank — the canonical ITERATIVE join-aggregate
  * workload (power iteration over the link matrix), complementing the
  * single-pass graph ops ([[Triangles]], `Dedup.connectedComponents`).
  * The reference's entity-influence analytics (player/team importance
  * from the relational co-occurrence graph) map here.
  *
  * Arithmetic is INTEGER-QUANTIZED so results are engine-portable and
  * oracle-checkable: ranks live in integer micro-units (`Init` per node),
  * each edge contribution is `rank div outdeg`, and the damping update is
  * `(15·Init) div 100 + (85·Σ contrib) div 100` — every step exact Long
  * arithmetic, no FP summation-order dependence (float PageRank sums in
  * nondeterministic order across partitions; quantized PageRank is
  * bit-stable under ANY partitioning and replays exactly in DuckDB as
  * unrolled CTE rounds). Quantization error per step is < 1 unit per
  * inbound edge — noise at the 1e-9 scale of `Init`.
  *
  * Scale shape (per iteration): one shuffle join of edges⋈ranks on `src`
  * (outdeg rides the same key — co-partitioned), one map-side-combining
  * sum keyed by `dst`, one per-node left join. The edge list and node
  * list are materialized ONCE ([[graft.scale.Silver.scratch]]); each
  * iteration's rank table is materialized before the next (the classic
  * iterative-lineage cut — without it Spark re-executes every prior
  * iteration per reference, and the plan grows exponentially). No
  * driver-side state beyond the iteration counter; 1000 executors run
  * each iteration as ordinary shuffles.
  *
  * Dangling mass: nodes without out-edges absorb rank (no
  * redistribution) — the common simplification; both engines implement
  * the same recurrence so the oracle is exact. `Init` = 1e9 keeps
  * `85 · Σ incoming` within Long for graphs up to ~1e8 nodes; at larger
  * node counts scale `Init` down (the recurrence is homogeneous in the
  * base term, so relative ranking is preserved).
  */
object PageRank {

  val Init: Long = 1000000000L

  /** Fixed-iteration integer PageRank over a directed edge list
    * (columns `src`, `dst`; duplicates allowed — deduped here). Returns
    * (node, rank) for every node after `iters` rounds.
    *
    * `ckptEvery` bounds plan depth: each rank table is consumed exactly
    * ONCE (by the next iteration), so a lazy chain executes every stage
    * once anyway — materialization buys nothing per-iteration and costs
    * a write-read round trip. It is only needed to keep analysis/codegen
    * time and lineage bounded over MANY iterations, so the cut happens
    * every few rounds, not every round. */
  def pagerank(edges: DataFrame, iters: Int = 5, ckptEvery: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val e = graft.scale.Silver.scratch(
      edges.select(col("src"), col("dst")).distinct(), "pr_edges")
    val nodes = graft.scale.Silver.scratch(
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct(), "pr_nodes")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = Init * 15L / 100L
    var rank = nodes.withColumn("rank", lit(Init))
    for (i <- 1 to iters) {
      val incoming = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodes.join(incoming, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      rank = if (i % ckptEvery == 0 && i < iters)
        graft.scale.Silver.scratch(next, "pr_iter") else next
    }
    rank
  }

  /** q_pagerank: influence ranking over the supplier↔customer co-trading
    * graph (an edge each way per distinct supplier–customer pair that
    * shares a lineitem) — 5 quantized rounds, full (node, rank) table.
    * Customers map to `-(custkey + 1)` (strictly negative) so the two
    * key domains cannot collide — a bare sign flip would merge supplier
    * 0 with customer 0 (corpus keys start at 0). */
  def pagerankQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"), (-(col("o_custkey") + 1)).as("c"))
      .distinct()
    val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
      .unionAll(pairs.select(col("c").as("src"), col("s").as("dst")))
    pagerank(edges, iters = 5)
      .select(col("node").cast("long").as("node"), col("rank"))
      .orderBy("node")
  }
}
