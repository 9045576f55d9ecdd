package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed triangle counting over a co-occurrence graph — the
  * graph-shaped sibling of the H2H pair analytics (J5): "which triples of
  * entities all pairwise co-occur". Implemented degree-ordered
  * (Schank–Wagner / Cohen's MapReduce formulation), THE scale-out shape:
  *
  *  1. Orient every undirected edge from its lower endpoint to its higher
  *     endpoint under the total order ≺ = (degree, id). Every triangle
  *     then has exactly ONE "apex" node with two out-edges — it is counted
  *     once, with no post-hoc deduplication.
  *  2. Wedges are pairs of out-edges from one apex; the wedge count is
  *     Σ outdeg(v)², and because high-degree hubs sort HIGH in ≺, their
  *     out-degree is bounded by the graph arboricity — the hub that would
  *     make a naive neighbor join quadratic generates almost no wedges.
  *     (Orienting by raw id instead leaves Σ deg(hub)² wedges — the
  *     difference between O(m^{3/2}) and O(n·Δ²) work.)
  *  3. A wedge (u→v, u→w) closes iff oriented edge v→w exists: one
  *     equi-join against the oriented edge list.
  *
  * Three shuffles total (degree, wedge self-join, close join), all on
  * edge keys — no collect, no per-node state. The q_triangles oracle
  * recomputes per-node triangle counts in DuckDB with the INDEPENDENT
  * id-canonical formulation (a<b<c three-way join, no degrees at all).
  */
object Triangles {

  /** Broadcast-path budget for the estimated out-adjacency table size
    * (~64 MB — comfortably under typical `spark.sql
    * .autoBroadcastJoinThreshold`-style driver/executor memory budgets). */
  private val BroadcastMaxBytes = 64L * 1024 * 1024

  /** Per-node triangle participation counts from an undirected edge list
    * (columns `a`, `b`; distinct, a ≠ b, each edge once in either
    * direction). Returns (node, tri_cnt), only nodes in ≥1 triangle. */
  def nodeTriangleCounts(edges: DataFrame): DataFrame = {
    // The dedup'd edge list feeds THREE plan branches (degrees, oriented
    // edges, closing join) and the oriented list two more — Spark shares
    // no subtrees, so without materialization the upstream edge
    // derivation would re-execute once per branch (measured 4x on
    // q_triangles).
    val und = graft.scale.Silver.scratch(
      edges.select(least(col("a"), col("b")).as("x"),
        greatest(col("a"), col("b")).as("y")).distinct(),
      "tri_edges")
    val deg = und.select(col("x").as("v")).unionAll(und.select(col("y").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // Orient x—y from the (deg, id)-smaller endpoint to the larger.
    val withDeg = und
      .join(deg.withColumnRenamed("v", "x").withColumnRenamed("deg", "dx"), Seq("x"))
      .join(deg.withColumnRenamed("v", "y").withColumnRenamed("deg", "dy"), Seq("y"))
    val xOrd = struct(col("dx").as("d"), col("x").as("n"))
    val yOrd = struct(col("dy").as("d"), col("y").as("n"))
    val out = graft.scale.Silver.scratch(withDeg.select(
      when(xOrd < yOrd, col("x")).otherwise(col("y")).as("src"),
      when(xOrd < yOrd, col("y")).otherwise(col("x")).as("dst"),
      when(xOrd < yOrd, yOrd).otherwise(xOrd).as("dord")),
      "tri_oriented")
    // Wedges from each apex: two out-edges, ordered by the dst's ≺ rank so
    // each unordered wedge appears once; closed by the oriented (v,w) edge.
    // Two physical strategies behind one logical op, gated on edge count
    // (read off the tiny degree table):
    //
    //  - broadcast-sized graphs: join each oriented edge (u,v) with the
    //    BROADCAST out-adjacency table for both endpoints and explode
    //    N⁺(u) ∩ N⁺(v) — each element w closes the triangle {u,v,w}
    //    exactly once (w ∈ N⁺(v) means the v→w closing edge exists; the
    //    other two edge rotations fail the N⁺ membership test). The
    //    Σ outdeg² wedge set is never materialized, nothing shuffles but
    //    the final per-node aggregate.
    //  - big graphs (the 100 TB shape): enumerate wedges via the src
    //    self-join and close them with a shuffle equi-join on (v,w) —
    //    all shuffles are on edge keys, no single broadcast grows with
    //    the graph.
    // sum() over zero rows is NULL — an empty graph must yield an empty
    // result, not an NPE. The broadcast gate is sized in BYTES, not edge
    // count: the broadcast side is the out-adjacency table (one id per
    // oriented edge + per-node row overhead), so estimate m × 16 bytes
    // and require it under a driver-safe cap. Edge-count gates lie —
    // 10 M edges of long ids is ~160 MB before kryo overhead, already
    // past the point where shipping it to every executor beats one
    // keyed shuffle.
    val m = Option(deg.agg(sum(col("deg"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L) / 2
    val adjBytesEst = m * 16L
    val tris =
      if (adjBytesEst <= BroadcastMaxBytes) {
        val adj = out.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        out.join(broadcast(adj.select(col("src").as("u1"), col("nbrs").as("nu"))),
            col("src") === col("u1"))
          .join(broadcast(adj.select(col("src").as("u2"), col("nbrs").as("nv"))),
            col("dst") === col("u2"))
          .select(col("src").as("n1"), col("dst").as("n2"),
            explode(array_intersect(col("nu"), col("nv"))).as("n3"))
      } else {
        val e1 = out.select(col("src"), col("dst").as("v"), col("dord").as("vord"))
        val e2 = out.select(col("src"), col("dst").as("w"), col("dord").as("word"))
        val wedges = e1.join(e2, Seq("src")).filter(col("vord") < col("word"))
        val closing = out.select(col("src").as("v"), col("dst").as("w"))
        wedges.join(closing, Seq("v", "w"))
          .select(col("src").as("n1"), col("v").as("n2"), col("w").as("n3"))
      }
    tris.select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }

  /** q_triangles: parts that co-occur in the same order form an edge;
    * per-part triangle counts over that graph. */
  def triangleQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("i").join(li.as("j"),
        col("i.l_orderkey") === col("j.l_orderkey") &&
          col("i.l_partkey") < col("j.l_partkey"))
      .select(col("i.l_partkey").as("a"), col("j.l_partkey").as("b"))
    nodeTriangleCounts(edges).orderBy("node")
  }
}
