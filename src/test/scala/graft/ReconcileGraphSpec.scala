package graft

import org.apache.spark.sql.functions._

import graft.operators.{Reconcile, Triangles}

/** Round-6 operators: Merkle snapshot reconciliation and degree-ordered
  * triangle counting, on hand-built inputs with known answers. */
class ReconcileGraphSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff labels changed/only_a/only_b and nothing else") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("k", "fp")
    val b = Seq((1L, "one"), (2L, "TWO"), (4L, "four"), (5L, "five"))
      .toDF("k", "fp")
    val got = Reconcile.snapshotDiff(a, b, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "only_a", 5L -> "only_b"))
  }

  test("snapshotDiff of identical snapshots is empty (all buckets pruned)") {
    val a = (1L to 200L).map(k => (k, s"fp$k")).toDF("k", "fp")
    assert(Reconcile.snapshotDiff(a, a, buckets = 8).count() == 0)
    // And the checksum tables themselves agree bucket by bucket.
    val cs = Reconcile.bucketChecksums(a, col("k"), col("fp"), 8)
    assert(Reconcile.driftedBuckets(cs, cs).count() == 0)
  }

  test("nodeTriangleCounts: K4 plus a pendant edge") {
    // Complete graph on {1,2,3,4}: 4 triangles, each node in 3.
    // Pendant 4-5 adds no triangle; 5 absent from output.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Triangles.nodeTriangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("nodeTriangleCounts: empty edge list yields empty result, no NPE") {
    // sum() over zero rows is NULL — the edge-count scalar must be
    // null-guarded, not head().getLong'd.
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Triangles.nodeTriangleCounts(edges).count() == 0)
  }

  test("nodeTriangleCounts: duplicate and reversed edges collapse") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = Triangles.nodeTriangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  /** Independent single-threaded reimplementation of the quantized
    * PageRank recurrence (Map-based, no Spark) — the cross-check that
    * the distributed joins implement the recurrence, not an artifact. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val out = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(_ -> graft.operators.PageRank.Init).toMap
    for (_ <- 1 to iters) {
      val inc = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map(e => rank(e._1) / out(e._1)).sum }
      rank = nodes.map(n =>
        n -> (graft.operators.PageRank.Init * 15L / 100L +
          85L * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("kcore: K4 core survives, pendant peels, path cascades to nothing") {
    // K4 on 1-4 (a 3-core) + pendant 5-1: pendant peels round 1, K4 stays.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L))
    val core = graft.operators.KCore.kcore(k4.toDF("a", "b"), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // A path has no 2-core: endpoints peel each round until nothing is left
    // — the cascade needs the multiple rounds.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(graft.operators.KCore.kcore(path, k = 2, rounds = 4).count() == 0)
    // ...and with too few rounds the same path is NOT yet empty (the
    // fixed-round semantics is real, not a fixpoint in disguise).
    assert(graft.operators.KCore.kcore(path, k = 2, rounds = 1).count() > 0)
  }

  test("bfs: exact hop distances, round cap, multi-source min") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    def run(seeds: Seq[Long], rounds: Int) =
      graft.operators.KCore.bfs(path, seeds.toDF("node"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single seed, capped at 3 hops: nodes 5 and 6 not yet reached
    assert(run(Seq(1L), 3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // enough rounds: full BFS distances
    assert(run(Seq(1L), 5) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
    // two seeds: every node takes the nearer one
    assert(run(Seq(1L, 6L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("pagerank: symmetric cycle is a fixed point at Init") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = graft.operators.PageRank.pagerank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> graft.operators.PageRank.Init,
      2L -> graft.operators.PageRank.Init))
  }

  test("pagerank matches the independent reimplementation on an asymmetric graph") {
    // Hub with reciprocated spokes + a dangling sink + a duplicate edge.
    val es = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (4L, 5L), (1L, 2L))
    val got = graft.operators.PageRank.pagerank(es.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(es, 5))
    // The hub with two reciprocated in-spokes outranks everything.
    assert(got(1L) == got.values.max)
  }
}
