package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.scale.Silver
import graft.sources.Tables

/** Distributed Lloyd's k-means over embedding vectors — the second
  * ITERATIVE workload family next to [[PageRank]]/[[KCore]]: an
  * assign-aggregate loop instead of a join-aggregate loop. This is the
  * clustering pass behind IVF index construction
  * (`graft.scale.Similarity.ivfBuild` runs exactly this shape via Spark
  * ML), topic bucketing, and SemDeDup's cluster stage; here it is built
  * from first principles so the recurrence itself is oracle-checkable.
  *
  * Arithmetic is INTEGER-QUANTIZED like PageRank: components are
  * shifted positive and floored to fixed-point units
  * (`floor((x+1)·10⁴)` — the shift keeps every value, sum, and integer
  * division in the nonnegative domain where Spark's `div` and DuckDB's
  * `//` provably agree), distances are exact Long sums of squared
  * integer diffs (≤ (1.1·10⁴)²·64 ≈ 7.7·10⁹ per pair — no overflow),
  * and each new centroid component is `sum div count`. Every round is
  * bit-stable under any partitioning and replays exactly in DuckDB as
  * unrolled MATERIALIZED CTE rounds. Ties (equidistant centroids) break
  * to the smallest centroid id via the min-struct argmin.
  *
  * Scale shape (per round): one broadcast of the k-row centroid table
  * against the vector corpus (k·n slim rows, no shuffle of the
  * vectors), one min-struct argmin aggregate keyed by vec_id (partial-
  * combining), one posexplode + (cid, pos)-keyed sum for the update —
  * k·dim result rows. Vectors are materialized once; the tiny per-round
  * centroid table is materialized each round, which is also the
  * iterative lineage cut (the expensive subtree below it never stacks).
  * Empty clusters deterministically keep their previous centroid. No
  * driver-side state beyond the round counter.
  */
object KMeans {

  /** Fixed-point quantization: floor((x+1)·10⁴) per component. */
  private def quantize(v: Column): Column =
    transform(v, x => floor((x.cast("double") + 1d) * 10000d).cast("long"))

  /** Exact squared L2 distance between two quantized (long) arrays. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** `iters` Lloyd rounds over `vecs` (columns `vec_id`, `q`: quantized
    * long array). Seeds = the k smallest vec_ids' vectors. Returns the
    * final per-vector assignment (vec_id, cid, dist). */
  def assignments(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val v = Silver.scratch(vecs.select(col("vec_id"), col("q")), "km_vecs")
    var centroids = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("q").as("c"))
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = v.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("q"),
          struct(sqDist(col("q"), col("c")).as("dist"), col("cid")).as("dc"))
        .groupBy(col("vec_id"))
        .agg(first(col("q")).as("q"), min(col("dc")).as("w"))
        .select(col("vec_id"), col("q"),
          col("w.cid").as("cid"), col("w.dist").as("dist"))
      if (i < iters) {
        val sums = assigned
          .select(col("cid"), posexplode(col("q")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
          .select(col("cid"), col("pos"), expr("sx div n").as("comp"))
        val updated = sums.groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
            s => s.getField("comp")).as("c"))
        // Empty clusters keep their previous centroid (deterministic).
        centroids = Silver.scratch(
          centroids.select(col("cid"), col("c").as("c_prev"))
            .join(updated, Seq("cid"), "left")
            .select(col("cid"), coalesce(col("c"), col("c_prev")).as("c")),
          "km_centroids")
      }
    }
    assigned.select("vec_id", "cid", "dist")
  }

  /** q_kmeans: 4 rounds, k = 8, over the embeddings corpus; per-cluster
    * summary (size, member-id checksum, exact inertia, centroid-of-
    * members fingerprint — Σ (pos+1)·mean-component, which pins the
    * POST-final-assignment means and therefore every prior round). */
  def kmeansQuery(spark: SparkSession, dir: String, k: Int = 8,
                  iters: Int = 4): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    val a = Silver.scratch(
      assignments(vecs.select(col("vec_id"), col("q")), k, iters), "km_assign")
    val fp = a.join(vecs, "vec_id")
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("sum(x) div count(1)").as("comp"))
      .groupBy("cid")
      .agg(sum((col("pos") + 1) * col("comp")).as("centroid_fp"))
    a.groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("sum_vec_id"),
        sum(col("dist")).as("inertia"))
      .join(fp, "cid")
      .select("cid", "n_members", "sum_vec_id", "inertia", "centroid_fp")
      .orderBy("cid")
  }

  /** q_cluster_purity: evaluate the k-means clustering against the
    * corpus's ground-truth `label` column — per cluster, the majority
    * label (argmax count, ties to the smaller label via the min-struct
    * idiom on (−cnt, label)) and its purity fraction. The
    * clustering-evaluation pass every embedding-pipeline run ends with;
    * one (cid, label)-keyed count plus a k-row argmin — no new heavy
    * structure beyond the assignment job itself. */
  def clusterPurityQuery(spark: SparkSession, dir: String, k: Int = 8,
                         iters: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val vecs = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val a = assignments(vecs, k, iters)
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
    val byLabel = a.groupBy("cid", "label").agg(count(lit(1)).as("cnt"))
    val maj = byLabel
      .groupBy("cid")
      .agg(min(struct((-col("cnt")).as("neg"), col("label"))).as("w"),
        sum(col("cnt")).as("n_members"))
      .select(col("cid"), col("n_members"),
        col("w.label").as("majority_label"), (-col("w.neg")).as("majority_cnt"))
    maj
      .withColumn("purity",
        col("majority_cnt").cast("double") / col("n_members"))
      .select("cid", "n_members", "majority_label", "majority_cnt", "purity")
      .orderBy("cid")
  }
}
