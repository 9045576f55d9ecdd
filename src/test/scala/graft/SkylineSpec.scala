package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline
import graft.scale.Dedup

/** Round-6 operators: skyline (both paths agree + brute-force oracle),
  * the JaroWinkler codegen expression (pinned literals + bounds), and the
  * prefix-filtered similarity join (losslessness vs the capped blocked
  * join's exact scoring on a hand corpus). */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, dx, dy) =>
        dx <= x && dy <= y && (dx < x || dy < y) }
    }.map(_._1).toSet

  test("skyline: generic path matches brute force, duplicates both kept") {
    val pts = Seq(
      (1L, 1.0, 9.0), (2L, 3.0, 7.0), (3L, 3.0, 7.0), // 2,3 duplicates
      (4L, 5.0, 5.0), (5L, 4.0, 8.0),                 // 5 dominated by 2
      (6L, 9.0, 1.0), (7L, 9.0, 2.0),                 // 7 dominated by 6
      (8L, 2.0, 9.5))                                 // dominated by 1
    val df = pts.toDF("id", "x", "y").repartition(3)
    val got = Skyline.skyline(df, Seq("x", "y")).collect().map(_.getLong(0)).toSet
    assert(got == bruteSkyline(pts))
    assert(got.contains(2L) && got.contains(3L)) // equal points: neither dominates
  }

  test("skyline: exchange before the final pass keeps phase 1 parallel") {
    // coalesce(1) is a narrow dependency that would fuse the per-partition
    // local-skyline pass into the single final task; the plan must show a
    // real stage boundary (shuffle exchange) between the two passes.
    val df = (1L to 1000L).map(i => (i, (i % 37).toDouble, (i % 41).toDouble))
      .toDF("id", "x", "y").repartition(8)
    val plan = Skyline.skyline(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"no exchange between skyline phases — phase 1 serialized:\n$plan")
  }

  test("skyline2d agrees with the generic path on part data") {
    val df = spark.read.parquet(s"${TestSpark.Sf0001}/part.parquet")
      .select(col("p_partkey").as("id"), col("p_retailprice").as("x"),
        (-col("p_size")).cast("double").as("y"))
    val generic = Skyline.skyline(df, Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet
    val windowed = Skyline.skyline2d(df, col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet
    assert(generic == windowed && generic.nonEmpty)
  }

  test("jaro-winkler: pinned DuckDB-verified literals") {
    val r = evalExpr(
      expr("graft_jaro_winkler('martha', 'marhta')"),
      expr("graft_jaro_winkler('dixon', 'dicksonx')"),
      expr("graft_jaro_winkler('', '')"),
      expr("graft_jaro_winkler('a', 'a')"),
      expr("graft_jaro_winkler('CRANE', 'DRAIN')"),
      expr("graft_jaro_winkler('jellyfish', 'smellyfish')"))
    assert(r.getDouble(0) == 0.9611111111111111) // boost, prefix 3
    assert(r.getDouble(1) == 0.8133333333333332) // boost, prefix 2
    assert(r.getDouble(2) == 0.0)                // both empty -> 0 (DuckDB)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.7333333333333334) // >0.7 but prefix 0
    assert(r.getDouble(5) == 0.8962962962962964) // no common prefix
  }

  test("jaro-winkler: bounds and symmetry on corpus names") {
    val c = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
      .select(col("c_name").as("a"), reverse(col("c_name")).as("b"))
    val bad = c.selectExpr("graft_jaro_winkler(a, b) AS ab",
        "graft_jaro_winkler(b, a) AS ba")
      .filter(col("ab") =!= col("ba") || col("ab") < 0 || col("ab") > 1)
    assert(bad.count() == 0)
  }

  test("prefix join: finds exactly the >= tau pairs on a hand corpus") {
    // j(1,2) = 4/6 >= 3/5; j(1,3) = 2/8 < 3/5; j(2,3) = 2/8 < 3/5;
    // 4 and 1 share nothing.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d x"),
      (3L, "a b p q r s"), (4L, "z w")).toDF("doc_id", "text")
    val out = Dedup.prefixFilteredPairs(docs).orderBy("d1", "d2").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out.head.getLong(2) == 4L && out.head.getDouble(3) == 4.0 / 6)
  }

  test("prefix length formula: n - ceil(tau*n) + 1, floored at 1") {
    // tau = 3/5: n=5 -> 5-3+1=3; n=6 -> 6-4+1=3; n=1 -> 1-1+1=1.
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f"), (3L, "q"))
      .toDF("doc_id", "text")
    // Reach through the pipeline: pairs of identical docs score 1.0.
    val dup = docs.union(Seq((11L, "a b c d e"), (12L, "a b c d e f"),
      (13L, "q")).toDF("doc_id", "text"))
    val out = Dedup.prefixFilteredPairs(dup).collect()
    val ids = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 11L), (2L, 12L), (3L, 13L)).subsetOf(ids))
    assert(out.filter(r => r.getLong(1) - r.getLong(0) == 10).forall(_.getDouble(3) == 1.0))
  }
}
