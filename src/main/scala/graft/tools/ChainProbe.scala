package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Float-chain semantics probe — the Spark half of the measurement
  * harness behind SCALE.md's round-11 audit rule (the DuckDB half is
  * the randomized bit-compare documented there: the oracle engine
  * stops evaluating ± chains per-op-IEEE at ≥ 5 operands with ≥ 3
  * inexact-literal mul/div factors).
  *
  * This main answers the mirror-image question: does SPARK ever
  * deviate from strict per-op left-associated IEEE evaluation on the
  * same shapes (Catalyst reassociation, codegen vs interpreted
  * differences)? It builds the exact 10-term literal-weight chain that
  * diverged cross-engine in r10 (the q_ndcg shape), evaluates it
  * through whole-stage codegen AND the interpreted path, and
  * bit-compares every row against a driver-side strict left-assoc
  * fold. Run it after any Spark version bump: a nonzero count means
  * the OracleChainGateSpec rule must start covering Spark-side closing
  * trees too.
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val W = Seq(1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
      0.38685280723454163, 0.3562071871080222, 0.3333333333333333,
      0.31546487678572877, 0.3010299956639812, 0.2890648263178879)
    val rng = new java.util.Random(7)
    val rows = (0 until 100000)
      .map(_ => (0 until 10).map(_ => rng.nextInt(1001).toLong))
    val df = rows.map(r => (r(0), r(1), r(2), r(3), r(4),
        r(5), r(6), r(7), r(8), r(9)))
      .toDF((0 until 10).map(i => s"c$i"): _*)
    val chain = (0 until 10)
      .map(i => col(s"c$i").cast("double") * lit(W(i))).reduceLeft(_ + _)
    def strict(r: Seq[Long]): Double = {
      var acc = 0.0
      (0 until 10).foreach(i => acc = acc + r(i).toDouble * W(i))
      acc
    }
    def mismatches(): Int = {
      val out = df.select(chain.as("s")).collect().map(_.getDouble(0))
      rows.zip(out).count { case (r, o) => strict(r) != o }
    }
    println(s"codegen path vs strict per-op left-assoc: ${mismatches()} / ${rows.size}")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    println(s"interpreted path: ${mismatches()} / ${rows.size}")
    spark.stop()
  }
}
