package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ranking
import graft.sources.Tables

/** Model-evaluation aggregates — the offline-metrics layer next to
  * [[Models]]'s pipelines (reference: the analytics engine's
  * prediction-quality reporting, src/analytics/engine.py model summaries).
  *
  * Both metrics here are computed WITHOUT floating-point accumulation:
  * AUC through the rank-sum (Mann–Whitney) identity over exact doubled
  * midranks, calibration through exact per-bin counting — so the DuckDB
  * oracle replays them bit-identically, and at cluster scale they cost
  * one map-side-combining shuffle plus dimension-sized arithmetic.
  */
object Eval {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Label frame shared by [[aucQuery]] and [[calibrationQuery]]: every
    * ORDER, scored by total price (cents), labeled 1 when any of its
    * lineitems was returned (l_returnflag = 'R'). Order-level — not
    * customer-level — keeps both classes populated at every corpus
    * size (at tiny SFs virtually every CUSTOMER eventually has a
    * return, degenerating a customer-level label). The label semi-
    * aggregates the fact side before touching the order dimension. */
  private def scoredLabels(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey")).distinct()
      .withColumn("__pos", lit(1L))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("v"))
      .join(returned, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("v"),
        coalesce(col("__pos"), lit(0L)).as("y"))
  }

  /** ROC AUC of "order price predicts a returned line" (q_auc),
    * via the rank-sum identity AUC = U / (n₁·n₀): per distinct score
    * the positive/negative counts, cumulative totals through
    * [[Ranking.distributedCumSum]] (range exchange + broadcast offsets
    * — no single-partition window), doubled midranks so ties stay
    * integer (2·midrank = 2·cumBefore + t + 1, the [[
    * graft.operators.Distribution.mannWhitney]] device), and ONE
    * terminal division. An AUC that needs no per-threshold sweep and no
    * float accumulation — the scale-out form of the metric. */
  def aucQuery(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val per = scoredLabels(spark, dir)
      .groupBy("v")
      .agg(sum(col("y")).as("a"),
        sum(lit(1L) - col("y")).as("b"))
      .withColumn("t", col("a") + col("b"))
    val cum = Ranking.distributedCumSum(per, Seq(col("v").asc), Seq("t"))
    cum.agg(
        sum(col("a")).as("n_pos"), sum(col("b")).as("n_neg"),
        sum(col("a").cast(d38) *
          (lit(2).cast(d38) * col("cum_t").cast(d38) -
            col("t").cast(d38) + lit(1).cast(d38))).as("rank2_pos"))
      .select(col("n_pos"), col("n_neg"),
        (col("rank2_pos") -
          col("n_pos").cast(d38) * (col("n_pos") + 1).cast(d38))
          .cast("long").as("u2"),
        ((col("rank2_pos") -
          col("n_pos").cast(d38) * (col("n_pos") + 1).cast(d38))
          .cast("double") /
          (lit(2).cast(d38) * col("n_pos").cast(d38) * col("n_neg").cast(d38))
            .cast("double")).as("auc"))
  }

  /** Calibration table (q_calibration): orders bucketed into score
    * deciles by price rank, each decile's observed positive rate vs
    * the population rate and its lift. Deciles come from the
    * distributed global rank under the unique (v, orderkey) order —
    * decile = ((rank−1)·10) div n, an integer assignment identical in
    * both engines — and every rate is a ratio of exact counts. The
    * gains column (cumulative share of positives captured by the top
    * deciles) makes this double as the lift/gains chart. */
  def calibrationQuery(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Ranking.distributedGlobalRank(
      scoredLabels(spark, dir),
      Seq(col("v").desc, col("o_orderkey").asc), rankCol = "r", nCol = "__n")
    val byDecile = ranked
      .withColumn("decile", expr("((r - 1) * 10) div __n"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val tot = byDecile.agg(sum(col("n")).as("tot_n"),
      sum(col("n_pos")).as("tot_pos"))
    val cum = Ranking.distributedCumSum(byDecile, Seq(col("decile").asc),
      Seq("n_pos"))
    cum.crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("rate"),
        ((col("n_pos") * col("tot_n")).cast("double") /
          (col("n") * col("tot_pos")).cast("double")).as("lift"),
        (col("cum_n_pos").cast("double") / col("tot_pos").cast("double"))
          .as("gain"))
      .orderBy("decile")
  }
}
