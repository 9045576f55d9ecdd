package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, EventOps}
import graft.ml.Models
import graft.tools.Stages

/** The scheduled daily-analytics job (SURVEY.md §3.3 — reference
  * `src/apps/analytics_app.py:133-189` `run_daily_analytics`): four
  * sequential stages with isolated error capture, returning the
  * stage-level success map. The reference's stages — model update,
  * top-performers report, transfer analysis, weekly summary — map to the
  * corpus equivalents below; each stage is a DataFrame job materialized
  * by its own terminal action, so one stage's failure cannot poison
  * another's plan.
  *
  * The model stage fits the §2.11 performance pipeline on
  * customer-order features (matches_played>=10 gate ≙ the order-count
  * filter) and scores the held-out split — the train-then-score contract
  * of `analytics_app.py:191-213`.
  */
object DailyAnalytics {

  /** Customer spend features for the model stage: total/avg spend and
    * order count per customer with a minimum-activity gate. */
  private def customerFeatures(spark: SparkSession, dir: String,
                               minOrders: Long = 10): DataFrame =
    graft.sources.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).cast("long").as("order_cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spend"),
        avg(col("o_totalprice")).as("avg_spend"))
      .filter(col("order_cnt") >= minOrders)

  /** Run the daily pipeline; never throws — failures land in the result
    * map, later stages still run (the reference's isolated try/except
    * per stage). */
  def run(spark: SparkSession, dir: String): Seq[Stages.StageResult] =
    Stages.runAll(Seq(
      "model_update" -> (() => {
        val feats = customerFeatures(spark, dir)
        val (train, test) = Models.trainTestSplit(feats)
        val model = Models.fit(
          Models.performancePipeline(Seq("order_cnt", "avg_spend"), "total_spend"),
          train)
        model.transform(test).select("o_custkey", "total_spend", "prediction")
      }),
      "top_performers" -> (() => Analytics.topSpenders(spark, dir)),
      "transfer_analysis" -> (() =>
        graft.sources.RoundTrip.transfersFromCustomers(spark, dir)),
      "weekly_summary" -> (() => EventOps.weeklyEventRollup(spark, dir))))
}
