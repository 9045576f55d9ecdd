package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability — the Spark-native mapping of the reference's
  * monitoring stack (SURVEY.md §4.1 / §3.3):
  *
  *  - Prometheus query-duration histograms
  *    (reference src/monitoring/prometheus_metrics.py:140-152)
  *    → [[QueryMetrics]], a `QueryExecutionListener` recording per-action
  *    duration + output rows from the executed plan's own metrics.
  *  - Per-scraper result accounting `{status, items_scraped,
  *    duration_seconds}` (scraping_orchestrator.py:76-94) and the daily
  *    analytics stage map with isolated error capture
  *    (analytics_app.py:133-189) → [[Stages.runAll]].
  *  - Live throughput monitoring (system_monitor.py) →
  *    [[BatchRates]], a `StreamingQueryListener` over micro-batch
  *    progress events.
  *
  * All three buffer into lock-free queues on the listener-bus thread and
  * expose the records as DataFrames — metrics are data, queryable by the
  * same engine they measure. Nothing here touches a query's own plan:
  * the executed plan's `numOutputRows` metric is read after the fact, so
  * observability adds zero per-row cost.
  */
object Observability {

  /** One completed (or failed) query action. */
  final case class QueryRecord(
      action: String,
      durationMs: Double,
      outputRows: Long, // -1 when the root operator exposes no row metric
      status: String,
      error: String)

  /** Query-duration/row recorder. Register/unregister around a scope:
    * {{{
    * val m = new QueryMetrics
    * spark.listenerManager.register(m)
    * try { ... } finally spark.listenerManager.unregister(m)
    * }}}
    * Events arrive asynchronously on the listener bus; [[awaitRecords]]
    * polls until at least n records landed (test/report convenience). */
  final class QueryMetrics extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[QueryRecord]()

    private def rowsOf(qe: QueryExecution): Long =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      buf.add(QueryRecord(funcName, durationNs / 1e6, rowsOf(qe), "ok", ""))

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      buf.add(QueryRecord(funcName, 0.0, -1L, "failed",
        String.valueOf(exception.getMessage)))

    def records: Seq[QueryRecord] = buf.iterator().asScala.toSeq

    def awaitRecords(n: Int, timeoutMs: Long = 10000): Seq[QueryRecord] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (buf.size() < n && System.nanoTime() < deadline) Thread.sleep(20)
      records
    }

    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      records.toDF()
    }
  }

  /** One micro-batch progress sample. */
  final case class BatchRecord(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double)

  /** Streaming throughput recorder (micro-batch rate per progress event). */
  final class BatchRates extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchRecord]()

    override def onQueryStarted(
        event: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        event: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = event.progress
      buf.add(BatchRecord(String.valueOf(p.name), p.batchId,
        p.numInputRows, p.processedRowsPerSecond))
    }

    override def onQueryTerminated(
        event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def records: Seq[BatchRecord] = buf.iterator().asScala.toSeq

    def awaitRecords(n: Int, timeoutMs: Long = 20000): Seq[BatchRecord] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (buf.size() < n && System.nanoTime() < deadline) Thread.sleep(20)
      records
    }

    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      records.toDF()
    }
  }
}

/** Component health checks (reference src/monitoring/health_checks.py:
  * per-component status with latency plus an overall verdict). The
  * engine's components are its session and its tables: a component is
  * healthy when the session schedules jobs and the table's first row is
  * readable (scan + decode path exercised, not just file existence).
  */
object HealthCheck {

  final case class ComponentHealth(
      component: String,
      status: String, // "healthy" | "unhealthy"
      latencyMs: Double,
      detail: String)

  private def timed(name: String)(probe: => String): ComponentHealth = {
    val t0 = System.nanoTime()
    try {
      val d = probe
      ComponentHealth(name, "healthy", (System.nanoTime() - t0) / 1e6, d)
    } catch {
      case e: Throwable =>
        ComponentHealth(name, "unhealthy", (System.nanoTime() - t0) / 1e6,
          String.valueOf(e.getMessage))
    }
  }

  /** Check the session plus every corpus table; overall status is the
    * conjunction (`check_all_components` contract). */
  def checkAll(spark: SparkSession, dir: String): (String, Seq[ComponentHealth]) = {
    val session = timed("session") {
      val n = spark.range(1).count(); s"scheduled ok ($n)"
    }
    val tables = graft.sources.Tables.names.map { t =>
      timed(s"table:$t") {
        val row = graft.sources.Tables.load(spark, dir, t).limit(1).collect()
        s"readable, first-row fields=${if (row.isEmpty) 0 else row.head.size}"
      }
    }
    val all = session +: tables
    val overall =
      if (all.forall(_.status == "healthy")) "healthy" else "unhealthy"
    (overall, all)
  }

  def toDF(spark: SparkSession, checks: Seq[ComponentHealth]): DataFrame = {
    import spark.implicits._
    checks.toDF()
  }
}

/** Sequential stage runner with isolated error capture — the reference's
  * daily-analytics shape (analytics_app.py:133-189: each stage try/except,
  * pipeline continues, stage-level success map as the job result) and its
  * per-scraper result accounting (scraping_orchestrator.py:76-94).
  */
object Stages {

  final case class StageResult(
      stage: String,
      status: String, // "ok" | "failed"
      items: Long, // rows materialized by the stage (-1 on failure)
      durationSeconds: Double,
      error: String)

  /** Run one named stage: materializes the job's frame (count = the
    * terminal action), times it, never throws. */
  def run(name: String)(job: => DataFrame): StageResult = {
    val t0 = System.nanoTime()
    try {
      val n = job.count()
      StageResult(name, "ok", n, (System.nanoTime() - t0) / 1e9, "")
    } catch {
      case e: Throwable =>
        StageResult(name, "failed", -1L, (System.nanoTime() - t0) / 1e9,
          String.valueOf(e.getMessage))
    }
  }

  /** Run stages in order; a failure is recorded and the remaining stages
    * still run (isolated error capture). */
  def runAll(stages: Seq[(String, () => DataFrame)]): Seq[StageResult] =
    stages.map { case (name, job) => run(name)(job()) }

  def toDF(spark: SparkSession, results: Seq[StageResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
  }
}
