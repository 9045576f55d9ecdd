package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Merge

/** q_stream_upsert — the ORACLE-CHECKED streaming witness (SURVEY §2.10).
  *
  * The T1-T8 streaming components are spec-proven (StreamingSpec shows
  * foreachBatch ≡ batch recompute), but until round 10 only `q_live_norm`
  * surfaced any streaming path to the driver's DuckDB hard signal, and it
  * exercises the normalization expressions, not the upsert loop. This
  * query replays the events table through a REAL Structured Streaming
  * run — file source, multiple micro-batches, the same
  * foreachBatch/last-writer-wins merge shape as [[LiveScores]] — and
  * returns the final upserted state, which DuckDB reproduces with one
  * arg-max window. Reference semantics: the last-writer-wins ON CONFLICT
  * upsert of reference src/database/manager.py:122-151
  * (`WHERE excluded.updated_at > live_scores.updated_at`).
  *
  * Determinism: the input is sliced into `Slices` disjoint file drops by
  * `event_id mod Slices` (pure function of the data), streamed with
  * `maxFilesPerTrigger=1` under `Trigger.AvailableNow` — so the upsert
  * loop really executes ≥ `Slices` micro-batches — and merged with
  * last-writer-wins on `user_id` versioned by the TOTAL order
  * `(ts_ms, event_id)`. That merge is associative and commutative, so
  * the final state is independent of batch boundaries and arrival order:
  * exactly the property that makes a streaming pipeline oracle-checkable
  * by a batch engine, and the property the reference's conditional
  * upsert relies on when scrape tasks race.
  *
  * Scale shape: each micro-batch shuffles once on the key (rank-dedup +
  * key-matched merge), state is keyed by user — the same bounded-state
  * argument as [[LiveScores]]; at 100 TB the parquet-swap state becomes
  * a transactional table, same semantics. The replay harness itself
  * (temp-dir slicing) is test scaffolding around the production
  * `foreachBatch` body, sized to the verification corpus.
  */
object StreamReplay {

  val Slices = 4

  /** Count of non-empty micro-batch upserts executed (all replays in
    * this JVM) — lets StreamingSpec assert the replay really went
    * through ≥ [[Slices]] micro-batches rather than one big batch. */
  val batchesExecuted = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One micro-batch of the K1 upsert: merge into the parquet state dir,
    * greatest (ts_ms, event_id) wins per user_id. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, stateDir: String): Unit = {
    if (batch.isEmpty) return
    batchesExecuted.incrementAndGet()
    // existence-gated (not try/catch): the first batch has no state yet,
    // and letting the analyzer throw would spew a benign-but-alarming
    // stack trace into the driver's tail-captured log
    val current =
      if (new java.io.File(stateDir).exists())
        spark.read.schema(batch.schema).parquet(stateDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    val merged = Merge.upsertLatest(current, batch,
      keys = Seq("user_id"), version = Seq("ts_ms", "event_id"))
      .localCheckpoint(true) // materialize before overwriting our own input
    merged.write.mode("overwrite").parquet(stateDir)
  }

  /** Run the replay end-to-end and return the final state. The streaming
    * job executes eagerly inside this call (AvailableNow, awaited); the
    * result is localCheckpointed so the temp scaffolding can be deleted
    * before the caller consumes it. */
  def streamUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_ms"))
    val base = java.nio.file.Files.createTempDirectory("graft_stream_replay")
    val in = base.resolve("in"); val ckpt = base.resolve("ckpt")
    val state = base.resolve("state").toString
    (0 until Slices).foreach { k =>
      ev.filter(pmod(col("event_id"), lit(Slices)) === k)
        .coalesce(1) // one file per drop -> one micro-batch per drop
        .write.parquet(in.resolve(s"slice_$k").toString)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(in.toString)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        upsertBatch(b.sparkSession, b, state)
      }
      .start()
    q.awaitTermination()
    val res = spark.read.schema(ev.schema).parquet(state)
      .localCheckpoint(true)
    deleteTree(base.toFile)
    res.orderBy("user_id")
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete()
  }
}
