package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.scale.{Dedup, TextAnalysis}

/** Incremental corpus-ingestion dedup (the streaming arm of the
  * [[graft.scale.Dedup]] family): as new documents arrive, drop exact
  * duplicates (a) of other in-flight documents and (b) of everything
  * already accepted into the corpus.
  *
  * Shape at scale:
  *  - in-stream: normalize-fingerprint (md5 of whitespace/case-folded
  *    text, same device as the batch pipeline) +
  *    `dropDuplicatesWithinWatermark` — state is one fingerprint per doc
  *    inside the watermark horizon, evicted as event time advances, so
  *    state size tracks ingest-rate × watermark, not corpus size.
  *  - vs history: stream-static left-anti join against the accepted
  *    fingerprint table. The static side is re-read per micro-batch, so
  *    a compacted parquet/bucketed fingerprint table (bucketed on
  *    fingerprint → join without shuffling the stream side) keeps this
  *    O(batch) per trigger even when the corpus is 100 TB.
  *
  * The near-dup variant runs the same graph with
  * [[graft.scale.Dedup.simhash]] signatures instead of exact
  * fingerprints (banded equality in the anti-join).
  */
object StreamDedup {

  /** Documents surviving both dedup gates. Input needs (text,
    * ingested_at); `historical` needs a `fingerprint` column. */
  def novelDocs(stream: DataFrame, historical: DataFrame,
                watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ingested_at", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .join(historical.select("fingerprint"), Seq("fingerprint"), "left_anti")

  /** Per-document MinHash LSH band buckets as a single row expression —
    * no explode/groupBy, so it runs on a stream row as written: the
    * signature's min-over-shingles is `array_min` over the shingle array
    * (identical values to the batch [[Dedup.minhashSignatures]]
    * aggregate), banded exactly like [[Dedup.minhashPairs]]. Short docs
    * (< shingle length) yield null buckets, which never join-match —
    * they pass the near-dup gate by construction. */
  def minhashBandBuckets(text: Column): Column = {
    val sh = Dedup.shingles(split(text, " "))
    val ms = (0 until Dedup.NumHashes).map(i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i|"), s)))))
    // Band over the BandWidth constant itself (not an unrolled width-2
    // literal): retuning Dedup.BandWidth must retune this expression in
    // lockstep, or stream buckets silently stop matching batch-built
    // index rows — no error, just zero near-dup detections.
    array((0 until Dedup.NumHashes / Dedup.BandWidth).map(b =>
      md5(concat(
        (b * Dedup.BandWidth until (b + 1) * Dedup.BandWidth).map(ms): _*))): _*)
  }

  /** Near-dup novelty gate for one micro-batch (run inside foreachBatch,
    * like the upsert sinks): drop every incoming doc sharing ≥1 MinHash
    * band bucket with the accepted corpus. `bandIndex` is the corpus's
    * (band, bucket) table — bucketed on `bucket` in production so the
    * semi-join never shuffles more than the batch. Survivors' band rows
    * are what the caller appends back to the index. */
  def novelByMinhash(batch: DataFrame, bandIndex: DataFrame): DataFrame = {
    val bands = batch.select(col("doc_id"),
      posexplode(minhashBandBuckets(col("text"))).as(Seq("band", "bucket")))
    val collided = bands
      .join(bandIndex.select(col("band").cast("int").as("band"), col("bucket")),
        Seq("band", "bucket"), "left_semi")
      .select("doc_id").distinct()
    batch.join(collided, Seq("doc_id"), "left_anti")
  }

  /** One event row for the stateful debounce gate. */
  case class DebEvent(userId: Long, eventType: String, eventId: Long,
                      tsMs: Long)

  /** Streaming debounce (the stream arm of
    * [[graft.operators.EventOps.debounceStats]]'s batch audit): per
    * (user, type), an event passes only when it arrives ≥ `gapMs` after
    * the PREVIOUS event of that key — raw-gap semantics, identical to
    * the batch lag formulation, so batch and stream agree row-for-row
    * on ordered input (spec-pinned). State per key is ONE long (the last
    * event time) — ingest-rate-independent, and the within-batch sort is
    * bounded by a key's per-trigger arrivals.
    *
    * Cross-batch lates: a late event (older than the stored last event
    * time) is dropped WITHOUT regressing state — advancing state
    * backwards would re-open the gate and pass bounce events that are
    * within gapMs of the true latest event. On ordered input the guard
    * never fires, so the batch equivalence is untouched. */
  def debounce(events: org.apache.spark.sql.Dataset[DebEvent],
               gapMs: Long): org.apache.spark.sql.Dataset[DebEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState[Long, DebEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsMs, e.eventId))
          var last = state.getOption
          val out = sorted.filter { e =>
            val keep = last.forall(l => e.tsMs - l >= gapMs)
            // raw gap: state advances on every event — but only FORWARD
            if (last.forall(l => e.tsMs > l)) last = Some(e.tsMs)
            keep
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
