package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.scale.TextAnalysis

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
}
