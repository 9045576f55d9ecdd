package graft.scale

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (builder brief): media
  * payloads travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubCodec]] derives a deterministic feature vector from
  * the bytes. Everything around it — schema, batch iteration shape,
  * partition preservation, null handling — is the real production
  * plumbing: pass a codec-backed [[MediaCodec]] to [[extractFeatures]]
  * and nothing else changes.
  *
  * Scale notes: mapPartitions amortizes per-batch setup (a real decoder's
  * model/codec init) across the partition; features stay columnar
  * (`array<float>`), never driver-collected; `binary` payloads should ride
  * their own parquet column chunk so scans that skip media never read the
  * bytes.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),     // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", MediaMetaSchema)))

  val FeatureDim = 16

  /** Synthesize a media table from the documents corpus: UTF-8 bytes as
    * the opaque payload + plausible typed metadata. Gives the pipeline
    * real binary data without container codecs. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("raw").as("format"),
        length(col("text")).as("width"),
        lit(1).as("height"),
        (col("n_chars") * 10L).as("duration_ms")).as("meta"))

  /** Decoder seam: the ONE piece of the multimodal path this container
    * cannot implement for real (no image/audio libraries). A production
    * deployment implements this trait over its codec/model stack and
    * passes it to [[extractFeatures]] — the surrounding plumbing (schema,
    * batch iteration, partition preservation, null handling) is shared
    * and does not change.
    *
    * Ships inside the task closure, so implementations must be
    * Serializable; hold native/heavy state lazily (or acquire it in
    * [[open]]) so only the lightweight configuration is serialized. */
  trait MediaCodec extends Serializable {
    /** Called once per partition before any [[decode]] call — the hook
      * for codec/model initialization amortized across the partition. */
    def open(): Unit = ()
    /** Payload bytes (+ media kind) → fixed-width feature vector. */
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** Default STUB codec: deterministic pseudo-features from byte content
    * (honestly fake — but stable, spec-tested, and kind-independent).
    * Production: swap for a JNI/codec-backed [[MediaCodec]]. */
  object StubCodec extends MediaCodec {
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      if (bytes == null) return out
      var i = 0
      while (i < bytes.length) {
        val d = i % FeatureDim
        out(d) = out(d) + (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      var d = 0
      while (d < FeatureDim) { out(d) = out(d) / math.max(1, bytes.length / FeatureDim); d += 1 }
      out
    }
  }

  /** Batched per-partition feature extraction: media frame → media frame +
    * `features array<float>`. Partitioning is preserved (no shuffle); the
    * codec's [[MediaCodec.open]] runs once per partition. */
  def extractFeatures(media: DataFrame,
                      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = media.schema.add(StructField("features", ArrayType(FloatType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val bytesIdx = media.schema.fieldIndex("bytes")
    val kindIdx = media.schema.fieldIndex("kind")
    media.mapPartitions { rows =>
      codec.open() // per-partition setup: codec/model init in production
      rows.map { r =>
        val feats = codec.decode(r.getString(kindIdx), r.getAs[Array[Byte]](bytesIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `stepMs`), metadata carried. Pure expressions. */
  def sampleFrames(media: DataFrame, stepMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      // duration_ms = 0 would make sequence(0, -1, +step) throw; an empty
      // payload simply yields zero frames.
      .filter(col("meta.duration_ms") > 0)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(stepMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("meta"))

  /** q_frames: the frame-sampling index over the synthesized media table —
    * one row per sampled video frame timestamp. This is the oracle-checked
    * face of the multimodal family: the metadata synthesis
    * ([[mediaFromDocuments]]: kind from doc_id mod 3, duration from
    * n_chars) and the `sequence`+`explode` sampling are both expressible
    * in the oracle's SQL, so the plumbing that feeds the (stubbed) decode
    * stage is verified end-to-end cross-engine. */
  def frameIndex(spark: SparkSession, dir: String,
                 stepMs: Long = 1000L): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir), stepMs)
      .select(col("media_id"), col("frame_ts_ms"))
      .orderBy("media_id", "frame_ts_ms")

  /** Per-frame content fingerprints: each sampled frame hashes its own
    * byte window of the payload (`frameBytes` per frame — the stand-in
    * for a decoded frame's perceptual hash; production swaps the
    * `substring` for the codec's frame extractor, the md5 for pHash).
    * Pure expressions: binary `substring` + `md5`, no UDF, narrow until
    * any consumer aggregates.
    *
    * Composes with the dedup family: frames sharing a fingerprint across
    * DIFFERENT media are near-identical content (intro/outro cards,
    * repeated stock footage) — [[graft.scale.Dedup.exactDupGroups]] over
    * the fingerprint column finds them with one vocab-bounded groupBy,
    * the multimodal mirror of text span dedup. */
  def frameFingerprints(media: DataFrame, stepMs: Long = 1000L,
                        frameBytes: Int = 32): DataFrame =
    media.filter(col("kind") === "video")
      .filter(col("meta.duration_ms") > 0)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(stepMs))))
      .withColumn("frame_idx", (col("frame_ts_ms") / stepMs).cast("long"))
      // Frame count comes from duration_ms, the payload from bytes — when
      // the two disagree (long video, short payload) every overrun frame
      // would hash an EMPTY slice, and md5("") collides across unrelated
      // media: duplicateFrames would report distinct videos as shared
      // content. Only frames with a non-empty byte window fingerprint.
      .filter(col("frame_idx") * frameBytes < length(col("bytes")))
      .select(col("media_id"), col("frame_idx"),
        md5(expr(s"substring(bytes, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
          .as("frame_md5"))

  /** Cross-media duplicate frames: fingerprint groups appearing in more
    * than one media item (keep-first semantics mirror text dedup). */
  def duplicateFrames(media: DataFrame, stepMs: Long = 1000L,
                      frameBytes: Int = 32): DataFrame = {
    val fp = frameFingerprints(media, stepMs, frameBytes)
    fp.groupBy("frame_md5")
      .agg(
        countDistinct(col("media_id")).as("media_cnt"),
        count(lit(1)).as("frame_cnt"),
        min(col("media_id")).as("first_media"))
      .filter(col("media_cnt") > 1)
  }

  /** Voice-activity spans per audio item (q_vad_spans): 100 ms frames
    * gated by an energy score, consecutive voiced frames merged into
    * spans (gaps-and-islands), per item the span count, voiced share,
    * and longest span — the segmentation pass an ASR/captioning
    * pipeline runs BEFORE the expensive model, which at 100 TB is what
    * decides how much audio ever reaches a GPU.
    *
    * The energy itself would come from the decoded waveform; as with
    * [[StubCodec]], this container has no audio codec, so the energy is
    * a DETERMINISTIC md5 score per (media, frame) — honestly fake, but
    * it exercises the REAL plumbing (frame explosion, threshold gate,
    * island merge, per-item rollup) and replays exactly in the oracle.
    *
    * Scale shape: frame fanout is duration-bounded; the island window
    * partitions by media item (duration-bounded — the allowed family);
    * everything else is map-side aggregation. Voiced-ms arithmetic is
    * exact integers; the share is one division. */
  /** Shared frame scaffold for the segmentation queries: one row per
    * (media item of `kind`, `stepMs` frame), with the deterministic md5
    * energy score in [0,100). ONE definition — vadSpans and sceneCuts
    * both replay this expression verbatim in their oracles, so a tweak
    * must change both queries (and both oracles) together, never one. */
  private def energyFrames(spark: SparkSession, dir: String,
                           kind: String, stepMs: Long): DataFrame =
    mediaFromDocuments(spark, dir)
      .filter(col("kind") === kind && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(stepMs)))
          .as("ts"))
      .withColumn("energy",
        pmod(conv(substring(md5(concat(col("media_id").cast("string"),
          lit(":"), col("ts").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(100L)))

  def vadSpansQuery(spark: SparkSession, dir: String,
                    frameMs: Long = 100L, threshold: Int = 55): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val voiced = energyFrames(spark, dir, "audio", frameMs)
      .filter(col("energy") >= threshold)
    val w = Window.partitionBy(col("media_id")).orderBy(col("ts"))
    val spans = voiced
      .withColumn("island",
        expr(s"ts div $frameMs") - row_number().over(w).cast("long"))
      .groupBy(col("media_id"), col("duration_ms"), col("island"))
      .agg(count(lit(1)).as("frames"), min(col("ts")).as("span_start"))
    spans.groupBy(col("media_id"), col("duration_ms"))
      .agg(count(lit(1)).as("n_spans"),
        (sum(col("frames")) * frameMs).as("voiced_ms"),
        (max(col("frames")) * frameMs).as("longest_span_ms"))
      .select(col("media_id"), col("duration_ms"), col("n_spans"),
        col("voiced_ms"), col("longest_span_ms"),
        (col("voiced_ms").cast("double") / col("duration_ms").cast("double"))
          .as("voiced_share"))
      .orderBy("media_id")
  }

  /** Shot-boundary (scene-cut) segmentation per video item
    * (q_scene_cuts): 1 s frames, a cut wherever the frame feature jumps
    * by ≥ `threshold` against the previous frame, consecutive frames
    * between cuts merged into scenes — the video-side sibling of
    * [[vadSpansQuery]] (there: an absolute gate; here: a DELTA gate,
    * which is what real shot detection thresholds). A captioning
    * pipeline runs exactly this before sampling one keyframe per scene,
    * which at 100 TB decides how many frames reach the vision model.
    *
    * The frame feature is the same honestly-fake deterministic md5
    * score as VAD's (no codecs in this container); the plumbing —
    * frame explosion, lag delta, cut-count islands, per-item rollup —
    * is the real thing and replays exactly in the oracle. Windows
    * partition by media item (duration-bounded, the allowed family);
    * scene arithmetic is exact integers, the mean scene length is the
    * single division. */
  def sceneCutsQuery(spark: SparkSession, dir: String,
                     stepMs: Long = 1000L, threshold: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = energyFrames(spark, dir, "video", stepMs)
    val byItem = Window.partitionBy(col("media_id")).orderBy(col("ts"))
    val cuts = frames
      .withColumn("prev", lag(col("energy"), 1).over(byItem))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          abs(col("energy") - col("prev")) >= threshold, 1L).otherwise(0L))
      .withColumn("scene",
        sum(col("cut")).over(byItem
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val scenes = cuts.groupBy(col("media_id"), col("duration_ms"),
        col("scene"))
      .agg(count(lit(1)).as("frames"))
    scenes.groupBy(col("media_id"), col("duration_ms"))
      .agg(count(lit(1)).as("n_scenes"),
        sum(col("frames")).as("n_frames"),
        (max(col("frames")) * stepMs).as("longest_scene_ms"))
      .select(col("media_id"), col("duration_ms"), col("n_scenes"),
        col("n_frames"), col("longest_scene_ms"),
        (col("duration_ms").cast("double") / col("n_scenes").cast("double"))
          .as("mean_scene_ms"))
      .orderBy("media_id")
  }
}
