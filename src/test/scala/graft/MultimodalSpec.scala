package graft

import org.apache.spark.sql.functions._

import graft.scale.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, TestSpark.Sf0001)

  test("media table has opaque binary payload + typed metadata") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    val row = media.orderBy("media_id").head()
    assert(Seq("image", "audio", "video").contains(row.getAs[String]("kind")))
    assert(row.getAs[Array[Byte]]("bytes").nonEmpty)
    assert(row.getStruct(row.fieldIndex("meta")).getAs[String]("format") == "raw")
  }

  test("extractFeatures: fixed dim, deterministic, no shuffle, null-safe") {
    // deterministic subset, not limit(): limit over the fanned
    // (shuffled) documents scan may pick different rows per execution
    val sample = media.filter(col("media_id") < 20)
    val out = Multimodal.extractFeatures(sample).cache()
    val feats = out.orderBy("media_id").select("features")
      .collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == Multimodal.FeatureDim))
    val again = Multimodal.extractFeatures(sample)
      .orderBy("media_id").select("features")
      .collect().map(_.getSeq[Float](0))
    assert(feats.toSeq == again.toSeq)
    // extraction must ADD no exchange over its input (the input scan may
    // carry the Tables.load parallelism-floor repartition)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges(Multimodal.extractFeatures(media)) == exchanges(media),
      "feature extraction must not shuffle")
  }

  test("extractFeatures: injected codec replaces the stub through the same plumbing") {
    // The decoder seam: a fake codec proves production can swap the stub
    // without touching schema/iteration/partitioning. open() must run on
    // the executor side (per partition), decode() per row with the kind.
    val opened = spark.sparkContext.longAccumulator("codec_opened")
    val codec = new Multimodal.MediaCodec {
      override def open(): Unit = opened.add(1)
      def decode(kind: String, bytes: Array[Byte]): Array[Float] =
        Array.fill(Multimodal.FeatureDim)(
          if (kind == "video") 2.0f else 1.0f)
    }
    val out = Multimodal.extractFeatures(media.limit(30), codec)
      .select("kind", "features").collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val want = if (r.getString(0) == "video") 2.0f else 1.0f
      val f = r.getSeq[Float](1)
      f.length == Multimodal.FeatureDim && f.forall(_ == want)
    })
    assert(opened.value >= 1, "codec.open() never ran")
  }

  test("sampleFrames: one row per step, only for video rows") {
    val frames = Multimodal.sampleFrames(media, stepMs = 500L)
    val one = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
        first(col("meta.duration_ms")).as("dur"))
      .head()
    val expected = (one.getAs[Long]("dur") + 499L) / 500L
    assert(one.getAs[Long]("n") == expected)
    val kinds = media.join(frames.select("media_id").distinct(), "media_id")
      .select("kind").distinct().collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("video"))
  }

  test("sampleFrames: zero-duration video yields zero frames, not an error") {
    import spark.implicits._
    val empty = Seq((1L, "video", Array.emptyByteArray, ("raw", 0, 1, 0L)),
        (2L, "video", "x".getBytes, ("raw", 1, 1, 1200L)))
      .toDF("media_id", "kind", "bytes", "meta")
      .withColumn("meta", col("meta").cast(Multimodal.MediaMetaSchema))
    val frames = Multimodal.sampleFrames(empty, stepMs = 1000L).collect()
    assert(frames.forall(_.getAs[Long]("media_id") == 2L))
    assert(frames.length == 2) // ts 0 and 1000 for the 1200ms row
  }

  test("frameIndex: offsets are step-aligned and bounded by duration") {
    val idx = Multimodal.frameIndex(spark, TestSpark.Sf0001, stepMs = 1000L)
    val joined = idx.join(
      Multimodal.mediaFromDocuments(spark, TestSpark.Sf0001), "media_id")
    assert(joined.filter(col("kind") =!= "video").count() == 0)
    assert(joined.filter(col("frame_ts_ms") % 1000 =!= 0
      || col("frame_ts_ms") < 0
      || col("frame_ts_ms") >= col("meta.duration_ms")).count() == 0)
  }

  test("decode -> embed -> ANN: extracted media features feed the similarity stack") {
    import graft.scale.Similarity
    // media features become vectors; a planted perturbed copy must be
    // found by the banded cosine near-dup operator — the full multimodal
    // dedup path (decode stub -> feature column -> LSH candidates ->
    // exact verify) in one pipeline.
    val raw = Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(spark, TestSpark.Sf0001))
      .select(col("media_id").as("vec_id"),
        Similarity.asDouble(col("features")).as("v"))
    // mean-center per vector: byte-sum features are all-positive, which
    // degenerates sign-LSH (one bucket); centering is the standard prep
    val feats = raw
      .withColumn("mu",
        aggregate(col("v"), lit(0.0), _ + _) / Multimodal.FeatureDim)
      .select(col("vec_id"), transform(col("v"), x => x - col("mu")).as("v"))
    val planted = feats.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x * 1.001).as("v"))
    val pairs = Similarity.cosineNearDupPairs(
        feats.unionByName(planted), threshold = 0.999, bands = 4, width = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val plantedFound = pairs.filter { case (a, b) => b == a + 1000000L }
    assert(plantedFound.length == 5,
      s"expected all 5 planted copies found, got ${plantedFound.toSeq}")
  }

  test("frameFingerprints + duplicateFrames: shared content found across media") {
    import spark.implicits._
    // two videos share their first 64 payload bytes (2 frames at 32 B);
    // the third is unrelated
    val shared = ("S" * 64).getBytes("UTF-8")
    def vid(id: Long, payload: Array[Byte]) =
      (id, "video", payload, ("raw", payload.length, 1, 4000L))
    val media = Seq(
      vid(1L, shared ++ ("A" * 64).getBytes("UTF-8")),
      vid(2L, shared ++ ("B" * 64).getBytes("UTF-8")),
      vid(3L, ("C" * 128).getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes", "meta")
      .withColumn("meta", col("meta").cast(Multimodal.MediaMetaSchema))
    val dups = Multimodal.duplicateFrames(media).collect()
    // frames 0 and 1 of videos 1 and 2 share fingerprints; video 3 clean.
    // 'S'*32 is identical for frame 0 and frame 1, so the two shared
    // windows collapse into ONE fingerprint group spanning both media
    // with 4 frame instances.
    assert(dups.length == 1, dups.mkString(";"))
    assert(dups.head.getLong(1) == 2L, "two media share the group")
    assert(dups.head.getLong(2) == 4L, "2 frames x 2 media")
    assert(dups.head.getLong(3) == 1L, "keep-first points at media 1")
  }
}
