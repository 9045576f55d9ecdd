package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

import graft.ml.Models

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic synthetic training frame: outcome depends on the
  // feature difference, so both models have real signal to learn.
  private lazy val matches = {
    val rows = (0 until 300).map { i =>
      val formHome = (i % 10).toDouble
      val formAway = ((i * 7) % 10).toDouble
      val diff = formHome - formAway
      val outcome = if (diff > 2) "home_win" else if (diff < -2) "away_win" else "draw"
      (formHome, formAway, diff, outcome, formHome * 2.0 + 1.0)
    }
    rows.toDF("form_home", "form_away", "form_diff", "outcome", "goals")
  }

  test("outcome pipeline: 3-class probability contract, deterministic seed") {
    val (train, test) = Models.trainTestSplit(matches)
    val model = Models.fit(
      Models.outcomePipeline(Seq("form_home", "form_away", "form_diff"), "outcome"),
      train)
    val preds = model.transform(test)
    val row = preds.select("probability", "prediction").head()
    val probs = row.getAs[Vector](0)
    assert(probs.size == 3)
    assert(math.abs(probs.toArray.sum - 1.0) < 1e-9)
    // clear-signal rows classify correctly
    val clear = model.transform(
      Seq((9.0, 0.0, 9.0, "home_win", 0.0), (0.0, 9.0, -9.0, "away_win", 0.0))
        .toDF("form_home", "form_away", "form_diff", "outcome", "goals"))
    val labels = model.stages(0)
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel].labelsArray(0)
    val got = clear.select("prediction").as[Double].collect()
      .map(p => labels(p.toInt)).toSeq
    assert(got == Seq("home_win", "away_win"))
  }

  test("pipeline save/load round-trip (joblib-persistence analogue)") {
    val (train, test) = Models.trainTestSplit(matches)
    val model = Models.fit(
      Models.outcomePipeline(Seq("form_home", "form_away", "form_diff"), "outcome"),
      train)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(test).select("prediction").collect().map(_.getDouble(0)).toSeq
    val b = reloaded.transform(test).select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("performance pipeline save/load round-trip (joblib-persistence analogue)") {
    // The second reference model family (engine.py:424-439 persists BOTH
    // via joblib): scaler + GBT regressor must survive save → load with
    // bit-identical predictions.
    val (train, test) = Models.trainTestSplit(matches)
    val model = Models.fit(
      Models.performancePipeline(Seq("form_home", "form_away"), "goals"), train)
    val dir = java.nio.file.Files.createTempDirectory("graft_model_perf").toString + "/m"
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(test).select("prediction").collect().map(_.getDouble(0)).toSeq
    val b = reloaded.transform(test).select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("performance pipeline: regression recovers a linear signal") {
    val (train, test) = Models.trainTestSplit(matches)
    val model = Models.fit(
      Models.performancePipeline(Seq("form_home", "form_away"), "goals"), train)
    val preds = model.transform(test)
      .select(abs(col("prediction") - col("goals")).as("err"))
    val mae = preds.agg(avg("err")).head().getDouble(0)
    assert(mae < 1.0, s"MAE $mae too high for a clean linear target")
  }

  test("text classifier pipeline: hashed-TF-IDF LR separates token dialects") {
    // two synthetic "languages" with disjoint vocabularies
    val rows = (0 until 240).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val vocab = if (lang == "aa") Seq("rot", "blau", "gelb", "grun")
                  else Seq("red", "blue", "yellow", "green")
      val text = (0 until 8).map(j => vocab((i * 3 + j) % 4)).mkString(" ")
      (i.toLong, text, lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val (train, test) = Models.trainTestSplit(df)
    val fitted = Models.fit(Models.textClassifierPipeline("text", "lang"), train)
    // Persist-and-reload before scoring: the in-memory LR model drags its
    // training summary (and through it the SparkSession) into the
    // transform closure — Spark 4's session ObservationManager is not
    // serializable, so scoring with the fresh model can fail depending on
    // what else the session has run. Save/load drops the summary, which
    // is also how a production scorer consumes the model.
    val dir = java.nio.file.Files.createTempDirectory("graft-textclf").toString
    fitted.write.overwrite().save(dir)
    val model = org.apache.spark.ml.PipelineModel.load(dir)
    val preds = model.transform(test)
    val labels = model.stages.head
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel].labelsArray.head
    val acc = preds
      .select((col("label") === col("prediction")).cast("int").as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    assert(labels.sameElements(Array("aa", "bb")), labels.mkString(","))
    assert(acc > 0.95, s"disjoint vocabularies must be separable, acc=$acc")
    // probability contract: 2-class vector summing to ~1
    val p = preds.select("probability").head().getAs[Vector](0)
    assert(p.size == 2 && math.abs(p.toArray.sum - 1.0) < 1e-9)
  }

  test("seeded split: reproducible, disjoint, exhaustive (no portable oracle — spec pin)") {
    // randomSplit draws from Spark's per-partition XORShiftRandom stream;
    // DuckDB cannot replay it, so the determinism contract is pinned
    // here: same seed → identical membership; the two splits partition
    // the input exactly.
    val (tr1, te1) = Models.trainTestSplit(matches)
    val (tr2, te2) = Models.trainTestSplit(matches)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("form_home", "form_away", "goals").collect().map(_.toString).sorted.toSeq
    assert(ids(tr1) == ids(tr2) && ids(te1) == ids(te2), "same seed must reproduce membership")
    assert(tr1.count() + te1.count() == matches.count())
    assert((ids(tr1) ++ ids(te1)).sorted == ids(matches.toDF()).sorted)
  }

  test("HashingTF: literal murmur3 index pins (no portable oracle — spec pin)") {
    // The hashed feature index is murmur3_x86_32(seed 42) of the UTF-8
    // term mod numFeatures — not replayable in DuckDB SQL. Pin concrete
    // indices so a Spark upgrade that silently changes the hash (and so
    // every trained model's feature space) fails loudly here.
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(1 << 12)
    val out = tf.transform(Seq(Seq("goal", "corner", "goal")).toDF("toks"))
      .select("tf").head().getAs[Vector](0).toSparse
    // two distinct terms, "goal" counted twice
    assert(out.indices.length == 2, out.toString)
    assert(out.values.sorted.toSeq == Seq(1.0, 2.0), out.toString)
    // literal pins: murmur3_x86_32 (hashUnsafeBytes2 variant, seed 42)
    // mod 4096 of the UTF-8 terms
    assert(out.indices.sorted.toSeq == Seq(3031, 3121),
      s"feature hash changed: ${out.indices.toSeq} (corner=3031, goal=3121)")
  }
}
