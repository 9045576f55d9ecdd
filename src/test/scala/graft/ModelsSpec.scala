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
}
