package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.feature.{HashingTF, IDF, StandardScaler, StringIndexer, Tokenizer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark.ml rebuilds of the reference's sklearn models (SURVEY.md §2.11,
  * reference src/analytics/engine.py:29-229):
  *
  *  - PlayerPerformanceModel: StandardScaler + GradientBoosting regression
  *    → VectorAssembler + StandardScaler + GBTRegressor
  *  - MatchPredictionModel: LabelEncoder + RandomForest 3-class classifier
  *    → StringIndexer + VectorAssembler + RandomForestClassifier
  *
  * The reference's `predict_match_outcome` returns placeholder
  * probabilities (engine.py:391-397); the *contract* — a 3-class
  * probability vector — is what matters, and `probabilityCol` delivers it
  * for real. Train/test split mirrors `train_test_split(0.2, seed 42)`.
  * Training distributes natively (tree aggregation); inference is a
  * per-row transform — no collect boundary anywhere.
  */
object Models {

  val Seed = 42L

  /** 80/20 split matching the reference (engine.py:76). */
  def trainTestSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), Seed)
    (train, test)
  }

  /** Performance regression pipeline: features → scaled vector → GBT. */
  def performancePipeline(featureCols: Seq[String], labelCol: String): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("raw_features")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val gbt = new GBTRegressor()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(20).setMaxDepth(4).setSeed(Seed)
    new Pipeline().setStages(Array(assembler, scaler, gbt))
  }

  /** Outcome classification pipeline: label indexing → vector → RF with
    * 3-class probability output (home_win / draw / away_win contract). */
  def outcomePipeline(featureCols: Seq[String], labelCol: String): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic class order
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setProbabilityCol("probability")
      .setNumTrees(50).setMaxDepth(6).setSeed(Seed)
    new Pipeline().setStages(Array(indexer, assembler, rf))
  }

  def fit(pipeline: Pipeline, train: DataFrame): PipelineModel = pipeline.fit(train)

  /** q_ml_labels: the engine-portable face of the ML family — the fitted
    * StringIndexer's label→index mapping applied to every row. With
    * `alphabetAsc` ordering the learned parameter is pure relational
    * math: index = rank of the label among sorted distinct labels − 1,
    * which DuckDB recomputes as `dense_rank() OVER (ORDER BY label) − 1`.
    * A drift in the indexer's ordering, its fit, or the transform's
    * per-row lookup breaks the hash match. (The fit collects only the
    * distinct-label array — vocabulary-bounded, the k-means-centroid
    * pattern, never corpus-bounded.)
    *
    * Portability ruling for the rest of the §2.11 substrate
    * (VERDICT r4 #7): `randomSplit(seed)` draws from Spark's
    * XORShiftRandom stream per partition and `HashingTF` indexes by
    * murmur3_x86_32(seed 42) of the UTF-8 term — neither is replayable
    * in DuckDB SQL, so no portable oracle witness exists; both are
    * spec-pinned instead (`ModelsSpec`: split reproducibility +
    * disjointness, literal hash-index pins that fail if a Spark upgrade
    * changes the hash). */
  def labelIndexQuery(spark: SparkSession, dir: String): DataFrame = {
    val parts = graft.sources.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_type"))
    val indexer = new StringIndexer()
      .setInputCol("p_type").setOutputCol("__idx")
      .setStringOrderType("alphabetAsc")
    indexer.fit(parts).transform(parts)
      .select(col("p_partkey"), col("p_type"),
        col("__idx").cast("long").as("label_index"))
      .orderBy("p_partkey")
  }

  /** Text-classification pipeline for corpus curation: tokenize →
    * feature-hash to a fixed dim (no vocabulary build — the hashing trick
    * keeps the feature step stateless and corpus-size-independent, the
    * only viable shape at 100 TB; CountVectorizer's vocab collect is the
    * anti-pattern) → IDF reweight → multinomial logistic regression.
    * This is the model-based quality/language classifier a training-data
    * pipeline runs after the heuristic gates ([[graft.scale.TextAnalysis]]
    * flags label the seed set; the model generalizes past the rules). */
  def textClassifierPipeline(textCol: String, labelCol: String,
                             numFeatures: Int = 1 << 12): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("label")
      .setStringOrderType("alphabetAsc")
    // Null text (failed extraction — routine in curation data) NPEs
    // inside Tokenizer's udf with no handleInvalid escape hatch; coalesce
    // to "" ahead of it so one bad row cannot fail the whole transform.
    val denull = new org.apache.spark.ml.feature.SQLTransformer()
      .setStatement(
        s"SELECT *, coalesce($textCol, '') AS __text_nn FROM __THIS__")
    val tok = new Tokenizer().setInputCol("__text_nn").setOutputCol("toks")
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setProbabilityCol("probability")
      .setMaxIter(40).setRegParam(1e-3)
    new Pipeline().setStages(Array(indexer, denull, tok, tf, idf, lr))
  }
}
