package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI hook for the independent-recomputation witnesses (r13): the DuckDB
  * oracle proves engine == oracle, but both were authored together — a
  * shared misunderstanding of a statistic's definition survives the hash
  * compare. The `tools/recompute_*.py` scripts reimplement the
  * custom-formula queries from raw parquet with textbook numpy/python
  * algorithms that share no code, joins, or algebra with the engine.
  * This spec regenerates the engine outputs for exactly the queries in
  * `witnessed` at sf0.001 and drives every tool in the loop below, so
  * the witness runs on every tree, not just the round it was authored
  * in. (The authoritative tool and query lists are the two literals in
  * this file — scope is stated generically here so the doc can't rot.) */
class RecomputeWitnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val witnessed = Seq(
    // recompute_stats.py
    "q_kendall", "q_mannwhitney", "q_anova", "q_spearman", "q_welch",
    "q_gini", "q_kruskal", "q_levene", "q_auc", "q_atkinson", "q_theil_sen",
    // recompute_graph.py
    "q_triangles", "q_pagerank", "q_component_sizes", "q_effective_dim",
    "q_pca_power",
    // recompute_timeseries.py
    "q_matrix_profile", "q_autocorr", "q_mann_kendall", "q_xcorr",
    // recompute_text.py
    "q_minhash_pairs", "q_jaccard_pairs", "q_bm25", "q_token_stats",
    "q_lang_id",
    // recompute_events.py
    "q_sessions", "q_funnel", "q_streaks",
    // recompute_sketch.py
    "q_knn_cosine", "q_kmv", "q_kmv_union", "q_simhash_pairs",
    "q_winnow_pairs",
    // recompute_eval.py
    "q_ab_lift", "q_cuped", "q_ndcg", "q_youden")

  test("independent numpy recomputation matches the engine on 37 queries") {
    val out = java.nio.file.Files.createTempDirectory("graft_recompute").toString
    witnessed.foreach { q =>
      SparkEntry.queries(q)(spark, TestSpark.Sf0001)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$q")
    }
    for (tool <- Seq("recompute_stats.py", "recompute_graph.py",
        "recompute_timeseries.py", "recompute_text.py", "recompute_events.py", "recompute_sketch.py", "recompute_eval.py")) {
      val buf = new StringBuilder
      val logger = scala.sys.process.ProcessLogger(
        l => { buf.append(l).append('\n'); () },
        l => { buf.append(l).append('\n'); () })
      val rc = scala.sys.process
        .Process(Seq("python3", s"tools/$tool", TestSpark.Sf0001, out)).!(logger)
      assert(rc == 0, s"$tool reported mismatches:\n$buf")
      assert(buf.toString.contains("ALL MATCH"), s"$tool output:\n$buf")
    }
  }
}
