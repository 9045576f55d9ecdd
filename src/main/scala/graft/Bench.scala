package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * DESIGNED TO SURVIVE THE HARNESS WINDOW (round-9 lesson). The driver
  * runs this under a wall-clock timeout and parses only the LAST ~2000
  * characters of output. Two past rounds produced no machine-readable
  * evidence: r9 timed out with all results held in memory until the
  * end; r8 finished but printed one 55 KB JSON line whose tail
  * truncation defeated the parser. Therefore:
  *
  *  - BENCH.json is rewritten (atomic tmp+move) after EVERY query's
  *    timed reps — a timeout still leaves a parseable partial artifact
  *    with per-query numbers and `"partial":true`.
  *  - stdout gets a COMPACT one-line summary after every query (total
  *    so far, progress counters, a bounded headline-query map — never
  *    the full 432-entry map or the raw-runs spread, which live in the
  *    file only). The final line is identical in shape with
  *    `"partial":false`. Every line fits a 2000-char tail capture.
  *  - log level ERROR: the r9 tail was 100% checkpoint-unpersist WARN
  *    noise printed after the last query line.
  *  - The warmup pass is TIMED and pooled as a per-query sample
  *    (`SPARK_GRAFT_BENCH_WARMUP=full`, the default), and only ONE
  *    additional timed rep runs by default (`SPARK_GRAFT_BENCH_REPS`,
  *    default 1). That yields two samples per query for the wall cost
  *    of r9's warmup+one-rep — the measured r10 budget: a full
  *    warmup+2-rep protocol burned ~55 min of wall on a steal-spiky
  *    host, far past the driver window that killed r9.
  *
  * Timed protocol: per-query MIN over {warmup sample} ∪ {reps} when
  * ≤ 2 samples, MEDIAN beyond. The warmup sample carries that query's
  * whole-stage-codegen compilation and cold scan caches, so it is an
  * honest upper-bound sample: the min usually picks the warmed rep,
  * and when a CPU-steal spike lands on the warmed rep the
  * codegen-inflated warmup sample caps the damage. A spike sustained
  * across BOTH samples is caught by the post-suite outlier re-run
  * (better run set kept). min/max/raw are reported in the file's
  * `runs` object so spread contamination stays visible.
  * `light` warmup (table scans + headline queries, no samples) and
  * `none` remain for quick local profiling.
  *
  * ADAPTIVE REPS for sub-second queries (round 14): a query whose
  * fastest evidence (min of the warmup sample and the first timed rep
  * — so a spiked rep can't disable the top-up for a query the warmup
  * proved fast) is under `SPARK_GRAFT_BENCH_ADAPTIVE` seconds
  * (default 1.5; 0 disables) is topped up to 3 timed reps, and its
  * stat is the median of the TIMED reps alone (the codegen-inflated
  * warmup sample is excluded once ≥3 honest reps exist, since it would
  * bias an even-count median upward; it stays visible as `warm` in the
  * `runs` object). Rationale: with one timed rep, one transient
  * CPU-steal spike owns that query's committed number — two
  * consecutive rounds of driver artifacts carried alphabetically
  * contiguous (run-order) load clusters on untouched code. Median of
  * three leaves one spiked rep harmless, for ~9 min of extra wall at
  * the measured 0.63 s suite median.
  */
object Bench {

  /** Fixed flagship subset for the compact stdout line: one per major
    * family (agg/join/window/dedup/LSH/ANN/text/graph/layout/stream
    * replay), chosen for round-over-round comparability. The full
    * per-query map is in BENCH.json. */
  private val Headline = Seq(
    "q_top_spenders", "q_standings", "q_latest_event", "q_scd2",
    "q_sessions", "q_funnel", "q_exact_dups", "q_jaccard_pairs",
    "q_minhash_pairs", "q_dup_clusters", "q_knn_cosine",
    "q_quality_filter", "q_lang_id", "q_bm25", "q_vocab",
    "q_pagerank", "q_triangles", "q_ktruss", "q_zorder", "q_curation",
    "q_band_sweep", "q_blocking_eval", "q_embed_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    // Unknown values already fell through to the full-warmup branch;
    // normalize here so the protocol string can never carry an
    // arbitrary env payload into the JSON artifact.
    val warmupMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "full") match {
      case m @ ("none" | "light" | "full") => m
      case _ => "full"
    }
    val spark = GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the checkpoint-unpersist WARNs land AFTER the
    // summary lines and would push them out of the driver's tail window
    spark.sparkContext.setLogLevel("ERROR")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // Dedup/similarity queries localCheckpoint intermediates; drop them
    // between queries so ~400 runs don't accumulate block-manager
    // pressure. Blocking unpersist: async removal would overlap the
    // next timed query.
    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    // Optional comma-separated subset for local profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // ADAPTIVE REPS (r13 verdict, next #1): two consecutive driver-box
    // artifacts carried alphabetically contiguous load clusters (r12
    // q_k*, r13 the b–d block: 30/36 flagged regressions on untouched
    // code) because sub-second queries had exactly one timed rep — one
    // transient CPU-steal spike lands entirely in that query's number.
    // Queries whose FIRST timed rep is under this threshold get topped
    // up to `adaptiveTarget` timed reps; their stat is the MEDIAN OF THE
    // TIMED REPS (the warmup sample is excluded once >=3 honest reps
    // exist — it carries that query's codegen compilation and cold scan
    // caches, so pooling it would bias an even-count median upward).
    // One spiked rep out of three leaves the median on a clean rep. At
    // the r13 median of 0.63 s/query this adds ~2 reps x ~0.7 s x ~400
    // queries ≈ 9 min of wall — bounded, because queries OVER the
    // threshold (where extra reps are expensive) keep the old
    // warmup+1-rep min-of-2 protocol and the post-suite outlier re-run.
    val adaptiveSec = sys.env.get("SPARK_GRAFT_BENCH_ADAPTIVE")
      .map(_.toDouble).getOrElse(1.5) // 0 disables
    val adaptiveTarget = math.max(3, reps)

    val protocol = s"warmup=$warmupMode (full warmup is timed and pooled " +
      s"as a sample) + $reps timed rep(s), topped up to $adaptiveTarget " +
      s"reps when min(warmup, first rep) is under ${adaptiveSec}s " +
      "(stat=median of timed reps, warmup sample excluded); stat=min for " +
      "<=2 samples else median; sustained outliers re-run with the same " +
      "adaptive semantics, better run set kept"

    // Env-derived strings (sfDir, benchOut, warmup mode via protocol)
    // are interpolated into hand-built JSON; a quote or backslash in any
    // of them would yield an unparseable artifact — defeating the whole
    // guaranteed-parseable design. Escape, don't trust.
    def jesc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    def stat(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (xs.size <= 2) s.head
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Per-query evidence: the warmup sample and the timed reps, kept
    // apart so the stat can drop the codegen-inflated warmup once three
    // honest timed reps exist (adaptive queries) while two-sample
    // queries keep the min-of-{warmup, rep} protocol.
    case class Rec(name: String, warm: Option[Double], timed: Seq[Double]) {
      def samples: Seq[Double] = if (timed.size >= 3) timed else warm.toSeq ++ timed
      def hasSamples: Boolean = samples.nonEmpty
      def statVal: Double = stat(samples)
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

    // ---- incremental artifact -------------------------------------
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH.json")
    // Filtered profiling runs must not clobber the full-suite artifact —
    // unless the caller pointed the output somewhere else explicitly.
    val mayWrite = only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT")
    var phase = "warmup" // warmup -> timed -> final; published so a
                         // timeout's partial artifact is interpretable
    // How many queries have a TIMED-phase rep so far. n_done spans the
    // whole board during phase=timed (partials carry warmup-grade
    // entries for the tail, deliberately), so without this a partial
    // artifact looks board-complete; n_timed is the honest progress
    // counter.
    var nTimed = 0
    def writeArtifact(done: Seq[Rec], partial: Boolean): Unit =
      if (mayWrite) try {
        val qs = done.map { r =>
          "\"" + r.name + "\":" + (if (!r.hasSamples) "-1.0" else fmt(r.statVal))
        }.mkString("{", ",", "}")
        val spread = done.map { r =>
          val rs = r.samples
          val warmPart = r.warm.map(w => s""","warm":${fmt(w)}""").getOrElse("")
          val body = if (rs.isEmpty) "\"n\":0" + warmPart
            else s""""stat":${fmt(r.statVal)},"min":${fmt(rs.min)},"max":${fmt(rs.max)},"n":${rs.size},"raw":[${rs.map(fmt).mkString(",")}]""" + warmPart
          "\"" + r.name + "\":{" + body + "}"
        }.mkString("{", ",", "}")
        val total = done.collect { case r if r.hasSamples => r.statVal }.sum
        val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","partial":$partial,"phase":"$phase","n_done":${done.size},"n_timed":$nTimed,"n_total":${names.size},"protocol":"${jesc(protocol)}","queries":$qs,"runs":$spread,"sf":"${jesc(sfDir)}"}"""
        val tmp = java.nio.file.Paths.get(benchOut + ".tmp")
        java.nio.file.Files.writeString(tmp, json + "\n")
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(benchOut),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] write $benchOut failed: ${e.getMessage}")
      }

    // Compact stdout line: bounded size regardless of board size, so the
    // LAST one printed always parses from a 2000-char tail. Headline
    // queries only; full map in BENCH.json.
    def printCompact(done: Seq[Rec], partial: Boolean): Unit = {
      val m = done.collect { case r if r.hasSamples => r.name -> r.statVal }.toMap
      val hq = Headline.filter(m.contains)
        .map(k => "\"" + k + "\":" + fmt(m(k))).mkString("{", ",", "}")
      val total = m.values.sum
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","partial":$partial,"phase":"$phase","n_done":${done.size},"n_timed":$nTimed,"n_total":${names.size},"protocol":"${jesc(protocol)}","queries":$hq,"queries_full":"${jesc(benchOut)}","sf":"${jesc(sfDir)}"}""")
    }

    // ---- warmup ---------------------------------------------------
    // full (default): every query once, TIMED — each run is pooled as
    // that query's first sample below, so the warmup pass is not lost
    // wall but half the evidence.
    val warmSamples = scala.collection.mutable.Map[String, Double]()
    warmupMode match {
      case "none" =>
      case "light" => // table footers/scan paths + one pass over the
        // headline family representatives (JIT, codegen infra, shuffle
        // machinery, checkpoint machinery); no samples recorded
        graft.sources.Tables.names.foreach { t =>
          try graft.sources.Tables.load(spark, sfDir, t).count()
          catch { case _: Throwable => () }
        }
        Headline.filter(names.contains).foreach { n =>
          try SparkEntry.queries(n)(spark, sfDir).count()
          catch { case _: Throwable => () }
          dropCheckpoints()
        }
      case _ =>
        // publish after every warmup run too: a driver window that
        // expires INSIDE the warmup pass still leaves per-query
        // warmup-sample evidence (phase:"warmup" marks it as such)
        val seen = scala.collection.mutable.ArrayBuffer[Rec]()
        names.foreach { n =>
          try warmSamples(n) = time(SparkEntry.queries(n)(spark, sfDir).count())
          catch { case _: Throwable => () }
          dropCheckpoints()
          seen += Rec(n, warmSamples.get(n), Nil)
          writeArtifact(seen.toSeq, partial = true)
          printCompact(seen.toSeq, partial = true)
        }
    }
    phase = "timed"
    // Settle between warmup and the timed phase: collect warmup garbage
    // now instead of during the first timed queries.
    System.gc()
    Thread.sleep(2000)

    def runsOf(n: String, k: Int): Seq[Double] = {
      val fn = SparkEntry.queries(n)
      (1 to k).flatMap { _ =>
        val r = try Some(time(fn(spark, sfDir).count()))
                catch { case _: Throwable => None }
        dropCheckpoints()
        r
      }
    }

    // ---- timed phase: publish after every query -------------------
    // Each publish includes warmup-only entries for the not-yet-retimed
    // remainder, so a window that expires mid-phase still leaves
    // FULL-BOARD numbers (warmup-grade for the tail — phase:"timed"
    // plus the runs' n flag which is which).
    // Timed reps with the adaptive top-up. The trigger keys on the
    // FASTEST evidence available (min of warm sample and first rep),
    // not the first rep alone: a spike inflating a true-sub-second
    // query's only rep past the threshold would otherwise disable the
    // top-up for exactly the query that needs it (the warm sample
    // proves the query is fast even when the rep is spiked).
    def timedRuns(n: String): Seq[Double] = {
      var timed = runsOf(n, reps)
      val fastest = (warmSamples.get(n).toSeq ++ timed.headOption).minOption
      if (adaptiveSec > 0 && fastest.exists(_ < adaptiveSec) &&
          timed.nonEmpty && timed.size < adaptiveTarget)
        timed = timed ++ runsOf(n, adaptiveTarget - timed.size)
      timed
    }

    val acc = scala.collection.mutable.ArrayBuffer[Rec]()
    names.zipWithIndex.foreach { case (n, i) =>
      acc += Rec(n, warmSamples.get(n), timedRuns(n))
      nTimed = i + 1
      val rest = names.drop(i + 1).map(m => Rec(m, warmSamples.get(m), Nil))
      writeArtifact(acc.toSeq ++ rest, partial = true)
      printCompact(acc.toSeq ++ rest, partial = true)
    }

    // A steal spike can persist across a whole query's reps (observed:
    // a 0.45 s aggregation printing 19 s because its window coincided
    // with a sustained spike). Re-run such outliers — stat over 4× the
    // suite median and over 2 s — after the suite, when the spike has
    // passed, and keep whichever RUN SET has the smaller stat (pooling
    // the two sets would leave the combined stat spike-contaminated).
    val stats0 = acc.collect { case r if r.hasSamples => r.statVal }.sorted
    val suiteMed = if (stats0.isEmpty) 0.0 else stats0(stats0.size / 2)
    // The retry gets the SAME adaptive semantics as the main loop: a
    // sub-second query whose adaptive reps all landed in a sustained
    // spike must not have its replacement number ride on a single rep
    // (min-of-1 would also systematically beat the original median-of-3
    // on luck alone).
    val results: Seq[Rec] = acc.toSeq.map { r =>
      if (r.hasSamples && r.statVal > 2.0 && r.statVal > 4 * suiteMed) {
        val retry = Rec(r.name, None, timedRuns(r.name))
        if (retry.hasSamples && retry.statVal < r.statVal) retry else r
      } else r
    }

    phase = "final"
    writeArtifact(results, partial = false)
    printCompact(results, partial = false)
    spark.stop()
  }
}
