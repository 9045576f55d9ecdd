package graft.tools

import graft.{GraftSession, SparkEntry}

/** Codegen-strict execution probe — the Janino-cliff attribution tool.
  *
  * Verify doesn't log query names on a whole-stage-codegen fallback
  * WARN, so r12's "code grows beyond 64 KB" had to be attributed by
  * correlating WARN timestamps with output-dir mtimes. This tool makes
  * attribution one command: run the named queries (or every query)
  * with `spark.sql.codegen.fallback=false` against a corpus, printing
  * PROBE_OK / PROBE_FAIL per query — a failing query names itself.
  *
  * The same check runs board-wide in CI (CodegenStrictSpec); this main
  * exists for the dev loop (single-query iteration without sbt test
  * startup) and for probing at LARGER corpora where an sf-dependent
  * plan change (e.g. AQE join-strategy flips) could alter the fused
  * stages.
  *
  * Usage: runMain graft.tools.StrictProbe <sfDir> [q_a,q_b,...]
  */
object StrictProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val iso = spark.newSession()
    iso.conf.set("spark.sql.codegen.fallback", "false")
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          // noop sink: materializes EVERY output column — count() would
          // let Catalyst prune the projections this probe exists to compile
          fn(iso, sfDir).write.format("noop").mode("overwrite").save()
          println(s"PROBE_OK $name")
        } catch {
          case e: Throwable =>
            failed += 1
            val msg = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).map(_.getMessage).mkString(" <- ")
            println(s"PROBE_FAIL $name: ${msg.take(300)}")
        }
      }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
