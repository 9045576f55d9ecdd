package graft

/** Board-wide codegen-strict execution gate (r12 verdict, top-next).
  *
  * The Janino "code grows beyond 64 KB" cliff is a BOARD-WIDE risk
  * class: any expression-heavy query can cross it silently, because the
  * default `spark.sql.codegen.fallback=true` swallows the compile error
  * and runs the stage interpreted — results stay right while throughput
  * drops 2-5× at scale. Round 12 proved the cost on the one query that
  * had fallen off the cliff (q_career_stats: 1.49 → 0.70 s after the
  * CodegenBarrier split) and gated THAT query; this suite generalizes
  * the gate: EVERY registered query is executed end-to-end at sf0.001
  * with fallback disabled, so the next >64 KB codegen unit anywhere on
  * the board throws in CI instead of degrading silently in production.
  *
  * Execution device: the noop sink (`format("noop")`) materializes every
  * output column. A `count()` would let Catalyst prune the very
  * projections this gate exists to compile — count(1) needs no columns,
  * so an oversized projection could vanish from the counted plan and
  * the gate would pass vacuously.
  *
  * Higher-order functions (transform/filter/aggregate) are
  * CodegenFallback EXPRESSIONS — they compile into the surrounding
  * codegen'd projection as interpreted eval() calls, never tripping the
  * whole-stage compile, so no whitelist is needed for them; `exempt`
  * exists for queries that genuinely cannot compile as one unit, each
  * WITH the reason stated. It is empty today and should stay empty.
  */
class CodegenStrictSpec extends SparkSpec {

  /** Queries that may not run codegen-strict, with the stated reason.
    * Empty: every query on the board compiles every whole-stage unit. */
  private val exempt: Map[String, String] = Map.empty

  test("every query executes end-to-end with codegen fallback disabled") {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.codegen.fallback", "false")
    val failures = (SparkEntry.queries -- exempt.keySet).toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try {
          fn(iso, TestSpark.Sf0001)
            .write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            val msg = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).map(_.getMessage).mkString(" <- ")
            Some(name -> msg.take(300))
        }
      }
    assert(failures.isEmpty,
      "codegen-strict execution failed for:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }

  test("negative control: strict mode throws on an oversized codegen unit") {
    // Proves the gate's mechanism end-to-end: a single expression tree
    // too large for one generated method (sqrt-nesting is neither
    // constant-foldable nor reassociable, and a nested tree cannot be
    // method-split because each level consumes the previous level's
    // local) must make the noop-sink execution THROW under
    // fallback=false rather than silently run interpreted. Without this
    // test, a Spark upgrade that quietly stopped honouring the config
    // (or a typo in the conf key) would turn the board gate above into
    // a no-op that always passes.
    import org.apache.spark.sql.functions._
    val iso = spark.newSession()
    iso.conf.set("spark.sql.codegen.fallback", "false")
    // constraint propagation is super-linear in alias-tree size and OOMs
    // on this synthetic shape long before codegen — irrelevant to what
    // is being tested, so off for the probe session
    iso.conf.set("spark.sql.constraintPropagation.enabled", "false")
    // wide, not deep: 40 independent 100-deep sqrt chains (deep-only
    // nesting stack-overflows Catalyst before codegen ever runs). Each
    // chain seeds differently so common-subexpression elimination can't
    // collapse them; over a range input the chain values are LOCALS, so
    // the generated consume cannot be method-split — one method, >64 KB.
    val chains = (1 to 40).map { j =>
      (1 to 100).foldLeft(col("id").cast("double") + lit(j.toDouble)) {
        (c, _) => sqrt(c + lit(1.0))
      }.as(s"v$j")
    }
    val e = intercept[Throwable] {
      iso.range(4).select(chains: _*)
        .write.format("noop").mode("overwrite").save()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" ")
    assert(chain.contains("64 KB") || chain.toLowerCase.contains("compil"),
      s"expected a codegen compile failure, got: ${chain.take(300)}")
  }
}
