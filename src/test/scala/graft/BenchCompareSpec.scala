package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchCompare

/** The climate-vs-code separation the r10 verdict asked for, pinned on
  * the exact artifact pair that motivated it: the r9-era committed
  * BENCH.json (393.9 s) vs the r10 driver refresh (566.9 s). The 1.27×
  * suite drift is host weather — identical code measured 414 → 503 s
  * across one day — so the comparison must name the queries round 10
  * actually sped up and NOTHING as a code regression. */
class BenchCompareSpec extends AnyFunSuite {

  private lazy val report = BenchCompare.compare(
    BenchCompare.queriesMap("src/test/resources/bench_r9_committed.json"),
    BenchCompare.queriesMap("src/test/resources/bench_r10_driver.json"))

  test("r9->r10: climate factor is the known ~1.4-1.5x small-query drift") {
    assert(report.nCommon > 250, s"only ${report.nCommon} common queries")
    assert(report.climate > 1.2 && report.climate < 1.7,
      s"climate ${report.climate} outside the measured drift band")
  }

  test("r9->r10: no query flags as a code regression (drift is climate)") {
    assert(report.regressions.isEmpty,
      "climate-only pair flagged: " +
        report.regressions.map(d => f"${d.name} z=${d.z}%.1f").mkString(", "))
  }

  test("r9->r10: the queries round 10 touched flag as improvements") {
    val names = report.improvements.map(_.name).toSet
    assert(names.contains("q_embed_stats"), s"missing q_embed_stats in $names")
    assert(names.contains("q_exact_dups"), s"missing q_exact_dups in $names")
  }

  private def artifact(body: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_bench_artifact", ".json")
    f.toFile.deleteOnExit()
    java.nio.file.Files.writeString(f, body)
    f.toString
  }

  test("queriesMap fails loudly on a nested object inside queries") {
    val p = artifact("""{"metric":"total","value":1.5,"unit":"sec",""" +
      """"queries":{"q_a":{"stat":1.0},"q_b":0.5}}""")
    val e = intercept[IllegalArgumentException](BenchCompare.queriesMap(p))
    assert(e.getMessage.contains("not flat"), e.getMessage)
  }

  test("queriesMap fails loudly when parsed count disagrees with n_timed") {
    val p = artifact("""{"metric":"total","value":1.5,"n_timed":3,""" +
      """"queries":{"q_a":1.0,"q_b":0.5}}""")
    val e = intercept[IllegalArgumentException](BenchCompare.queriesMap(p))
    assert(e.getMessage.contains("n_timed"), e.getMessage)
  }

  test("queriesMap fails loudly when the per-query sum misses the headline") {
    val p = artifact("""{"metric":"total","value":99.9,"n_timed":2,""" +
      """"queries":{"q_a":1.0,"q_b":0.5}}""")
    val e = intercept[IllegalArgumentException](BenchCompare.queriesMap(p))
    assert(e.getMessage.contains("headline"), e.getMessage)
  }

  test("queriesMap accepts the real driver artifacts (guards are calibrated)") {
    assert(BenchCompare.queriesMap("BENCH.json").nonEmpty)
    assert(BenchCompare.queriesMap(
      "src/test/resources/bench_r10_driver.json").size == 433)
  }

  test("headline cross-check is anchored to the metric:total object") {
    // r12 ADVICE: an unrelated "value" in an EARLIER object (multi-line
    // driver log) must not be paired with the queries sum — the old
    // first-"value"-anywhere grab would compare 1.5 against 7.0 here
    // and wrongly abort.
    val p = artifact("""{"log":{"metric":"startup","value":7.0}}""" + "\n" +
      """{"metric":"total","value":1.5,"n_timed":2,""" +
      """"queries":{"q_a":1.0,"q_b":0.5}}""")
    assert(BenchCompare.queriesMap(p) == Map("q_a" -> 1.0, "q_b" -> 0.5))
  }

  test("a present-but-unpairable headline aborts instead of skipping") {
    // metric:total exists but its object carries no value; a value in a
    // DIFFERENT object must not satisfy the pairing.
    val p = artifact("""{"metric":"total","unit":"sec"}""" + "\n" +
      """{"value":3.0}""" + "\n" +
      """{"n_timed":1,"queries":{"q_a":1.0}}""")
    val e = intercept[IllegalArgumentException](BenchCompare.queriesMap(p))
    assert(e.getMessage.contains("same object"), e.getMessage)
  }

  test("a genuine order-of-magnitude regression would flag") {
    val base = BenchCompare.queriesMap(
      "src/test/resources/bench_r9_committed.json")
    val poisoned = BenchCompare.queriesMap(
      "src/test/resources/bench_r10_driver.json") + ("q_standings" -> 30.0)
    val r = BenchCompare.compare(base, poisoned)
    assert(r.regressions.exists(_.name == "q_standings"),
      s"planted 30s regression not flagged: ${r.regressions.map(_.name)}")
  }
}
