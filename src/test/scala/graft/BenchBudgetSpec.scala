package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operational wall-clock gate over the committed BENCH.json artifact.
  *
  * The r9 failure mode was OPERATIONAL, not correctness: the board grew
  * past the driver's bench window and the round shipped no parseable
  * perf evidence. This gate turns "the suite got too slow" into a red
  * test the moment it happens, naming the offending queries — the
  * per-query budget is sized so a full board of budget-respecting
  * queries fits the driver window with margin (432 × ≤ 12 s would not,
  * but the budget binds the TAIL; the suite lives on its ~0.9 s/query
  * average, and the total gate below catches average drift).
  *
  * Reads the artifact committed by the last full `graft.Bench` run (the
  * file is version-controlled; a fresh checkout carries it). No Spark
  * session needed — this is a pure artifact check.
  */
class BenchBudgetSpec extends AnyFunSuite {

  /** Per-query ceiling at sf0.1 on local[32], sized with the SAME
    * climate headroom as the suite gate below: identical code measured
    * 414 → 503 s (~1.2×) across one day's host weather, and the r10
    * driver refresh ran ~1.13× the builder's numbers — a ceiling with
    * 5% margin over the committed tail flaps on climate, not code
    * (observed: driver-refreshed BENCH.json redded the old 12 s gate at
    * q_band_sweep=14.0 s). The committed tail after the r11 shared
    * audit-silver cut is q_ktruss ≈ 9.7 s; 16 s ≈ 1.65× that — room
    * for a bad-weather driver run, fires on any genuinely new
    * heavyweight. */
  private val PerQueryBudgetSec = 16.0

  /** Whole-suite ceiling: sized to the driver bench window (r9's
    * timeout) with headroom for host CPU-steal weather — identical
    * code measured 414 → 503 s across one day's runs, so a tight
    * ceiling would flap on climate, not code. 650 s still fires well
    * before the suite outgrows the window the way r9 did (~1 600 s of
    * query time). */
  private val SuiteBudgetSec = 650.0

  // One parser for the artifact format lives in main code
  // (BenchCompare); keeping a private copy here would let the two
  // drift and this gate mis-parse silently.
  private lazy val queriesMap: Map[String, Double] =
    graft.tools.BenchCompare.queriesMap("BENCH.json")

  test("BENCH.json exists, parses, and covers a full-board run") {
    assert(queriesMap.size > 400,
      s"BENCH.json covers only ${queriesMap.size} queries — partial artifact committed?")
    assert(queriesMap.valuesIterator.forall(_ >= 0.0),
      "BENCH.json records failed queries (-1.0 sentinel)")
  }

  test("no benched query exceeds the per-query wall budget") {
    val offenders = queriesMap.filter(_._2 > PerQueryBudgetSec)
      .toSeq.sortBy(-_._2)
    assert(offenders.isEmpty,
      s"over ${PerQueryBudgetSec}s at sf0.1: " +
        offenders.map { case (k, v) => f"$k=$v%.1fs" }.mkString(", "))
  }

  test("suite total fits the driver bench window") {
    val total = queriesMap.values.sum
    assert(total <= SuiteBudgetSec,
      f"suite total $total%.0f s exceeds $SuiteBudgetSec%.0f s — the driver bench " +
        "will time out; trim or speed up the tail (see BENCH.json runs)")
  }
}
