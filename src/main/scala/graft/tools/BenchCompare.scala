package graft.tools

/** Climate-normalized comparison of two BENCH.json artifacts — answers
  * "which queries actually regressed?" without guessing against host
  * weather.
  *
  * The problem (r10 verdict, Performance section): round-over-round
  * per-query deltas are dominated by climate — identical code measured
  * 414 → 503 s across one day's CPU-steal weather, and the min-of-2
  * protocol makes small queries drift 1.4–2.5× while the suite drifts
  * ~1.27×. A fixed ratio threshold therefore flags dozens of
  * climate-only "regressions" (measured: 38–44 at ratio > 1.5× the
  * suite median on the r9→r10 pair, all noise).
  *
  * The device: per-query LOG-ratios, centered on their median (the
  * multiplicative climate factor), scaled by ONE-SIDED robust MADs —
  * one-sided because the spread is asymmetric by construction (steal
  * spikes only ever ADD time, so the slow tail is fatter than the fast
  * tail; measured σ_up = 0.31 vs σ_dn = 0.23 on the r9→r10 pair). A
  * query flags only when its normalized |z| exceeds the threshold —
  * i.e. when it moved far outside the climate distribution's own
  * spread. A genuine 1 s → 10 s code regression scores z ≈ 7; the
  * r9→r10 climate-only pair scores max z = 3.1 and flags NOTHING as a
  * regression while naming the queries round 10 really did speed up
  * (q_embed_stats z = −9.3, q_exact_dups z = −4.3).
  *
  * Queries under `floorSec` on BOTH sides are excluded: a 0.1 s → 0.3 s
  * drift is pure scheduler noise and would only pollute the median.
  *
  * Interpreting a flag: it names a CANDIDATE, not a verdict. Same-day
  * artifact pairs have tight sigmas (measured 0.16 vs 0.31 across
  * rounds), so non-uniform climate — e.g. page-cache state inflating
  * small scan-bound queries 2× while the suite median moves 1.1× —
  * can flag untouched queries. The check that settles it (measured on
  * six such flags, r11): re-time the flagged queries in isolation
  * (`SPARK_GRAFT_BENCH_ONLY=...` with an explicit BENCH_OUT) and diff
  * `git log` for their operators; isolated times reproducing the new
  * numbers on untouched code = climate shape, not regression. */
object BenchCompare {

  /** Extract the flat `"queries":{...}` map from a BENCH.json artifact
    * (same device as BenchBudgetSpec — no JSON library on the
    * classpath by design). */
  def queriesMap(path: String): Map[String, Double] = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val start = txt.indexOf("\"queries\":{")
    require(start >= 0, s"$path has no queries map")
    val body = txt.substring(start + "\"queries\":{".length,
      txt.indexOf('}', start))
    // Mis-parse guards (r11 verdict): the substring-to-first-`}` device
    // is only correct for a FLAT map. If the driver ever nests an
    // object inside `queries`, the body truncates at the nested brace —
    // fail loudly instead of silently comparing a prefix.
    require(!body.contains('{'),
      s"$path: queries map is not flat — substring parse would truncate")
    val m = """"([^"]+)":(-?\d+(?:\.\d+)?)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // Cross-checks against the artifact's own bookkeeping where present:
    // parsed count must equal n_timed, and the per-query sum must
    // reproduce the headline total within rounding.
    """"n_timed":(\d+)""".r.findFirstMatchIn(txt).foreach { nm =>
      val n = nm.group(1).toInt
      require(m.size == n,
        s"$path: parsed ${m.size} queries but artifact says n_timed=$n")
    }
    // The headline value is anchored to the SAME JSON object as the
    // matched "metric":"total" ([^{}]* forbids crossing an object
    // boundary; both key orders accepted) — a free-floating "value":N
    // grab could pair the queries sum with an unrelated number on a
    // multi-object driver log. A present-but-unpairable headline aborts
    // rather than silently skipping the cross-check.
    val headline =
      """"metric":"total"[^{}]*?"value":(-?\d+(?:\.\d+)?)""".r
        .findFirstMatchIn(txt)
        .orElse(""""value":(-?\d+(?:\.\d+)?)[^{}]*?"metric":"total"""".r
          .findFirstMatchIn(txt))
    require(""""metric":"total"""".r.findFirstIn(txt).isEmpty ||
      headline.isDefined,
      s"""$path: found "metric":"total" but no "value" in the same object""")
    headline.foreach { vm =>
      val v = vm.group(1).toDouble
      val tol = math.max(0.5, 0.005 * v)
      require(math.abs(m.values.sum - v) <= tol,
        s"$path: queries sum ${m.values.sum} != headline value $v (tol $tol)")
    }
    m
  }

  final case class Delta(name: String, oldSec: Double, newSec: Double,
                         z: Double)
  final case class Report(nCommon: Int, climate: Double, sigmaUp: Double,
                          sigmaDn: Double, regressions: Seq[Delta],
                          improvements: Seq[Delta])

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def compare(oldQ: Map[String, Double], newQ: Map[String, Double],
              floorSec: Double = 0.5, zThreshold: Double = 3.5): Report = {
    val lr = (for {
      (k, o) <- oldQ.toSeq
      n <- newQ.get(k)
      if o > 0 && n > 0 && math.max(o, n) >= floorSec
    } yield (k, o, n, math.log(n / o)))
    require(lr.nonEmpty, "no common queries above the floor")
    val med = median(lr.map(_._4))
    // one-sided robust scales: deviations above/below the climate
    // median scaled separately (MAD × 1.4826 ≈ σ under normality)
    val up = lr.map(_._4 - med).filter(_ >= 0)
    val dn = lr.map(med - _._4).filter(_ >= 0)
    val sUp = math.max(1e-9, 1.4826 * median(up))
    val sDn = math.max(1e-9, 1.4826 * median(dn))
    val scored = lr.map { case (k, o, n, l) =>
      val d = l - med
      Delta(k, o, n, if (d >= 0) d / sUp else d / sDn)
    }
    Report(lr.size, math.exp(med), sUp, sDn,
      scored.filter(_.z > zThreshold).sortBy(-_.z),
      scored.filter(_.z < -zThreshold).sortBy(_.z))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchCompare <old BENCH.json> <new BENCH.json> [zThreshold]")
    val z = if (args.length > 2) args(2).toDouble else 3.5
    val r = compare(queriesMap(args(0)), queriesMap(args(1)), zThreshold = z)
    def fmt(d: Delta) =
      f"${d.name} ${d.oldSec}%.2f->${d.newSec}%.2f (z=${d.z}%.1f)"
    println(f"climate: x${r.climate}%.3f over ${r.nCommon} common queries " +
      f"(sigma_up=${r.sigmaUp}%.3f sigma_dn=${r.sigmaDn}%.3f, |z|>$z%.1f flags)")
    println(s"code regressions: " +
      (if (r.regressions.isEmpty) "none" else r.regressions.map(fmt).mkString("; ")))
    println(s"code improvements: " +
      (if (r.improvements.isEmpty) "none" else r.improvements.map(fmt).mkString("; ")))
    def js(ds: Seq[Delta]) = ds.map(d =>
      f"""{"q":"${d.name}","old":${d.oldSec}%.4f,"new":${d.newSec}%.4f,"z":${d.z}%.2f}""")
      .mkString("[", ",", "]")
    println(f"""{"metric":"bench_compare","climate":${r.climate}%.4f,"n_common":${r.nCommon},"regressions":${js(r.regressions)},"improvements":${js(r.improvements)}}""")
  }
}
