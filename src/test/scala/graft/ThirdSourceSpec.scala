package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Third-source invariant checks for the shared engine+oracle formula
  * surface (r11 verdict, "What's wrong" #1 → "Next" #2).
  *
  * The blind spot these tests close: any constant or formula authored
  * once and MIRRORED into the DuckDB oracle SQL is invisible to the
  * hash-compare correctness gate — engine and oracle agree on every row
  * while both are wrong. The historical instance: the day-of-week
  * encoding shipped as `(epoch_day + 4) mod 7` on BOTH sides for ten
  * rounds; every dow label was one day off and 434/434 stayed green. It
  * was found by code review, not by the gate.
  *
  * The defense is an INDEPENDENT implementation nobody mirrored:
  *  - calendar facts against `java.time` (dow, epoch-day arithmetic,
  *    leap days, week buckets, age anniversaries);
  *  - published test vectors where they exist (Winkler's 1990 name
  *    pairs for Jaro-Winkler, archival Soundex codes, the classic
  *    4×4 Morton/Hilbert curve tables);
  *  - spec-local recomputation in plain Scala for formula families
  *    (BM25, NDCG discounts) — same published formula, separately
  *    authored arithmetic, so a transcription error on the engine side
  *    no longer has an identically-transcribed oracle to hide behind.
  *
  * Reverting the dow fix (+3 → +4 in EpochCal.dowFromEpochDay) makes
  * this suite fail — measured, see SCALE.md round-12 ledger — which is
  * exactly the catch CORRECTNESS_r*.json could never make.
  */
class ThirdSourceSpec extends SparkSpec {

  import java.time.{Duration, LocalDate}

  // ---- calendar facts vs java.time ---------------------------------

  test("epoch day 0 is a Thursday and the dow encoding lands it on 3") {
    // the premise behind the +3 in (epoch_day + 3) mod 7, 0 = Monday
    assert(LocalDate.ofEpochDay(0).getDayOfWeek == java.time.DayOfWeek.THURSDAY)
    val r = evalExpr(graft.functions.EpochCal.dowFromEpochDay(lit(0L)))
    assert(r.getLong(0) == 3L, s"dow(epoch day 0) = ${r.getLong(0)}, want 3 (Thursday)")
  }

  test("dow encoding matches java.time over a 60-year day sample (incl. pre-epoch)") {
    import spark.implicits._
    // every residue class × many weeks, plus negative (pre-epoch) days
    // where a naive % would differ from pmod
    val days = ((-1000L to 24000L by 97L) ++ Seq(-1L, 0L, 1L, 6L, 7L)).toSeq
    val got = days.toDF("day")
      .select(col("day"),
        graft.functions.EpochCal.dowFromEpochDay(col("day")).as("dow"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    days.foreach { d =>
      // java.time: MONDAY=1 … SUNDAY=7; engine encodes MONDAY=0 … SUNDAY=6
      val want = LocalDate.ofEpochDay(d).getDayOfWeek.getValue - 1L
      assert(got(d) == want,
        s"dow(epoch day $d = ${LocalDate.ofEpochDay(d)}): engine ${got(d)}, java.time $want")
    }
  }

  test("the inline epoch-day formula matches LocalDate.toEpochDay (incl. leap days)") {
    // `unix_millis(cast(d as timestamp)) div 86400000` — the bucket
    // formula written verbatim at dozens of engine sites AND in the
    // oracle SQL (epoch_ms(ts) // 86400000). Third source: java.time's
    // proleptic-Gregorian day count, which also pins month lengths and
    // the leap-year rule. Valid because the session timezone is UTC
    // (GraftSession) — a timezone drift would shift every bucket and
    // fail here.
    val dates = Seq("1970-01-01", "1970-01-02", "1969-12-31", "1992-02-29",
      "1996-02-29", "2000-02-29", "1900-03-01", "1998-08-17", "1995-06-15",
      "1992-01-31", "1992-03-01", "1997-12-31", "2024-02-29", "2030-11-05")
    dates.foreach { d =>
      val got = evalExpr(
        expr(s"unix_millis(cast(date'$d' as timestamp)) div 86400000")).getLong(0)
      val want = LocalDate.parse(d).toEpochDay
      assert(got == want, s"epoch day of $d: engine $got, java.time $want")
    }
  }

  test("ms-per-day and ms-per-week constants match java.time durations") {
    assert(graft.functions.EpochCal.DayMs == Duration.ofDays(1).toMillis)
    assert(graft.functions.EpochCal.WeekMs == Duration.ofDays(7).toMillis)
  }

  test("the week-bucket formula is floorDiv(epochDay, 7) with Thursday-epoch weeks") {
    // `epoch_ms // 604800000` (oracle) / `div 604800000` (engine):
    // weeks are epoch-aligned, so week 0 starts Thursday 1970-01-01 and
    // week boundaries fall every 7 epoch days — NOT ISO weeks. Third
    // source: java.time day count + Math.floorDiv.
    val dates = Seq("1970-01-01", "1970-01-07", "1970-01-08", "1969-12-25",
      "1992-02-29", "1998-08-17", "2024-02-29")
    dates.foreach { d =>
      val got = evalExpr(
        expr(s"unix_millis(cast(date'$d' as timestamp)) div 604800000")).getLong(0)
      val want = Math.floorDiv(LocalDate.parse(d).toEpochDay, 7L)
      assert(got == want, s"week bucket of $d: engine $got, java.time $want")
    }
  }

  test("ageYears matches java.time Period on ordinary anniversaries") {
    // F16's SQL semantics (months_between/12, floored) and java.time's
    // Period.between agree everywhere except the Feb-29-birthday
    // month-end corner (SQL's both-month-ends rule counts 2000-02-29 →
    // 2023-02-28 as a full 23 years, Period as 22y11m30d) — that corner
    // is the reference's documented behavior, so it is excluded here
    // and the agreement surface is everything else.
    val cases = Seq(
      ("2000-06-15", "2024-06-14"), ("2000-06-15", "2024-06-15"),
      ("2000-06-15", "2024-06-16"), ("1987-01-02", "2024-01-01"),
      ("1987-01-02", "2024-01-02"), ("1999-12-31", "2024-12-30"),
      ("2004-02-28", "2024-02-27"), ("2004-02-28", "2024-02-28"),
      ("2004-03-01", "2024-02-29"), ("1970-01-01", "2024-08-16"))
    cases.foreach { case (birth, asOf) =>
      val got = evalExpr(graft.functions.Parsing.ageYears(
        to_date(lit(birth)), to_date(lit(asOf)))).getInt(0)
      val want = java.time.Period.between(
        LocalDate.parse(birth), LocalDate.parse(asOf)).getYears
      assert(got == want, s"age($birth, $asOf): engine $got, java.time $want")
    }
  }

  // ---- Jaro-Winkler: Winkler's published name pairs -----------------

  private def jw(a: String, b: String): Double =
    evalExpr(expr(s"graft_jaro_winkler('$a', '$b')")).getDouble(0)

  test("Jaro-Winkler reproduces Winkler's published name-pair values") {
    // the canonical vectors from Winkler (1990) / the string-matching
    // literature, to 4 decimals
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611) < 5e-4,
      s"MARTHA/MARHTA = ${jw("MARTHA", "MARHTA")}, published 0.9611")
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133) < 5e-4,
      s"DIXON/DICKSONX = ${jw("DIXON", "DICKSONX")}, published 0.8133")
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400) < 5e-4,
      s"DWAYNE/DUANE = ${jw("DWAYNE", "DUANE")}, published 0.8400")
    assert(jw("IDENTICAL", "IDENTICAL") == 1.0)
    assert(jw("ABC", "XYZ") == 0.0, "zero-match pair must score 0")
  }

  // ---- Soundex: archival known-answer codes --------------------------

  test("phoneticKey reproduces archival Soundex codes (H/W-free names)") {
    // classic published vectors that do not exercise the H/W
    // transparency rule (phoneticKey documents that ONE deliberate
    // divergence; everything else must match the archival algorithm,
    // including first-letter run collapse: PF → one code in Pfister)
    val want = Map("Robert" -> "R163", "Rupert" -> "R163",
      "Pfister" -> "P236", "Jackson" -> "J250", "Honeyman" -> "H555")
    want.foreach { case (name, code) =>
      val got = evalExpr(
        graft.operators.EntityResolution.phoneticKey(lit(name))).getString(0)
      assert(got == code, s"soundex($name): engine $got, archival $code")
    }
  }

  // ---- NDCG: discount weights vs an independent log2 ----------------

  test("NDCG discount integers equal round(1e16 / log2(rank+1))") {
    // Eval.NdcgWi pins ⌊10^16/log₂(i+1)⌉ as integers (the
    // FMA-divergence device). Recompute each from java.lang.Math.log —
    // a separate log implementation — allowing ±4 ulp-of-the-16th-digit
    // for the recomputation's own rounding. A wrong rank offset or
    // log base lands ~10^15 away, far outside the tolerance.
    graft.ml.Eval.NdcgWi.zipWithIndex.foreach { case (w, i) =>
      val log2 = Math.log(i + 2.0) / Math.log(2.0)
      val want = (BigDecimal(10).pow(16) / BigDecimal(log2))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(math.abs(w - want) <= 4L,
        s"NdcgWi($i) = $w, independent recompute $want")
    }
  }

  test("the pinned weights reproduce a hand-computed 3-document DCG") {
    // rels (3, 2, 1) at ranks 1..3: DCG = 3/1 + 2/log2(3) + 1/2
    val wi = graft.ml.Eval.NdcgWi
    val viaWeights = (3.0 * wi(0) + 2.0 * wi(1) + 1.0 * wi(2)) / 1e16
    val byHand = 3.0 + 2.0 / (Math.log(3.0) / Math.log(2.0)) + 0.5
    assert(math.abs(viaWeights - byHand) < 1e-9,
      s"3-doc DCG via weights $viaWeights, by hand $byHand")
  }

  // ---- BM25: textbook toy corpus, spec-local recomputation ----------

  test("BM25 matches an independently computed toy-corpus ranking") {
    import spark.implicits._
    val texts = Map(
      1L -> "spark makes window functions fast",
      2L -> "hash join hash agg",
      3L -> "window window window")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val got = graft.scale.Search.bm25(docs, Seq("spark", "window", "hash"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent arithmetic: Robertson BM25 with the engine's
    // documented log-free rational idf, K1 = 1.2, B = 0.75
    val dl = texts.view.mapValues(_.split(" ").length.toDouble).toMap
    val n = texts.size.toDouble
    val avgdl = dl.values.sum / n
    def tf(d: Long, t: String) = texts(d).split(" ").count(_ == t).toDouble
    def df(t: String) = texts.keys.count(d => tf(d, t) > 0).toDouble
    def score(d: Long): Double = {
      val s = Seq("spark", "window", "hash").map { t =>
        val f = tf(d, t)
        if (f == 0) 0.0
        else {
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
          idf * (f * (graft.scale.Search.K1 + 1.0)) /
            (f + graft.scale.Search.K1 *
              (1.0 - graft.scale.Search.B + graft.scale.Search.B * dl(d) / avgdl))
        }
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    texts.keys.foreach { d =>
      assert(math.abs(got(d) - score(d)) < 2e-6,
        s"bm25(doc $d): engine ${got(d)}, independent ${score(d)}")
    }
    // and the ranking the rational idf must preserve (ln is monotone)
    assert(got.toSeq.sortBy(-_._2).map(_._1) ==
      texts.keys.toSeq.sortBy(d => -score(d)),
      "rank order diverged from the independent computation")
  }

  // ---- pinned statistical constants vs independent computation ------

  /** Acklam's rational approximation to the standard normal quantile
    * (|relative error| < 1.15e-9) — an independent inverse-normal, no
    * shared ancestry with any engine constant. */
  private def invNorm(p: Double): Double = {
    require(p > 0 && p < 1)
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else -invNorm(1 - p)
  }

  /** Standard normal CDF via Abramowitz & Stegun 7.1.26 erf
    * (|error| < 1.5e-7) — again independent of everything engine-side. */
  private def phi(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x) / math.sqrt(2.0))
    val y = 1 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t *
      math.exp(-x * x / 2.0)
    if (x >= 0) 0.5 * (1 + y) else 0.5 * (1 - y)
  }

  test("Benford probabilities equal log10(1 + 1/d) (independent Math.log10)") {
    graft.operators.Analytics.BenfordP.foreach { case (digit, p) =>
      val want = math.log10(1.0 + 1.0 / digit.toInt)
      assert(math.abs(p - want) <= 2 * math.ulp(want),
        s"Benford P($digit) = $p, Math.log10 gives $want")
    }
  }

  test("Wilson interval constants: z = 1.96 is z_{0.975}; 3.8416 is its square") {
    import graft.operators.Distribution.{WilsonZ, WilsonZ2}
    assert(math.abs(WilsonZ - invNorm(0.975)) < 6e-4,
      s"WilsonZ $WilsonZ vs independent z_{0.975} ${invNorm(0.975)}")
    assert(math.abs(WilsonZ2 - WilsonZ * WilsonZ) < 1e-10,
      s"WilsonZ2 $WilsonZ2 is not the square of $WilsonZ")
  }

  test("the MDE 2.8 constant is z_{0.975} + z_{0.80} to its pinned precision") {
    val want = invNorm(0.975) + invNorm(0.80) // 2.8016 to 4 dp
    assert(math.abs(graft.operators.Distribution.MdeZSum - want) < 5e-3,
      s"MdeZSum 2.8 vs independent $want")
  }

  test("Tukey q-critical 3.858 puts 95% mass under the range of 5 standard normals") {
    // df = infinity, k = 5: the studentized range reduces to the plain
    // range of 5 iid N(0,1); P(R <= q) = 5 ∫ φ(z) [Φ(z+q) − Φ(z)]^4 dz.
    // Simpson integration with the independent A&S normal above — a
    // wrong table row (k or alpha) lands percent-level away, far outside
    // the tolerance.
    val q = graft.operators.Distribution.TukeyQCrit
    def dens(z: Double): Double = {
      val f = math.exp(-z * z / 2.0) / math.sqrt(2 * math.Pi)
      5.0 * f * math.pow(phi(z + q) - phi(z), 4)
    }
    val (lo, hi, n) = (-9.0, 9.0, 3600)
    val h = (hi - lo) / n
    val pRange = (h / 3.0) * (dens(lo) + dens(hi) +
      (1 until n).map(i => (if (i % 2 == 1) 4.0 else 2.0) * dens(lo + i * h)).sum)
    assert(math.abs(pRange - 0.95) < 2e-3,
      s"P(range of 5 normals <= $q) = $pRange, table says 0.95")
  }

  test("O'Brien-Fleming boundaries re-derived from the Armitage recursion") {
    // The five pinned group-sequential criticals (K = 5 equal looks,
    // two-sided alpha = 0.05, Lan-DeMets OBF spending
    // alpha*(t) = 4 - 4*Phi(z_{alpha/4}/sqrt(t))) are a published table.
    // Re-derive every one from first principles: maintain the
    // sub-density of the un-stopped sum process S_k on a grid
    // (Armitage-McPherson-Rowe recursion), at each look solve the
    // boundary b_k whose tail mass spends exactly alpha*(t_k) minus what
    // earlier looks spent, and compare z_k = b_k/sqrt(k) to the pinned
    // values. High-accuracy tail CDF via the Numerical-Recipes erfc
    // rational (relative error < 1.2e-7 — the A&S absolute bound is too
    // coarse for the 1e-6 first-look spend).
    def erfcc(x: Double): Double = {
      val z = math.abs(x); val t = 1.0 / (1.0 + 0.5 * z)
      val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
        t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
        t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
        t * (-0.82215223 + t * 0.17087277)))))))))
      if (x >= 0) ans else 2.0 - ans
    }
    def phiHi(x: Double): Double = 0.5 * erfcc(x / math.sqrt(2.0)) // 1 - Phi(x)
    val alpha = 0.05; val k5 = 5
    val zq = invNorm(1 - alpha / 4)
    def spend(t: Double): Double = 4.0 * phiHi(zq / math.sqrt(t))

    // grid over the sum-process domain
    val h = 0.01; val lim = 14.0; val n = (2 * lim / h).toInt
    val grid = Array.tabulate(n + 1)(i => -lim + i * h)
    def gauss(x: Double): Double =
      math.exp(-x * x / 2.0) / math.sqrt(2 * math.Pi)
    // f = sub-density of S_k over the grid (starts as N(0,1))
    var f = grid.map(gauss)
    var spent = 0.0
    val derived = (1 to k5).map { k =>
      val target = spend(k.toDouble / k5) - spent
      // tail mass of f outside +/-b — midpoint cells with FRACTIONAL
      // coverage of the straddling cell, so the mass is continuous in b
      // and bisection resolves the boundary below the grid step
      val total = f.sum * h
      def outside(b: Double): Double = {
        val inside = grid.indices.map { i =>
          val cellLo = grid(i) - h / 2; val cellHi = grid(i) + h / 2
          val ovl = math.min(cellHi, b) - math.max(cellLo, -b)
          if (ovl <= 0) 0.0 else f(i) * math.min(ovl, h)
        }.sum
        total - inside
      }
      // bisect b in [0, lim]
      var loB = 0.0; var hiB = lim
      (0 until 60).foreach { _ =>
        val mid = (loB + hiB) / 2
        if (outside(mid) > target) loB = mid else hiB = mid
      }
      val b = (loB + hiB) / 2
      spent += outside(b)
      // truncate at +/-b, then convolve with a standard normal increment
      val trunc = grid.indices.map(i =>
        if (math.abs(grid(i)) <= b) f(i) else 0.0).toArray
      f = Array.tabulate(n + 1) { j =>
        var acc = 0.0; var i = 0
        while (i <= n) {
          val d = grid(j) - grid(i)
          if (math.abs(d) < 8.0) acc += trunc(i) * gauss(d)
          i += 1
        }
        acc * h
      }
      b / math.sqrt(k.toDouble)
    }
    graft.operators.Distribution.ObfBoundaries.zip(derived).zipWithIndex
      .foreach { case ((pinned, got), i) =>
        assert(math.abs(pinned - got) < 3e-3,
          s"OBF boundary ${i + 1}: pinned $pinned, derived $got")
      }
  }

  // ---- BPE: Sennrich's published toy corpus --------------------------

  test("BPE training reproduces Sennrich's toy-corpus merge sequence") {
    import spark.implicits._
    // the corpus from Sennrich, Haddow & Birch (2016), §3.2:
    // {'low':5, 'lower':2, 'newest':6, 'widest':3}. Expected first five
    // merges with the </w> marker, recomputed by hand here: (e,s) 9,
    // (es,t) 9, (est,</w>) 9, (l,o) 7, (lo,w) 7.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = graft.scale.Bpe.train(docs, numMerges = 5)
    val got = merges.map(m => (m.left, m.right, m.pairCount))
    val want = Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L))
    assert(got == want, s"BPE merges: engine $got, Sennrich $want")
  }

  // ---- Morton & Hilbert: classic 4×4 curve tables --------------------

  // bucket-exact inputs: with range [0, 4] and 2 bits, v/4*3 is exact
  // IEEE for v ∈ {0, 1.5, 3, 4} → buckets {0, 1, 2, 3}
  private val BucketVal = Map(0 -> 0.0, 1 -> 1.5, 2 -> 3.0, 3 -> 4.0)

  test("Morton z-value reproduces the classic 4x4 interleave table") {
    import spark.implicits._
    // published z-curve order for a 4×4 grid, x in the even (least
    // significant) bit positions — the standard bit-interleave table
    val want = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 3L,
      (2, 0) -> 4L, (3, 0) -> 5L, (2, 1) -> 6L, (3, 1) -> 7L,
      (0, 2) -> 8L, (1, 2) -> 9L, (0, 3) -> 10L, (1, 3) -> 11L,
      (2, 2) -> 12L, (3, 2) -> 13L, (2, 3) -> 14L, (3, 3) -> 15L)
    val cells = want.keys.toSeq.map { case (x, y) =>
      (x, y, BucketVal(x), BucketVal(y)) }
    val got = cells.toDF("x", "y", "xv", "yv")
      .select(col("x"), col("y"),
        graft.scale.Layout.zvalue(Seq(col("xv"), col("yv")),
          Seq((0.0, 4.0), (0.0, 4.0)), bits = 2).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    want.foreach { case (cell, z) =>
      assert(got(cell) == z, s"morton$cell: engine ${got(cell)}, table $z")
    }
  }

  test("Hilbert index matches an independent xy2d transliteration on the 4x4 grid") {
    import spark.implicits._
    // third source: the textbook iterative xy2d (Wikipedia's C version,
    // transliterated here independently of the engine's staged-CASE form)
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var x = x0; var y = y0; var d = 0L; var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) { // rotate: reflect over the FULL grid (n-1), then swap
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val cells = for (x <- 0 to 3; y <- 0 to 3) yield (x, y, BucketVal(x), BucketVal(y))
    val got = graft.scale.Layout.hilbertIndex(
        cells.toDF("x", "y", "xv", "yv"),
        col("xv"), col("yv"), Seq((0.0, 4.0), (0.0, 4.0)), bits = 2)
      .select("x", "y", "h")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (x <- 0 to 3; y <- 0 to 3) {
      val want = xy2d(4, x, y)
      assert(got((x, y)) == want,
        s"hilbert($x,$y): engine ${got((x, y))}, xy2d $want")
    }
    // sanity on the third source itself: a Hilbert index visits every
    // cell exactly once
    assert((0 to 3).flatMap(x => (0 to 3).map(y => xy2d(4, x, y))).sorted
      == (0L to 15L), "transliterated xy2d is not a permutation")
  }

  test("Poisson(1) CDF cut points equal e^-1 * partial sums of 1/k!") {
    // q_bootstrap's per-row resample weights come from cutting a uniform
    // at the pinned Poisson(1) CDF values — literals shared VERBATIM
    // with the oracle SQL, so nobody mirrors them (the Benford/Wilson/
    // Tukey class; this was the one pinned-constant family the r12
    // sweep missed). Third source: P(X<=k) = e^-1 * sum_{i<=k} 1/i!,
    // computed here from Math.exp and integer factorials alone, rounded
    // to the pinned 4-decimal precision.
    val pinned = graft.operators.Distribution.Poisson1Cdf4dp
    assert(pinned.size == 4 && pinned == pinned.sorted,
      s"cut points must be 4 increasing values: $pinned")
    var factorial = 1.0
    var partial = 0.0
    for (k <- 0 to 3) {
      if (k > 0) factorial *= k
      partial += 1.0 / factorial
      val want = math.rint(math.exp(-1.0) * partial * 1e4) / 1e4
      assert(pinned(k) == want,
        f"P(X<=$k): pinned ${pinned(k)}%.4f, derived $want%.4f")
    }
    // and the residual tail actually exists: P(X>=4) under Poisson(1)
    // is ~1.9% — the otherwise(4) branch is reachable, not dead
    assert(1.0 - pinned.last > 0.018 && 1.0 - pinned.last < 0.020)
  }

  private def simpson(lo: Double, hi: Double, n: Int)(f: Double => Double)
      : Double = {
    val h = (hi - lo) / n
    (h / 3.0) * (f(lo) + f(hi) +
      (1 until n).map(i => (if (i % 2 == 1) 4.0 else 2.0) * f(lo + i * h)).sum)
  }

  test("z-quantile family: 1.645 / 0.6745 / 3.841 derive from Acklam's inverse normal") {
    // Three more pinned-literal families shared verbatim with oracle SQL
    // (the r13 grep audit of lit(<4+-digit decimal>)): the safety-stock
    // service z, the SAX quartile breakpoints, and the SRM chi-square
    // critical value — all quantiles of ONE distribution, each checked
    // at its own pinned precision against the independent inverse normal.
    assert(math.rint(invNorm(0.95) * 1e3) / 1e3
      == graft.operators.Analytics.Z95_3dp,
      s"z_0.95 ${invNorm(0.95)} does not round to the pinned 1.645")
    assert(math.rint(invNorm(0.75) * 1e4) / 1e4
      == graft.operators.TimeSeries.Z75_4dp,
      s"z_0.75 ${invNorm(0.75)} does not round to the pinned 0.6745")
    val z = invNorm(0.975) // chi2_1(0.95) = z_{0.975}^2 = 3.84146 -> 3.841
    assert(math.rint(z * z * 1e3) / 1e3
      == graft.operators.EventOps.Chi2Df1Crit95_3dp,
      s"z_0.975^2 ${z * z} does not round to the pinned 3.841")
  }

  test("HLL alpha_64 = 0.709 derives from Flajolet's defining integral") {
    // alpha_m = (m * I)^-1 with I = integral_0^inf log2((2+u)/(1+u))^m du
    // (the HLL paper's bias-correction definition; the 0.7213/(1+1.079/m)
    // closed form is only quoted for m >= 128, so the m=64 literal can't
    // be cross-checked from it). The integrand is 1 at u=0 and decays
    // ~(u ln2)^-64, so [0, 50] carries all mass beyond double precision.
    val m = 64
    val ln2 = math.log(2.0)
    val integral = simpson(0.0, 50.0, 200000) { u =>
      math.pow(math.log((2.0 + u) / (1.0 + u)) / ln2, m)
    }
    val alpha = 1.0 / (m * integral)
    assert(math.rint(alpha * 1e3) / 1e3 == graft.operators.Approx.HllAlpha64,
      s"derived alpha_64 $alpha does not round to the pinned 0.709")
  }

  test("x-bar/R chart constants for n=7 derive from the normal-range moments") {
    // No control-chart table consulted: d2 = E[range of 7 iid N(0,1)] =
    // integral of 1 - Phi^7 - (1-Phi)^7; E[R^2] = 2 * iint_{x<y}
    // P(min<=x, max>=y) with P = 1 - (1-Phi(x))^7 - Phi(y)^7 +
    // (Phi(y)-Phi(x))^7 (Hartley's identity, from (M-m)^2 =
    // 2*iint_{m<=x<y<=M} dx dy). Both by Simpson over the spec's
    // independent A&S Phi; then A2 = 3/(d2*sqrt(7)), D3/D4 = 1 -/+ 3*d3/d2
    // with d3 = sd of the range. A wrong subgroup size or a transposed
    // table row lands percent-level away.
    val n = 7
    val d2 = simpson(-9.0, 9.0, 3600) { x =>
      1.0 - math.pow(phi(x), n) - math.pow(1.0 - phi(x), n)
    }
    val er2 = 2.0 * simpson(-8.0, 8.0, 800) { x =>
      val px = phi(x)
      simpson(x, 8.0, 400) { y =>
        val py = phi(y)
        1.0 - math.pow(1.0 - px, n) - math.pow(py, n) + math.pow(py - px, n)
      }
    }
    val d3 = math.sqrt(er2 - d2 * d2)
    import graft.operators.TimeSeries.{XbarA2n7, RChartD3n7, RChartD4n7}
    assert(math.rint(3.0 / (d2 * math.sqrt(7.0)) * 1e3) / 1e3 == XbarA2n7,
      s"A2 from d2=$d2 does not round to the pinned 0.419")
    assert(math.rint((1.0 - 3.0 * d3 / d2) * 1e3) / 1e3 == RChartD3n7,
      s"D3 from d2=$d2, d3=$d3 does not round to the pinned 0.076")
    assert(math.rint((1.0 + 3.0 * d3 / d2) * 1e3) / 1e3 == RChartD4n7,
      s"D4 from d2=$d2, d3=$d3 does not round to the pinned 1.924")
  }
}
