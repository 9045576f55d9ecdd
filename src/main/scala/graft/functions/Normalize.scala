package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Matching/normalization functions (SURVEY.md §2.9 F17–F19) — the only
  * part of the expression library that genuinely needs UDFs (Unicode
  * normalization, edit-distance ratio). Both UDFs are deterministic and
  * null-safe, so Catalyst can still prune/push around them.
  */
object Normalize {

  /** F17 `normalize_for_matching` (src/common/term_mapper.py:35-59):
    * lowercase, strip accents (NFD + mark removal), punctuation→space,
    * collapse whitespace. */
  private def normalizeStr(s: String): String =
    if (s == null) null
    else {
      val noMarks = Normalizer.normalize(s, Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", "")
      noMarks.toLowerCase
        .replaceAll("[^\\p{L}\\p{N}]+", " ")
        .trim
        .replaceAll("\\s+", " ")
    }

  private lazy val normalizeUdf = udf(normalizeStr _)

  def normalizeForMatching(c: Column): Column = normalizeUdf(c)

  /** F19 exact fuzzy ratio matching `thefuzz.fuzz.ratio` semantics
    * (entity_mapper.py:69-71): 100 * 2M/(|a|+|b|) where M = SequenceMatcher
    * matches = (|a|+|b| - D₂)/2 with substitution-cost-2 edit distance. */
  private[graft] def ratio(a: String, b: String): Int = {
    if (a == null || b == null) return 0
    if (a.isEmpty && b.isEmpty) return 100
    val (n, m) = (a.length, b.length)
    var prev = Array.tabulate(m + 1)(identity)
    var curr = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      curr(0) = i
      var j = 1
      while (j <= m) {
        val sub = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 2
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + sub)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    // half-to-even, matching thefuzz's int(round(x)) — see
    // graft.plans.FuzzyRatio.ratio (the codegen twin of this UDF)
    math.rint(100.0 * (n + m - prev(m)) / (n + m)).toInt
  }

  private lazy val ratioUdf = udf(ratio _)

  def fuzzyRatio(a: Column, b: Column): Column = ratioUdf(a, b)

  /** Cheap codegen approximation of the ratio (SURVEY §4.2): Levenshtein-
    * based, suitable for blocking/pre-filter before the exact UDF.
    * Two empty strings are a perfect match (100) by definition — and the
    * unguarded 0/0 produced NaN whose int cast THROWS under ANSI mode,
    * where the exact ratio() it pre-filters for returns 100. */
  def fuzzyRatioApprox(a: Column, b: Column): Column =
    when(greatest(length(a), length(b)) === 0,
      when(a.isNotNull && b.isNotNull, lit(100)))
      .otherwise(round(lit(100.0) * (lit(1.0) -
        levenshtein(a, b).cast("double") /
          greatest(length(a), length(b)))).cast("int"))

  /** F18 term lookup (term_mapper.py:96-121): synonym→canonical code as a
    * generated CASE ladder over a normalized column — broadcast-free,
    * codegen'd, rebuilt per batch from config. */
  def termLookup(c: Column, mapping: Map[String, String],
                 default: Column = lit(null).cast("string")): Column =
    // Let-bound: inlining the normalize UDF into every CASE branch runs
    // NFD + three regex replaces up to K times per row wherever codegen
    // subexpression elimination doesn't apply (see graft.functions.Let's
    // measured 5x note); bound, it evaluates once per row.
    Let.bind(normalizeForMatching(c)) { n =>
      mapping.foldRight(default) { case ((syn, canon), acc) =>
        when(n === syn, canon).otherwise(acc)
      }
    }
}
