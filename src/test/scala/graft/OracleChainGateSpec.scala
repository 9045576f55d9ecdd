package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the MEASURED oracle-engine float-chain rule (SCALE.md,
  * round 11): DuckDB 1.0.0 does not evaluate a ± chain per-op-IEEE
  * once it has ≥ 5 operands AND ≥ 3 inexact-literal multiply/divide
  * factors (~13 % of rows diverge, deterministically, plan-invisible —
  * the shape that cost q_ndcg a 1-ulp divergence at the 10× corpus in
  * r10). Column-only chains, ≤ 4-operand chains, and exact literals
  * (powers of two) measured clean across 200 k-row probes.
  *
  * This spec sweeps every `SparkEntry.oracleSql` entry for the banned
  * shape so a future query can't reintroduce it. Heuristic, tuned to
  * zero false positives on the 434-query board: a flagged fragment is
  * a paren/comma-free run with ≥ 4 top-level +/− operators, ≥ 3
  * inexact decimal literals, and ≥ 3 mul/div signs, with no exact
  * integer/VARCHAR closing in sight. Anything it flags needs the
  * integer-pinning treatment (the q_ndcg/q_spectrum device) or a
  * restructure below 5 operands.
  */
class OracleChainGateSpec extends AnyFunSuite {

  /** Inexact decimal literal: a d.d token that is not a small power of
    * two (exact literals make evaluation-order differences invisible). */
  private def inexactLiterals(frag: String): Seq[String] =
    """(?<![\w.])\d+\.\d+(?![\w.])""".r.findAllIn(frag).toSeq.filter { t =>
      val v = t.toDouble
      // exact iff v * 2^k is integral for some small k (covers 0.5,
      // 0.25, 1.0, 2.0, 3.0, 1.5 ...)
      !(0 to 8).exists(k => (v * (1L << k)).isWhole)
    }

  private def bannedFragments(sql: String): Seq[String] = {
    // Every oracleSql entry is .stripMargin'd at definition, so a '|'
    // here is real SQL (|| concat, regex alternation) and must be kept
    // — truncating at it would let a banned chain earlier on the line
    // escape the scan. Only a LEADING lone pipe (a margin pipe on a
    // future entry someone forgot to stripMargin) is removed.
    var flat = sql.linesIterator
      .map(l => l.replaceFirst("""^\s*\|(?!\|)""", ""))
      .mkString(" ")
    // Collapse ±-free, comma-free paren groups (CAST(x AS DOUBLE),
    // (x * 0.63), function args) into their content so they don't
    // break the chain scan — a paren group WITH its own ± chain stays
    // and is scanned as its own fragment.
    var prev = ""
    while (prev != flat) {
      prev = flat
      flat = """\(([^(),+\-]*)\)""".r.replaceAllIn(flat, m =>
        java.util.regex.Matcher.quoteReplacement(" " + m.group(1) + " "))
    }
    """[^,()]+(?:[+\-][^,()]+){4,}""".r.findAllIn(flat).toSeq.filter { f =>
      inexactLiterals(f).size >= 3 &&
        (f.count(_ == '*') + f.count(_ == '/')) >= 3 &&
        !Seq("VARCHAR", "HUGEINT", "DECIMAL", "BIGINT").exists(f.contains)
    }
  }

  test("no oracle carries a >=5-operand +/- chain with >=3 inexact literal factors") {
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      bannedFragments(sql).map(f => s"$name: ${f.trim.take(120)}")
    }
    assert(offenders.isEmpty,
      "oracle chains in the measured non-per-op shape (see SCALE.md r11):\n" +
        offenders.mkString("\n"))
  }

  test("the gate would catch the r10 q_ndcg pinned-double shape") {
    val ndcgOld =
      """SELECT CAST(a AS DOUBLE) * 1.0
        | + CAST(b AS DOUBLE) * 0.6309297535714575
        | + CAST(c AS DOUBLE) * 0.43067655807339306
        | + CAST(d AS DOUBLE) * 0.38685280723454163
        | + CAST(e AS DOUBLE) * 0.3562071871080222 AS dcg FROM t""".stripMargin
    assert(bannedFragments(ndcgOld).nonEmpty,
      "gate heuristic no longer catches the known-bad NDCG chain shape")
  }
}
