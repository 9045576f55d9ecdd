package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §4.2): the two §2.9 functions
  * whose UDF form costs an encoder boundary on the entity-resolution hot
  * path, rebuilt as native expressions —
  *
  *  - `graft_fold_accents` (F17): Unicode-fold + punctuation-collapse
  *    normalization with real `doGenCode` (inlines a static call — no
  *    ScalaUDF serialization, stays inside whole-stage codegen)
  *  - `graft_fuzzy_ratio` (F19): exact thefuzz-ratio (substitution-cost-2
  *    edit distance); CodegenFallback, still UDF-overhead-free
  *
  * Registered through `SparkSessionExtensions` (set
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build),
  * the mechanism a user of the library enables cluster-wide.
  */
object GraftExtensions {
  /** NullType accepted: null inputs short-circuit via null-safe eval. */
  private[plans] def stringOrNull(dt: DataType): Boolean =
    dt == StringType || dt == org.apache.spark.sql.types.NullType
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Arity gate for the function builders: without it, extra SQL
    * arguments are silently DROPPED (children.head) — the query runs
    * and returns wrong results — and missing ones surface as a raw
    * IndexOutOfBoundsException with no function name. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n) throw new IllegalArgumentException(
        s"$name takes exactly $n argument(s), got ${children.size}")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_fold_accents"),
      new ExpressionInfo(classOf[FoldAccents].getName, "graft_fold_accents"),
      arity("graft_fold_accents", 1)(c => FoldAccents(c.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_fuzzy_ratio"),
      new ExpressionInfo(classOf[FuzzyRatio].getName, "graft_fuzzy_ratio"),
      arity("graft_fuzzy_ratio", 2)(c => FuzzyRatio(c.head, c(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      arity("graft_simhash60", 1)(c => SimHash60(c.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      arity("graft_jaro_winkler", 2)(c => JaroWinkler(c.head, c(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      arity("graft_cosine", 2)(c => CosineSim(c.head, c(1)))))
    ext.injectOptimizerRule(_ => FuzzyRatioFolding)
    // Whole-operator extension: plans TopKPerKeyNode as a partial/final
    // physical pair (see TopKPerKey.scala).
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // Zero-cost codegen split point for expression-heavy pipelines that
    // would otherwise blow Janino's 64 KB method limit and fall back to
    // interpreted mode (see CodegenBarrier.scala).
    ext.injectPlannerStrategy(_ => CodegenBarrierStrategy)
  }
}

/** Optimizer rule for the custom expression (the `Rule[LogicalPlan]`
  * extension point, SURVEY.md §4.2): Catalyst's own constant folding can't
  * see through `graft_fuzzy_ratio`, so fold the two cases it would miss —
  * identical children (ratio ≡ 100, pays an O(n·m) DP per row otherwise)
  * and two foldable literals (evaluate once at plan time). */
object FuzzyRatioFolding extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // deterministic guard: two semantically-equal NONDETERMINISTIC
      // children (same nondeterministic udf object, same args) still
      // produce different values at runtime — folding them to 100 is
      // wrong. Catalyst's own folding rules carry the same guard.
      case FuzzyRatio(a, b) if a.semanticEquals(b) && !a.nullable &&
          a.deterministic =>
        Literal(100, IntegerType)
      case r @ FuzzyRatio(a, b) if a.foldable && b.foldable &&
          a.eval() != null && b.eval() != null =>
        Literal(r.eval(), IntegerType)
    }
}

/** F17 normalization as a codegen'd unary expression. */
case class FoldAccents(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExtensions.stringOrNull(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    FoldAccents.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FoldAccents.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

object FoldAccents {
  // Hoisted: String.replaceAll compiles its Pattern per CALL; three
  // compiles per row on the scan this expression exists to accelerate
  // would dwarf the UDF-boundary cost it removes.
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")
  private val NonAlnum = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")
  private val Spaces = java.util.regex.Pattern.compile("\\s+")

  /** Static so generated code can call it without capturing the tree. */
  def fold(s: UTF8String): UTF8String = {
    val noMarks = Marks.matcher(java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFD)).replaceAll("")
    // Locale.ROOT: the default-locale overload makes the normalized key
    // depend on the JVM's locale (Turkish 'I' → dotless 'ı'), so the
    // same data would block differently across driver/executor locales
    // — and differently from the reference's locale-independent lower().
    UTF8String.fromString(
      Spaces.matcher(
        NonAlnum.matcher(noMarks.toLowerCase(java.util.Locale.ROOT))
          .replaceAll(" ").trim)
        .replaceAll(" "))
  }
}

/** F19 exact fuzzy ratio as a binary expression (no UDF encoder boundary;
  * the O(n·m) DP keeps it eval-only — CodegenFallback). */
case class FuzzyRatio(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_fuzzy_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExtensions.stringOrNull(left.dataType) &&
        GraftExtensions.stringOrNull(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzyRatio.ratio(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FuzzyRatio =
    copy(left = newLeft, right = newRight)
}

/** 60-bit SimHash of a space-tokenized text as a single codegen'd
  * expression: tokenize, md5 each token (first 15 hex chars = 60-bit
  * hash), vote per bit, sign vector = signature — one pass over the
  * string, no intermediate token array, no UDF encoder boundary. The
  * semantics are bit-identical to hashing `split(text, ' ')` (limit -1:
  * empty tokens from consecutive/leading/trailing spaces included) with
  * [[graft.scale.Dedup.simhash]], which the spec asserts. */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExtensions.stringOrNull(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Fused cosine similarity over two array<double> vectors (the ANN hot
  * path) as a real codegen expression: one loop accumulates dot product
  * and both squared norms, then dot/(√na·√nb) — the higher-order-function
  * chain (`aggregate(zip_with(...))` + two `aggregate(transform(...))`)
  * walks the arrays three times through INTERPRETED lambda dispatch
  * (HigherOrderFunctions are CodegenFallback) and breaks the surrounding
  * whole-stage-codegen span; this stays inside it and reads each element
  * once. Accumulation order (left-to-right per accumulator, division by
  * the product of the two square roots) is bit-identical to the HOF
  * chain, asserted in spec. Vectors of unequal length — and vectors
  * carrying null elements — yield NULL, exactly as the HOF chain does
  * (`zip_with` pads the shorter array with null and the null propagates
  * through `aggregate`), so the fused expression is a strict drop-in
  * beyond the fixed-width corpus. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def arrayOfDouble(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, _) => true
    case org.apache.spark.sql.types.NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOfDouble(left.dataType) && arrayOfDouble(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosRes")
      s"""
      java.lang.Double $tmp = graft.plans.CosineSim.cos($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Static so generated code can call it without capturing the tree.
    * Returns null (→ SQL NULL) for unequal lengths or null elements —
    * the same rows the HOF chain nulls out. */
  def cos(a: org.apache.spark.sql.catalyst.util.ArrayData,
          b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (Math.sqrt(na) * Math.sqrt(nb)))
  }
}

/** Exact integer squared-L2 distance between two array<long> vectors —
  * the fused single-pass codegen expression behind the embedding
  * cluster/outlier queries (q_lof, q_knn_acc, q_dunn). Replaces the
  * interpreted `aggregate(zip_with(...))` HOF chain (CodegenFallback —
  * observed as the single-thread hot loop on the 25M-pair scoring pass)
  * with a whole-stage-codegen long loop; arithmetic is exact, so the
  * result is bit-identical to the HOF form. NULL on length mismatch or
  * null elements, like [[CosineSim]]. */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist_long"

  private def arrayOfLong(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, _) => true
    case org.apache.spark.sql.types.NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOfLong(left.dataType) && arrayOfLong(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqDistLong.d2(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("sqdRes")
      s"""
      java.lang.Long $tmp = graft.plans.SqDistLong.d2($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  /** Static so generated code can call it without capturing the tree. */
  def d2(a: org.apache.spark.sql.catalyst.util.ArrayData,
         b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

object SimHash60 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it without capturing the tree. */
  def hash(s: UTF8String): Long = {
    val text = s.toString
    val md = mdLocal.get()
    val votes = new Array[Int](60)
    val n = text.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        md.reset()
        val d = md.digest(text.substring(start, i).getBytes("UTF-8"))
        // first 15 hex chars = bytes 0..6 + the high nibble of byte 7
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Jaro-Winkler similarity as a codegen'd binary expression (F19 family —
  * the blocking-cascade's cheap pre-score; `entity_resolver.py:84-118`'s
  * fuzzy stage uses ratio-style scores, and Jaro-Winkler is the standard
  * short-name variant). Semantics are pinned to DuckDB 1.0's
  * `jaro_winkler_similarity` (itself RapidFuzz-derived), fuzz-verified
  * bit-exact over 20k random cases: both-empty or either-empty → 0.0;
  * match window = max(len)/2 − 1 (floored at 0); transpositions = half the
  * out-of-order matches; Winkler boost only when jaro > 0.7, prefix capped
  * at 4, scale 0.1. The IEEE evaluation order below — `((m/la + m/lb) +
  * (m−t)/m) / 3`, then `s + ((p·0.1)·(1−s))` — reproduces DuckDB's doubles
  * bit-for-bit, so the oracle compares raw doubles with no rounding
  * witness. ASCII/BMP inputs only (operates on UTF-16 code units; the
  * corpus columns it serves are ASCII). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExtensions.stringOrNull(left.dataType) &&
        GraftExtensions.stringOrNull(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinkler.sim($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static so generated code can call it without capturing the tree. */
  def sim(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // Evaluation order matters for oracle bit-parity: two left-assoc adds,
    // then one divide; boost as s + ((p*0.1)*(1-s)).
    var s = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3
    if (s > 0.7) {
      var p = 0
      val lim = math.min(math.min(la, lb), 4)
      while (p < lim && a.charAt(p) == b.charAt(p)) p += 1
      s = s + ((p * 0.1) * (1 - s))
    }
    s
  }
}

object FuzzyRatio {
  /** thefuzz.fuzz.ratio semantics: 100·(|a|+|b|−D₂)/(|a|+|b|), D₂ =
    * edit distance with substitutions costing 2. */
  def ratio(a: String, b: String): Int = {
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
    // rint = round-half-to-even, matching thefuzz's int(round(x))
    // (Python 3 banker's rounding): scores landing exactly on .5 with an
    // even floor round DOWN — math.round (half-up) diverged from the
    // reference there (e.g. 12.5 → 13 instead of thefuzz's 12).
    math.rint(100.0 * (n + m - prev(m)) / (n + m)).toInt
  }
}
