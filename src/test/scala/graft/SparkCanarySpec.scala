package graft

import org.apache.spark.sql.functions._

/** Spark-version canaries (r13 verdict, next #2): each gate or custom
  * operator below rests on a Spark behavior that is NOT part of the
  * public API contract and was verified once against the 4.1.2
  * bytecode. A Spark upgrade could invalidate any of them silently —
  * the board would stay green while a gate went blind or an operator's
  * correctness premise flipped — so each assumption is pinned here as a
  * direct runtime assertion. A failing case names the assumption that
  * moved, BEFORE the failure surfaces as a confusing 100×-sweep or
  * correctness regression.
  *
  * What each case would catch on a Spark upgrade:
  *  - "UnsafeWriter does not canonicalize": UnsafeRow writers starting
  *    to normalize NaN payloads/-0.0 (tried and reverted upstream once,
  *    SPARK-26021-era) — TopKPerKey's normalizeFloats shim would become
  *    redundant; conversely NormalizeFloatingNumbers ceasing to
  *    canonicalize would make raw-byte grouping WRONG. Both directions
  *    asserted.
  *  - "WindowGroupLimitExec is emitted": the rank-filter planner rule
  *    being renamed/replaced — PlanGateSpec's unpartitioned-window
  *    detector matches that node by type, so a rename would blind the
  *    gate for group-limit plans while everything still compiled.
  *  - "CodegenBarrier splits units": CollapseCodegenStages no longer
  *    closing a codegen unit at a non-CodegenSupport node — the S14
  *    barrier would silently become a no-op and the staged projections
  *    would re-fuse (perf cliff, and under fallback=false a potential
  *    compile error).
  *  - codegen.fallback=false throwing on an over-64KB unit is the
  *    negative control living in CodegenStrictSpec ("negative control:
  *    strict mode throws on an oversized codegen unit") — referenced
  *    here, not duplicated: it proves the board-wide strict gate still
  *    has teeth.
  */
class SparkCanarySpec extends SparkSpec {

  test("UnsafeWriter does not canonicalize NaN bit patterns (TopKPerKey " +
      "grouping premise) and NormalizeFloatingNumbers does") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.types.DoubleType
    val canonical = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val payload = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    assert(canonical.isNaN && payload.isNaN)
    // Direction 1: the raw writer PRESERVES distinct NaN encodings —
    // this is why grouping by raw UnsafeRow bytes needs normalization.
    val raw = UnsafeProjection.create(
      Seq(BoundReference(0, DoubleType, nullable = false)))
    val bitsCanonical = java.lang.Double.doubleToRawLongBits(
      raw(InternalRow(canonical)).copy().getDouble(0))
    val bitsPayload = java.lang.Double.doubleToRawLongBits(
      raw(InternalRow(payload)).copy().getDouble(0))
    assert(bitsCanonical != bitsPayload,
      "UnsafeWriter now canonicalizes NaN bit patterns — the " +
        "normalizeFloats shim in TopKPerKeyStrategy is redundant on this " +
        "Spark; re-verify and update this canary")
    // Direction 2: the shim TopKPerKey applies maps both encodings (and
    // -0.0) to identical bytes — if this stops holding, raw-byte
    // grouping splits one logical key group and TopKPerKey emits up to
    // k rows per fragment.
    val normalized = UnsafeProjection.create(
      Seq(org.apache.spark.sql.graft.Shims.normalizeFloats(
        BoundReference(0, DoubleType, nullable = false))))
    def normBits(d: Double): Long = java.lang.Double.doubleToRawLongBits(
      normalized(InternalRow(d)).copy().getDouble(0))
    assert(normBits(canonical) == normBits(payload),
      "NormalizeFloatingNumbers no longer canonicalizes NaN payloads — " +
        "TopKPerKey's grouping premise is broken on this Spark")
    assert(normBits(0.0) == normBits(-0.0),
      "NormalizeFloatingNumbers no longer canonicalizes -0.0")
  }

  test("the planner still emits WindowGroupLimitExec with a readable " +
      "partitionSpec (window-gate detection surface)") {
    // PlanGateSpec's detector pattern-matches WindowGroupLimitExec and
    // reads partitionSpec off it. Prove the planner still produces that
    // node for the rank-filter shape, partitioned AND unpartitioned —
    // a rename/replacement upgrade makes this fail loudly instead of
    // silently blinding the board gate.
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    import org.apache.spark.sql.expressions.Window
    val iso = graft.tools.ExplainAudit.staticSession(spark)
    val df = iso.range(100).select(col("id").as("v"),
      (col("id") % 5).as("p"))
    def groupLimits(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.executedPlan.collect {
        case w: WindowGroupLimitExec => w.partitionSpec
      }
    val partitioned = df
      .select(col("v"), col("p"),
        rank().over(Window.partitionBy("p").orderBy("v")).as("r"))
      .filter(col("r") <= 2)
    val partSpecs = groupLimits(partitioned)
    assert(partSpecs.nonEmpty,
      "rank-filter no longer plans WindowGroupLimitExec — the window " +
        "gate's detection surface moved on this Spark")
    assert(partSpecs.forall(_.nonEmpty))
    val global = df
      .select(col("v"), rank().over(Window.orderBy("v")).as("r"))
      .filter(col("r") <= 2)
    val globalSpecs = groupLimits(global)
    assert(globalSpecs.nonEmpty && globalSpecs.forall(_.isEmpty),
      "unpartitioned group-limit shape no longer visible as an empty " +
        "partitionSpec — the gate's emptiness test is blind on this Spark")
  }

  test("CodegenBarrier still splits whole-stage codegen units") {
    // The barrier's whole mechanism is CollapseCodegenStages closing a
    // unit at a node that is not CodegenSupport. Synthetic check: two
    // stacked projections fuse into ONE WholeStageCodegen unit without
    // a barrier and TWO with it; then the production user (S14
    // q_career_stats, whose 21-regex projection ladder keeps barriers
    // for a measured 2x win) must still carry >=2 units and its
    // barrier nodes in the executed plan.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val iso = graft.tools.ExplainAudit.staticSession(spark)
    def units(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec => w }.size
    val base = iso.range(10).select((col("id") + 1).as("a"))
    val fusedUnits = units(base.select((col("a") * 2).as("b")))
    val splitQuery = graft.plans.CodegenBarrier(base)
      .select((col("a") * 2).as("b"))
    val splitUnits = units(splitQuery)
    assert(splitUnits == fusedUnits + 1,
      s"barrier no longer splits: $fusedUnits units fused vs $splitUnits " +
        "split — CollapseCodegenStages changed on this Spark")
    assert(splitQuery.queryExecution.executedPlan.toString
      .contains("GraftCodegenBarrier"))
    // production site: the plan actually served by the board
    val career = SparkEntry.queries("q_career_stats")(iso, TestSpark.Sf0001)
    val plan = career.queryExecution.executedPlan
    assert(plan.toString.contains("GraftCodegenBarrier"),
      "q_career_stats lost its codegen barriers")
    val careerUnits = plan.collect {
      case w: WholeStageCodegenExec => w }.size
    assert(careerUnits >= 2,
      s"q_career_stats fused back into $careerUnits codegen unit(s)")
  }
}
