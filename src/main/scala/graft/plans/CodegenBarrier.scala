package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Codegen barrier — a zero-cost pass-through operator whose only effect
  * is to END the whole-stage-codegen unit below it and START a new one
  * above it (SURVEY.md §4.2 ladder step (c); same extension machinery as
  * [[TopKPerKeyNode]]).
  *
  * Why it exists: Janino rejects any generated method over 64 KB of
  * bytecode, and Spark then RETRIES THE WHOLE STAGE INTERPRETED — a
  * silent many-× throughput cliff on exactly the expression-heavy plans
  * that need codegen most. Deeply nested higher-order functions
  * (transform / filter / aggregate lambdas, as in the S14 HTML parse
  * pipeline) generate monolithic code blocks that Spark's
  * `splitExpressions` cannot break apart, so a long chain of staged
  * projections — each individually fine — fuses into one un-compilable
  * unit. Placing a barrier at a stage boundary yields two codegen units
  * that each compile, keeping the whole pipeline in generated code.
  *
  * Cost model: none. The physical node forwards the child's RDD
  * untouched (`child.execute()` — no shuffle, no row copy, no encoder
  * round-trip; projections emit fresh UnsafeRows, so buffer reuse across
  * the boundary is safe for streaming consumers). Partitioning and
  * ordering propagate, so downstream EnsureRequirements plans exactly
  * the exchanges it would have planned anyway. Contrast the blunt
  * alternatives: `localCheckpoint` materializes every row, and
  * `mapPartitions(identity)` pays a full serializer round-trip.
  *
  * The logical node is deliberately OPAQUE to the optimizer: CollapseProject
  * only merges adjacent Projects, so the staging this barrier protects
  * survives optimization; pushdown rules treat an unknown unary node as
  * a fence. Use it ONLY at hand-chosen stage boundaries where fusion is
  * known to blow the method limit — everywhere else, wider codegen spans
  * win (brief: "WholeStageCodegen spans — widen them").
  */
case class CodegenBarrierNode(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): CodegenBarrierNode =
    copy(child = newChild)
}

object CodegenBarrierStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CodegenBarrierNode(child) => CodegenBarrierExec(planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Does NOT extend CodegenSupport — that absence is the entire
  * mechanism: CollapseCodegenStages closes the lower codegen unit at
  * this node and opens a new one above it (via InputAdapter), exactly
  * as it does at exchange boundaries. */
case class CodegenBarrierExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def nodeName: String = "GraftCodegenBarrier"
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(newChild: SparkPlan): CodegenBarrierExec =
    copy(child = newChild)
}

object CodegenBarrier {
  /** Split whole-stage codegen at this point of the plan. Semantics,
    * partitioning, and ordering are unchanged. */
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    Shims.ofRows(df.sparkSession, CodegenBarrierNode(df.queryExecution.analyzed))
  }
}
