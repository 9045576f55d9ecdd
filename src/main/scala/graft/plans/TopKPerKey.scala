package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §4.2 ladder step (c)): top-k rows
  * per key as a custom LogicalPlan + SparkStrategy + physical operator,
  * registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * Why an operator instead of `row_number().over(partitionBy(key))`: the
  * window form shuffles EVERY row to its key's reducer and only then
  * discards all but k — at 100 TB with k=5 that is ~100 TB of shuffle
  * for a few GB of output. This operator plans as
  *
  *   partial TopKPerKey (per input partition, bounded heaps)
  *     → hash exchange on the keys (inserted by EnsureRequirements from
  *       the final node's required distribution)
  *   final TopKPerKey (exact per-key top-k merge)
  *
  * so at most `partitions · keys · k` rows reach the exchange — the same
  * partial-aggregation trick Spark applies to `limit` (TakeOrdered) and
  * hash aggregates, which it does NOT apply to ranking windows.
  *
  * Memory contract: per task, one k-row heap per distinct key seen in the
  * partition (like a hash aggregate's map; no spill path — a production
  * hardening would fall back to sort-based per-key limiting on pressure).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k per key needs k > 0 (got $k)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the logical node as partial-then-final physical pair; the
  * exchange between them comes from `requiredChildDistribution`. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // heap keeps the k FIRST rows in sort order; worst-kept on top
      val worstFirst: java.util.Comparator[InternalRow] = ord.reverse
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

object TopKPerKey {
  /** DataFrame API over the custom node: top-k rows per key by `order`
    * (ascending unless the Column carries .desc). `order` must totally
    * order rows within a key for deterministic results. */
  def apply(df: DataFrame, k: Int, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    val sortOrders = order.map(c => Shims.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Shims.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(Shims.expression), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
