package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY §2.10 ladder rung (c):
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions` — see [[graft.functions.GraftExtensions]]).
  *
  * Why not `row_number().over(partitionBy(keys).orderBy(ord)) <= k`?
  * The window form shuffles every row, fully SORTS each key's rows
  * (O(n log n) per key, spill-prone), then discards all but k. This
  * operator keeps a bounded k-heap per key per partition: O(n log k)
  * compares, memory O(keys·k) instead of O(n), no sort spill. Same
  * result set (top-k rows per key under the ordering; no rank column).
  *
  * At cluster scale the exec declares `ClusteredDistribution(keys)`, so
  * EnsureRequirements plans exactly one hash shuffle — identical
  * exchange shape to the window form, cheaper per-partition work. A
  * further refinement (map-side partial top-k before the exchange, the
  * TakeOrderedAndProject trick generalized per key) is a natural
  * round-2 `Rule`.
  */
case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
                          order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** `partial = true` is the map-side combine: it runs on the child's
  * existing partitioning (no distribution requirement) and keeps each
  * partition's per-key top-k — a superset of every key's global top-k —
  * so the exchange ships ≤ partitions·keys·k rows instead of n. The
  * final (partial = false) instance declares ClusteredDistribution and
  * produces the exact result. Mirrors partial/final aggregation. */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                          order: Seq[SortOrder], child: SparkPlan,
                          partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under `ordering` so the WORST retained row is at the
      // head and evicts first
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            kLocal + 1, ordering.reverse)
          heaps.put(key, heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      // partial below the (EnsureRequirements-inserted) exchange, exact
      // final above it — the partial/final aggregation shape
      TopKPerKeyExec(k, keys, order,
        TopKPerKeyExec(k, keys, order, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}
