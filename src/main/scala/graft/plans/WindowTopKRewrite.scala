package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule completing the SURVEY §2.10 ladder: the declarative
  * per-key top-k idiom
  *
  *   df.withColumn("rk", row_number().over(partitionBy(K).orderBy(O)))
  *     .filter($"rk" <= k)
  *     .select(<columns not including rk>)
  *
  * is rewritten to [[TopKPerKeyNode]], whose physical operator keeps
  * bounded k-heaps with a map-side partial pass — O(n log k) compares
  * and O(keys·k) memory instead of the window's full per-key sort, and
  * the exchange ships ≤ partitions·keys·k rows instead of n. Users (and
  * generated SQL) write the idiomatic window form; the engine plans the
  * heap operator.
  *
  * Fires only when the rewrite is airtight:
  *   - the Window computes exactly ONE expression, a `row_number()`
  *     (rank/dense_rank admit >k survivors on ties — different result);
  *   - the partition spec is non-empty (global top-k is
  *     TakeOrderedAndProject's job) and an ordering exists;
  *   - the filter bounds that rank from above by a positive literal
  *     (`<= k`, `< k+1`, `= 1`);
  *   - the projection above drops the rank column and references only
  *     the window's input — so the rank values are unobservable and
  *     only the selected row SET matters.
  * Tie behavior: row_number breaks order-ties by partition arrival
  * (non-deterministic across runs); the heap retains an equally
  * arbitrary choice. Under a total ordering — every oracle-gated query
  * here tie-breaks on a key — the rewrite is exact row-for-row.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** The rank bound k, if `cond` is an upper bound on `rank`. */
  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
        if k == 1 && a.semanticEquals(rank) => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond,
          Window(Seq(a @ Alias(WindowExpression(RowNumber(), _), _)),
            parts, order, child, _)))
        if parts.nonEmpty && order.nonEmpty &&
          limitFrom(cond, a.toAttribute).exists(_ >= 1) &&
          projectList.forall(ne => !ne.references.contains(a.toAttribute)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projectList,
        TopKPerKeyNode(limitFrom(cond, a.toAttribute).get, parts, order, child))
  }
}
