package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.graftshim.ColumnBridge

/** User-facing entry for the custom per-key top-k operator. */
object TopK {

  /** Top-k rows per key group under the given total order.
    * `orderBy` = (columnName, ascending) pairs — make the order TOTAL
    * (add a key tiebreak) or the retained set is tie-ambiguous.
    * Requires [[TopKPerKeyStrategy]] in the session (installed by
    * `GraftExtensions`). */
  def perKey(df: DataFrame, keys: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan  = df.queryExecution.analyzed
    val attrs = plan.output
    def attr(n: String) = attrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${attrs.map(_.name).mkString(",")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending,
        if (asc) NullsFirst else NullsLast, Seq.empty)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(k, keys.map(attr), order, plan))
  }
}
