package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join (SURVEY §7.5 scale toolkit).
  *
  * Spark plans a plain `pt BETWEEN start AND end` join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons.
  * This composition bucketizes time instead: points map to one bucket,
  * intervals explode to the buckets they cover, and a hash equi-join on
  * (key, bucket) + an exact residual filter replaces the nested loop.
  * Cost: one shuffle of |P| + |I|·(span/width) rows; pick `widthSec`
  * near the typical interval span so the expansion factor stays ~2.
  */
object RangeJoin {

  /** Inner join: each `points` row against every `intervals` row of the
    * same `keyCol` whose [startCol, endCol] contains ptCol (inclusive).
    * Timestamp columns throughout. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, ptCol: String,
                      startCol: String, endCol: String,
                      widthSec: Long = 3600L): DataFrame = {
    val p = points.withColumn("__bk",
      expr(s"unix_seconds($ptCol) DIV $widthSec"))
    val i = intervals.withColumn("__bk",
      explode(expr(
        s"sequence(unix_seconds($startCol) DIV $widthSec, unix_seconds($endCol) DIV $widthSec)")))
    p.join(i, Seq(keyCol, "__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bk")
  }
}
