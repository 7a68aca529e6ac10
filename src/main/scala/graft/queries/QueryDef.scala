package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exposure: a Spark query over the shared test
  * tables plus (where SQL-expressible) a DuckDB oracle computing the
  * identical result on the same parquet files.
  *
  * Exact-match discipline (the driver hash-compares values):
  *  - double SUMs/AVGs accumulate via exact DECIMAL and cast back to
  *    double — bit-identical in both engines regardless of row order;
  *  - percentiles use the reference's own discrete floor-index definition
  *    (`/root/reference/mqtt_publish.js:84-96`), no interpolation;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - all orderings made total with a key tiebreak before LIMIT.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact sum of a double expression: accumulate as DECIMAL(38, scale),
    * return double. Addition of decimals is associative → identical
    * result in Spark and DuckDB independent of partitioning/order. */
  def decSumSql(sqlExpr: String, scale: Int = 10): String =
    s"CAST(SUM(CAST(($sqlExpr) AS DECIMAL(38,$scale))) AS DOUBLE)"
}
