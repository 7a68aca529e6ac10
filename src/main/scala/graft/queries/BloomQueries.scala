package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BloomSketch

/** Bloom-filter join pruning exposed through the oracle gate.
  *
  * `bloom_prune`: customers having an urgent-priority order, computed as
  * bloom-prefilter → exact semi-join. The bloom pass is MAP-ONLY on the
  * probe side, so at 100 TB the semi-join's shuffle carries only the
  * ~ε·|probe| candidate rows instead of the full table; the exact join
  * then removes the false positives, making the composition
  * value-identical to the plain semi-join — which is exactly what the
  * DuckDB oracle runs, so the gate verifies the no-false-negative
  * invariant end to end (a broken bloom drops rows and hash-fails).
  */
object BloomQueries {

  private def bloomPrune(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    // build: m auto-sized to the build-side key count (a fixed m would
    // saturate at 100× scale and prune nothing), then one mergeable
    // aggregation, collected bounded (m/8 bytes — IVF-centroid pattern)
    val (words, mBits) = BloomSketch.buildFilterSized(urgent, col("o_custkey"))
    // probe: codegen'd map-only prefilter, then the exact semi-join
    val pruned = Tables.customer(s, d)
      .filter(BloomSketch.mightContain(col("c_custkey"), words, mBits))
    pruned
      .join(urgent, pruned("c_custkey") === urgent("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        min(col("c_custkey")).as("min_cust"),
        max(col("c_custkey")).as("max_cust"))
  }

  // The oracle is the PLAIN semi-join: the bloom is invisible to
  // values by construction (prune-only); MIN/MAX don't widen to
  // HUGEINT (only SUM does), so no casts needed.
  private val bloomPruneSql =
    """SELECT c_mktsegment, COUNT(*) AS n_custs,
      |  MIN(c_custkey) AS min_cust, MAX(c_custkey) AS max_cust
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("bloom_prune", bloomPrune, Some(bloomPruneSql)))
}
