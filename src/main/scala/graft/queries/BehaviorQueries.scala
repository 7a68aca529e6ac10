package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 user-behavior analytics over the `events` stream table —
  * the warehouse-classic operator family a product analytics surface
  * runs daily: SCD2 interval construction, ordered funnel conversion,
  * and cohort retention. Each is a composition of keyed windows /
  * aggregations with no self-joins on the event stream, so every shape
  * scales as one (or zero) extra exchange over the user partitioning.
  */
object BehaviorQueries {

  // -------------------------------------------------------- scd2_intervals
  // Slowly-changing-dimension type-2 interval construction: per user,
  // compress the ordered event_type stream into change-point rows with
  // (valid_from, valid_to) validity intervals — valid_to = next change's
  // start, NULL while current. The standard CDC-to-warehouse transform.
  // Shape: ONE user-keyed sort exchange; the change-point filter (lag)
  // and interval close (lead) are two window passes over the same
  // ordering, the second on the already-filtered change rows. Ordering
  // is (ts, event_id) — event_id is unique, so the sort (and therefore
  // the intervals) is total and engine-identical.
  private def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  private val scd2IntervalsSql =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |changes AS (
      |  SELECT user_id, ts, event_id, event_type FROM ordered
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id
      |                 ORDER BY ts, event_id) AS valid_to
      |FROM changes""".stripMargin

  // ------------------------------------------------------ funnel_conversion
  // Ordered funnel: view → click → purchase, each stage strictly AFTER
  // the user's earliest completion of the previous stage (the
  // product-analytics conversion query). Stage anchors are per-user MIN
  // aggregations chained by a user-key join — never a self-join of the
  // raw stream against itself, so each stage is one keyed agg + one
  // join that reuses the user partitioning; the final report is three
  // single-row counts crossed together (broadcast scalars).
  private def funnelConversion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  private val funnelConversionSql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |  GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_view_click,
      |  (SELECT COUNT(*) FROM p) AS n_full_funnel""".stripMargin

  // ------------------------------------------------------- cohort_retention
  // Cohort retention matrix: users grouped by first-seen day, reported
  // as distinct active users per (cohort_day, day_offset). THE
  // engagement report. Shape: ONE explicit user-keyed exchange that the
  // (user, day) distinct AND the first-seen window both reuse (hashing
  // by user co-locates every (user, day) duplicate — the substr_dup
  // discipline), so first-seen needs no join; only the final tiny
  // (cohort, offset) rollup re-partitions. At 100 TB nothing wider
  // than the user key ever shuffles.
  private def cohortRetention(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("active_day"))
      .repartition(col("user_id"))
      .distinct()
      .withColumn("cohort_day",
        min(col("active_day")).over(Window.partitionBy(col("user_id"))))
      .withColumn("day_offset",
        datediff(col("active_day"), col("cohort_day")).cast("long"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  private val cohortRetentionSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events),
      |fs AS (
      |  SELECT user_id, MIN(active_day) AS cohort_day FROM act GROUP BY 1)
      |SELECT fs.cohort_day,
      |  CAST(date_diff('day', fs.cohort_day, a.active_day) AS BIGINT)
      |    AS day_offset,
      |  COUNT(*) AS n_users
      |FROM act a JOIN fs ON a.user_id = fs.user_id
      |GROUP BY 1, 2""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("scd2_intervals", scd2Intervals, Some(scd2IntervalsSql)),
    QueryDef("funnel_conversion", funnelConversion, Some(funnelConversionSql)),
    QueryDef("cohort_retention", cohortRetention, Some(cohortRetentionSql)))
}
