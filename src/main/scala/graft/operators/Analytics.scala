package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — the reporting
  * layer a recommender pipeline feeds (funnel conversion, cohort
  * retention, outlier detection). All pure Spark SQL, DuckDB-oracled.
  *
  * Scale design: every query here aggregates `events` by user_id or by
  * a low-cardinality key. The funnel repartitions on user_id ONCE and
  * reuses that partitioning across its three stage aggregates (the
  * Tables.interactions idiom); the cohort and anomaly queries are one
  * scan + one narrow shuffle each. Nothing in this file joins two fact
  * tables — per-user state stays K rows per user, so a 1000-executor
  * run shuffles each event exactly once.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  /** Ordered conversion funnel view → click → purchase: a user converts
    * to a stage only via an event STRICTLY AFTER their entry into the
    * previous stage (first view, then first click after that view, then
    * first purchase after that click) — the standard ordered-funnel
    * semantics, not mere set intersection. Single-row summary with
    * stage populations and step conversion rates.
    *
    * Plan shape: one repartition(user_id), then three groupBy(user_id)
    * aggregates that all reuse it; the stage tables are |users| rows and
    * co-partitioned, so the stage joins add no exchange.
    */
  def sessionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .repartition(col("user_id"))
    val tv = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = ev.where(col("event_type") === "click")
      .join(tv, "user_id").where(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val tp = ev.where(col("event_type") === "purchase")
      .join(tc, "user_id").where(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    val nv = tv.agg(count(lit(1)).as("n_viewers"))
    val nc = tc.agg(count(lit(1)).as("n_clickers"))
    val np = tp.agg(count(lit(1)).as("n_purchasers"))
    nv.crossJoin(nc).crossJoin(np)
      .withColumn("view_to_click", round(col("n_clickers") / col("n_viewers"), 6))
      .withColumn("click_to_purchase", round(col("n_purchasers") / col("n_clickers"), 6))
      .withColumn("overall", round(col("n_purchasers") / col("n_viewers"), 6))
  }

  val sessionFunnelSql: String =
    """WITH tv AS (
      |  SELECT user_id, min(ts::TIMESTAMP) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), tc AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS tc
      |  FROM events e JOIN tv ON e.user_id = tv.user_id
      |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > tv.tv
      |  GROUP BY e.user_id
      |), tp AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS tp
      |  FROM events e JOIN tc ON e.user_id = tc.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > tc.tc
      |  GROUP BY e.user_id
      |)
      |SELECT
      |  (SELECT count(*) FROM tv) AS n_viewers,
      |  (SELECT count(*) FROM tc) AS n_clickers,
      |  (SELECT count(*) FROM tp) AS n_purchasers,
      |  round((SELECT count(*) FROM tc) / (SELECT count(*)::DOUBLE FROM tv), 6) AS view_to_click,
      |  round((SELECT count(*) FROM tp) / (SELECT count(*)::DOUBLE FROM tc), 6) AS click_to_purchase,
      |  round((SELECT count(*) FROM tp) / (SELECT count(*)::DOUBLE FROM tv), 6) AS overall""".stripMargin

  /** Weekly cohort retention: cohort = Monday-truncated week of a
    * user's FIRST event; for each (cohort, week offset) the distinct
    * users active that week and the retention fraction of the cohort.
    * The classic triangular retention matrix, as rows.
    *
    * Scale shape: first-event extraction and the activity rollup are
    * both user-keyed aggregates over one scan; the cohort-size join is
    * a broadcast (|cohorts| rows ≪ |users|). Week arithmetic is exact
    * integer day math on Monday-aligned dates — no float, no timezone
    * ambiguity (UTC pinned session-wide).
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val firstWk = ev.groupBy("user_id").agg(min("wk").as("cohort"))
    val active = ev.distinct()
      .join(firstWk, "user_id")
      .withColumn("week_offset", (datediff(col("wk"), col("cohort")) / 7).cast("int"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
    val sizes = firstWk.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    active.join(broadcast(sizes), "cohort")
      .withColumn("retention", round(col("n_users") / col("cohort_size"), 6))
      .select("cohort", "week_offset", "n_users", "cohort_size", "retention")
      .orderBy("cohort", "week_offset")
  }

  val retentionCohortsSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('week', ts::TIMESTAMP)::DATE AS wk FROM events
      |), first_wk AS (
      |  SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort, count(*) AS cohort_size FROM first_wk GROUP BY cohort
      |), active AS (
      |  SELECT f.cohort,
      |    (datediff('day', f.cohort, e.wk) / 7)::INT AS week_offset,
      |    count(DISTINCT e.user_id) AS n_users
      |  FROM (SELECT DISTINCT user_id, wk FROM ev) e
      |  JOIN first_wk f ON f.user_id = e.user_id
      |  GROUP BY 1, 2
      |)
      |SELECT a.cohort, a.week_offset, a.n_users, s.cohort_size,
      |  round(a.n_users / s.cohort_size::DOUBLE, 6) AS retention
      |FROM active a JOIN sizes s ON s.cohort = a.cohort
      |ORDER BY a.cohort, a.week_offset""".stripMargin

  /** Z-score threshold for the outlier gate. */
  val ZThreshold = 3.0

  /** Per-event-type outlier detection: events whose value deviates more
    * than [[ZThreshold]] population standard deviations from the type
    * mean. Two passes over one scan: per-type moments, then the
    * threshold count with the moments BROADCAST back (the type table is
    * a handful of rows at any scale). Mean and σ are ROUNDED to 6 dp
    * before the comparison, so the gate is engine-stable — the same
    * rounded-parameter trick as the correlated-subquery query; null /
    * NaN values are excluded from both the moments and the gate.
    */
  def anomalyEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .where(col("value").isNotNull && !isnan(col("value")))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           round(avg("value"), 6).as("mean_v"),
           round(stddev_pop(col("value")), 6).as("sd_v"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("is_out",
        (abs(col("value") - col("mean_v")) > lit(ZThreshold) * col("sd_v")).cast("long"))
      .groupBy("event_type")
      .agg(first(col("n_events")).as("n_events"),
           first(col("mean_v")).as("mean_v"),
           first(col("sd_v")).as("sd_v"),
           sum(col("is_out")).as("n_outliers"),
           round(max(abs(col("value") - col("mean_v")) / col("sd_v")), 4).as("max_abs_z"))
      .orderBy("event_type")
  }

  val anomalyEventsSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events
       |  WHERE value IS NOT NULL AND NOT isnan(value)
       |), stats AS (
       |  SELECT event_type, count(*) AS n_events,
       |    round(avg(value), 6) AS mean_v,
       |    round(stddev_pop(value), 6) AS sd_v
       |  FROM ev GROUP BY event_type
       |)
       |SELECT e.event_type, s.n_events, s.mean_v, s.sd_v,
       |  sum(CASE WHEN abs(e.value - s.mean_v) > $ZThreshold * s.sd_v
       |           THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       |  round(max(abs(e.value - s.mean_v) / s.sd_v), 4) AS max_abs_z
       |FROM ev e JOIN stats s ON s.event_type = e.event_type
       |GROUP BY e.event_type, s.n_events, s.mean_v, s.sd_v
       |ORDER BY e.event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_session_funnel"    -> (sessionFunnel _),
    "q_retention_cohorts" -> (retentionCohorts _),
    "q_anomaly_events"    -> (anomalyEvents _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_session_funnel"    -> sessionFunnelSql,
    "q_retention_cohorts" -> retentionCohortsSql,
    "q_anomaly_events"    -> anomalyEventsSql,
  )
}
