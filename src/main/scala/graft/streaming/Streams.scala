package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-shaped operators over `events` (SURVEY.md §2.11 T1–T5).
  *
  * Each transform is declared ONCE over a plain DataFrame and used by
  * two runners:
  *   - the batch queries below (driver-verifiable against DuckDB);
  *   - Structured Streaming twins in StreamingSpec, which feed the same
  *     transform from a MemoryStream with a watermark and assert the
  *     final state equals the batch result on identical input.
  * That single-plan/two-runners split is exactly how Structured
  * Streaming is meant to be deployed at scale: the batch plan IS the
  * backfill job, the stream the incremental one, and neither can drift
  * because there is one transform definition.
  *
  * Scale notes: tumbling/sliding aggregation is per-(window,key) state
  * with watermark-bounded retention; session windows keep one open
  * session per user; dedup state is bounded by the watermark horizon.
  * All shuffles key on (window/user) — the same partitioning a
  * 1000-executor stream would use.
  */
object Streams {

  type Q = (SparkSession, String) => DataFrame

  /** T1 tumbling 1-hour window aggregate per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("event_type"), col("n_events"), col("sum_value"))

  def tumblingQuery(spark: SparkSession, sfDir: String): DataFrame =
    tumblingCounts(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type")

  val tumblingSql: String =
    """SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** T1b tumbling distinct users: per 6-hour window, the distinct
    * active users and their event volume — the windowed-cardinality
    * report a live dashboard serves. Batch uses exact countDistinct;
    * the STREAMING twin of this shape must switch to
    * approx_count_distinct (exact distinct aggregation is unsupported
    * on streams — the scaladoc'd trade every streaming pipeline makes),
    * so only the batch form carries an oracle.
    */
  def tumblingUsers(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("n_users"), col("n_events"))

  def tumblingUsersQuery(spark: SparkSession, sfDir: String): DataFrame =
    tumblingUsers(Tables.events(spark, sfDir))
      .orderBy("window_start")

  val tumblingUsersSql: String =
    """SELECT strftime(time_bucket(INTERVAL '6 hours', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events
      |GROUP BY 1
      |ORDER BY window_start""".stripMargin

  /** T2 sliding window: 1-hour windows advancing every 15 minutes —
    * every event lands in 4 overlapping windows.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 4).as("sum_value")) // no countDistinct: unsupported on streams
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("n_events"), col("sum_value"))

  def slidingQuery(spark: SparkSession, sfDir: String): DataFrame =
    slidingCounts(Tables.events(spark, sfDir))
      .orderBy("window_start")

  /** The DuckDB twin assigns each event to its 4 overlapping windows by
    * generating slide offsets 0..3 back from the event's 15-min bucket.
    */
  val slidingSql: String =
    """WITH assigned AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP) - (k * INTERVAL '15 minutes') AS w_start,
      |    value
      |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
      |)
      |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM assigned
      |GROUP BY 1
      |ORDER BY window_start""".stripMargin

  /** T3 session windows (30-minute gap) per user. In batch this is
    * `session_window`; the oracle reproduces it with the cumulative
    * gap-boundary idiom. Boundary semantics (verified empirically in
    * StreamingSpec): session_window MERGES an event at exactly
    * last_event + gap, so a new session opens iff gap > 30 min.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"),
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
              col("n_events"), col("sum_value"))

  def sessionQuery(spark: SparkSession, sfDir: String): DataFrame =
    sessionWindows(Tables.events(spark, sfDir))
      .orderBy("user_id", "session_start")

  val sessionSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value, event_id,
      |    CASE WHEN epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP, 1) OVER w) > 1800000000
      |         OR lag(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), s AS (
      |  SELECT user_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g
      |)
      |SELECT user_id,
      |  strftime(min(ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** T5 deduplication: first event per (user_id, event_type) by
    * (ts, event_id). Deterministic batch form via row_number; the
    * streaming twin is `dropDuplicates` under a watermark (state
    * bounded by the watermark horizon).
    */
  def firstEventPerType(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"))
  }

  def dedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    firstEventPerType(Tables.events(spark, sfDir))
      .orderBy("user_id", "event_type")

  val dedupSql: String =
    """SELECT user_id, event_type, event_id AS first_event_id,
      |  strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS first_ts
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events
      |)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> (tumblingQuery _),
    "q_stream_users"    -> (tumblingUsersQuery _),
    "q_stream_sliding"  -> (slidingQuery _),
    "q_stream_sessions" -> (sessionQuery _),
    "q_stream_dedup"    -> (dedupQuery _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" -> tumblingSql,
    "q_stream_users"    -> tumblingUsersSql,
    "q_stream_sliding"  -> slidingSql,
    "q_stream_sessions" -> sessionSql,
    "q_stream_dedup"    -> dedupSql,
  )
}
