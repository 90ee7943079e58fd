package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders.
  *
  * All engine queries read the driver-generated parquet tables under an
  * sf directory (TESTDATA.md). Loaders centralize two cross-cutting
  * concerns:
  *
  *  1. `events.ts` has been written two ways across fixture
  *     generations: parquet `TIMESTAMP(NANOS)` (which Spark's reader
  *     rejects natively — read via
  *     `spark.sql.legacy.parquet.nanosAsLong=true` as `long` nanos and
  *     truncated to µs, the same truncation DuckDB applies) and plain
  *     `timestamp[us]` (readable directly). [[normalizeTs]] branches on
  *     the type actually loaded so the engine is correct against either
  *     encoding; both converge to the identical µs `timestamp` column,
  *     so oracle comparisons line up exactly either way.
  *
  *  2. At 100 TB these reads would be partitioned tables, not single
  *     files; keeping every scan behind this one function means
  *     partition-pruning-friendly layouts (e.g. events partitioned by
  *     date) need a change in exactly one place.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a scan across the session's shuffle parallelism before
    * CPU-heavy per-row work (r13, guide §2.5 input skew): a file
    * smaller than one input split scans as ONE task, so everything up
    * to the first exchange — md5 window selection, per-byte signature
    * grids, all-pairs vector math — runs on a single core while the
    * rest idle (measured: 2.9 s single-task stages at local[32]).
    * Deterministic hash key; the partition count is pinned to the
    * session's shuffle parallelism (scale-adaptive: the same setting
    * that sizes every other exchange) so AQE cannot coalesce the tiny
    * bytes back into one task.
    *
    * r14 (verdict #1 — scale safety): the exchange is GATED on the
    * scan's actual parallelism. At 100 TB these reads arrive as many
    * splits already; an unconditional repartition would then (a) pay a
    * full shuffle of the projected columns — at the documents sites
    * that includes the text body, the heaviest column in the system —
    * and (b) REDUCE parallelism whenever the split count exceeds the
    * configured shuffle parallelism, concentrating text-heavy rows
    * into oversized partitions (guide §5 spill risk). The exchange now
    * exists only in the pathology it was built for: an input whose
    * split count is below half the session target (the sub-split-size
    * fixture files scan as ONE task). Reading the split count is a
    * driver-side file-listing computation, not a job.
    */
  private[graft] def spread(df: DataFrame, key: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= (n + 1) / 2) df
    else df.repartition(n, col(key))
  }

  def region(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Normalize a raw events frame's `ts` to a µs session-zone
    * `timestamp` whatever physical type the fixture was written with:
    * `long` (nanos under the nanosAsLong flag) is truncated `div 1000`;
    * `timestamp_ntz` (pandas-written µs without timezone) is cast to
    * `timestamp` — value-preserving because every graft session pins
    * `spark.sql.session.timeZone=UTC`, so the naive value is
    * interpreted exactly as DuckDB reads it; a native `timestamp`
    * passes through unchanged. Works on streaming frames too (pure
    * schema inspection + projection).
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  /** `events` with `ts` normalized to a µs `timestamp` (see scaladoc above).
    * The nanos-as-long flag is a runtime SQLConf; set defensively here so
    * callers outside Verify/Bench (tests, spark-shell) work too.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, sfDir, "events"))
  }

  /** User–item interactions derived from the star schema
    * (SURVEY.md §7.2): user = o_custkey, item = l_partkey,
    * strength = total quantity across all of the user's orders.
    *
    * Scale note: orders⋈lineitem is a fact⋈fact equi-join on
    * l_orderkey — at 100 TB both sides shuffle on the key (or are
    * bucketed by it at rest); the projection keeps only 3 columns so
    * the shuffle is narrow.
    *
    * The explicit repartition on user_id serves BOTH downstream
    * aggregations with one exchange: HashPartitioning(user_id)
    * satisfies the (user_id, item_id) grouping here AND the
    * per-user grouping the history cap runs next, so neither plans
    * its own shuffle. The join output dedups barely (~1:1 at every
    * SF), so the map-side combine this forgoes would have removed
    * nothing — one raw exchange beats two agg exchanges.
    */
  def interactions(spark: SparkSession, sfDir: String): DataFrame = {
    val o = orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_quantity")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .agg(sum("l_quantity").as("strength"))
      .select(col("user_id"), col("item_id"), col("strength"))
  }

  /** Register every fixture table as a session temp view (S6) so queries
    * can be expressed in SQL; `events` is registered with its normalized
    * µs timestamp. Idempotent per session+sfDir.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    starTables.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
    documents(spark, sfDir).createOrReplaceTempView("documents")
    embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    events(spark, sfDir).createOrReplaceTempView("events")
  }

  /** DuckDB-side SQL equivalent of [[interactions]], used as a CTE body
    * inside oracle queries (oracle tables are named views over the same
    * parquet files).
    */
  val interactionsSql: String =
    """SELECT o_custkey AS user_id, l_partkey AS item_id, sum(l_quantity) AS strength
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2""".stripMargin
}
