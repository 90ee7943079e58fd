package graft

import java.sql.Timestamp

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming twins (SURVEY.md §2.11): the SAME transforms
  * the batch queries use (Streams.*) fed from a MemoryStream with a
  * watermark; after processAllAvailable the complete-mode state must
  * equal the batch result on the identical input — one plan, two
  * runners, zero drift. Also covers watermarked late-data drop,
  * streaming dropDuplicates, and flatMapGroupsWithState (T4–T6).
  */
case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double, ts: Timestamp)

/** Output row for the transformWithState demo. */
case class UserAgg(user_id: Long, n_events: Long, max_value: Double)

/** Spark 4 arbitrary-state API (T6c): per-user running count + max via
  * `StatefulProcessor` ValueStates — the successor surface to
  * flatMapGroupsWithState, with typed per-key state and optional TTL.
  */
class CountMaxProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserAgg] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var count: ValueState[Long] = _
  @transient private var maxV: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    maxV = getHandle.getValueState[Double]("maxv", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timers: TimerValues): Iterator[UserAgg] = {
    var c = if (count.exists()) count.get() else 0L
    var m = if (maxV.exists()) maxV.get() else Double.NegativeInfinity
    rows.foreach { e => c += 1; m = math.max(m, e.value) }
    count.update(c)
    maxV.update(m)
    Iterator.single(UserAgg(key, c, m))
  }
}

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private val fixture = Seq(
    Ev(1, 1, "view", 1.0, ts(0)),
    Ev(2, 1, "view", 2.0, ts(5)),
    Ev(3, 1, "click", 3.0, ts(40)),   // same session as 2 (gap 35 > 30? -> new session)
    Ev(4, 2, "view", 4.0, ts(10)),
    Ev(5, 2, "purchase", 5.0, ts(65)), // crosses the tumbling-hour boundary
    Ev(6, 1, "view", 6.0, ts(70)),
    Ev(7, 3, "view", 7.0, ts(75)),
    Ev(8, 3, "view", 8.0, ts(76)),
  )

  private def runStream(transform: DataFrame => DataFrame,
                        outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture)
    val name = s"stream_out_${System.nanoTime()}"
    val q = transform(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("T1 streaming tumbling window equals batch on same input") {
    val session = spark
    import session.implicits._
    val batch = Streams.tumblingCounts(fixture.toDF())
    val streamed = runStream(Streams.tumblingCounts)
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 2) // events genuinely span hour windows
  }

  test("T11 streaming KMV windowed distinct estimate equals batch on same input") {
    val session = spark
    import session.implicits._
    val batch = Streams.kmvWindowUsers(fixture.toDF())
    // the KMV buffer must survive state-store serialize/merge across
    // TWO micro-batches: split the fixture so windows accumulate
    // incrementally (countDistinct would be rejected on this plan)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val (b1, b2) = fixture.splitAt(fixture.size / 2)
    val name = s"stream_kmv_${System.nanoTime()}"
    val q = Streams.kmvWindowUsers(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
    assert(canon(streamed) == canon(batch))
    // fixture windows under-fill k: estimate must equal exact distinct
    val exact = Streams.tumblingUsers(fixture.toDF())
      .select(col("window_start"), col("n_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    batch.collect().foreach { r =>
      assert(r.getAs[Double]("est_users") ==
        exact(r.getAs[String]("window_start")).toDouble)
    }
  }

  test("T2 streaming sliding window equals batch on same input") {
    val session = spark
    import session.implicits._
    val batch = Streams.slidingCounts(fixture.toDF())
    val streamed = runStream(Streams.slidingCounts)
    assert(canon(streamed) == canon(batch))
    // every event lands in exactly 4 overlapping 15-min-slide windows
    assert(batch.agg(sum("n_events")).head.getLong(0) == fixture.size * 4L)
    assert(batch.count() > fixture.size / 2) // windows genuinely overlap
  }

  test("T3 streaming session window equals batch on same input") {
    val session = spark
    import session.implicits._
    val batch = Streams.sessionWindows(fixture.toDF())
    val streamed = runStream(Streams.sessionWindows)
    assert(canon(streamed) == canon(batch))
    // user 1: events at 0,5,40,70 -> the 35-min gap (5->40) splits; the
    // exactly-30-min gap (40->70) MERGES (session_window boundary is
    // inclusive) -> two sessions
    assert(batch.where(col("user_id") === 1).count() == 2)
    // user 3: events at 75,76 -> one session of 2
    val u3 = batch.where(col("user_id") === 3).collect()
    assert(u3.length == 1 && u3(0).getAs[Long]("n_events") == 2L)
  }

  test("T4 watermark drops late data beyond horizon") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"late_out_${System.nanoTime()}"
    val q = Streams.tumblingCounts(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      mem.addData(fixture)
      q.processAllAvailable()
      // watermark is now max(ts)=11:16 minus 10 min = 11:06; an event at
      // 10:00 is far behind it and its (closed) window must not reopen
      mem.addData(Seq(Ev(99, 9, "view", 9.0, ts(0))))
      q.processAllAvailable()
      // advance the watermark far enough to close and emit all windows
      mem.addData(Seq(Ev(100, 9, "view", 9.0, ts(300))))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
    // the late event (user 9 @10:00) was dropped: the 10:00 window keeps
    // its on-time count (5 events: ids 1,2,3,4 in [10:00,11:00))
    val hour0 = out.where(col("window_start") === "2024-01-01 10:00:00")
      .agg(sum("n_events")).head.getLong(0)
    assert(hour0 == 4L)
  }

  test("T4b late-data audit drop policy matches a real watermarked stream batch-for-batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    // arrival batches hand-built to hit every case:
    //   batch 0 sets the watermark to 12:10-10min = 12:00 for batch 1;
    //   e3 is far late (wend 11:00 < wm),
    //   e4 is the EXACT boundary (wend 12:00 == wm),
    //   e5/e6 are on-time
    val batches = Seq(
      Seq(Ev(1, 1, "view", 1.0, at("2024-01-01 10:15:00")),
          Ev(2, 1, "view", 2.0, at("2024-01-01 12:10:00"))),
      Seq(Ev(3, 1, "view", 4.0, at("2024-01-01 10:59:59")),
          Ev(4, 1, "view", 8.0, at("2024-01-01 11:59:59")),
          Ev(5, 1, "view", 16.0, at("2024-01-01 12:30:00")),
          Ev(6, 1, "view", 32.0, at("2024-01-01 12:05:00"))),
      Seq(Ev(7, 1, "view", 64.0, at("2024-01-01 20:00:00"))), // flush: closes all windows
    )
    val name = s"late_parity_${System.nanoTime()}"
    val mem = MemoryStream[Ev]
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("n_events"), col("sum_value"))
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      // one processAllAvailable per addData = one micro-batch each, so the
      // watermark advances exactly at the batch boundaries the audit models
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table(name)
      .select("window_start", "n_events", "sum_value").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val audit = Streams.lateAuditFromBatches(
        batches.zipWithIndex.flatMap { case (b, i) => b.map(e => (e.event_id, e.value, e.ts, i)) }
          .toDF("event_id", "value", "ts", "batch_id")
          .select(col("event_id"), col("value"),
                  expr("unix_micros(timestamp(ts))").as("ev_us"), col("batch_id")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    // every CLOSED window the audit says has kept events must appear in
    // the stream output with the same count and value sum — and vice
    // versa. The flush window itself never closes (append mode emits a
    // window only once the watermark passes its end, and nothing
    // arrives after the flush), so it is outside the comparable set.
    val unclosed = "2024-01-01 20:00:00"
    val keptWindows = audit.filter { case (w, (n, _, _)) => n > 0 && w != unclosed }
    assert(streamed.keySet == keptWindows.keySet,
      s"stream emitted $streamed but audit kept $keptWindows")
    for ((w, (nKept, _, sumKept)) <- keptWindows)
      assert(streamed(w) == (nKept, sumKept), s"window $w: stream=${streamed(w)} audit=($nKept,$sumKept)")
    // far-late e3: dropped on both sides
    assert(audit("2024-01-01 10:00:00") == (1L, 1L, 1.0),
      "10:00 window must keep only the on-time event and drop e3")
    // boundary e4 (wm == window end): the stream dropped it, pinning the
    // NON-STRICT close predicate the audit uses
    assert(audit("2024-01-01 11:00:00") == (0L, 1L, 0.0),
      "exact watermark==window-end must drop")
  }

  test("T7 stream-stream interval join equals batch join and evicts watermark-expired state") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    // joinable window is 30 min (Streams.JoinHorizonMin):
    //   u1: click 10:00 -> purchase 10:20 (pair), purchase 10:40 (outside)
    //   u2: click 10:05 -> purchase 10:35 (exactly 30 min: pair, <= bound)
    //   u3: purchase 10:10 with no click (no pair)
    //   u2: click 11:00 with purchase only BEFORE it (no pair)
    val clicks1 = Seq(Ev(1, 1, "click", 1.0, at("2024-01-01 10:00:00")),
                      Ev(4, 2, "click", 1.0, at("2024-01-01 10:05:00")),
                      Ev(7, 2, "click", 1.0, at("2024-01-01 11:00:00")))
    val buys1 = Seq(Ev(2, 1, "purchase", 9.0, at("2024-01-01 10:20:00")),
                    Ev(3, 1, "purchase", 9.0, at("2024-01-01 10:40:00")),
                    Ev(5, 2, "purchase", 9.0, at("2024-01-01 10:35:00")),
                    Ev(6, 3, "purchase", 9.0, at("2024-01-01 10:10:00")))
    // flush batch far in the future: advances BOTH watermarks past every
    // batch-1 event + horizon, so all batch-1 join state is evictable
    val clicks2 = Seq(Ev(8, 9, "click", 1.0, at("2024-01-02 10:00:00")))
    val buys2 = Seq(Ev(9, 9, "purchase", 9.0, at("2024-01-02 10:00:01")))

    val memC = MemoryStream[Ev]
    val memB = MemoryStream[Ev]
    val name = s"join_out_${System.nanoTime()}"
    val q = Streams.clickPurchaseJoin(
        memC.toDF().withWatermark("ts", "10 minutes"),
        memB.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      memC.addData(clicks1); memB.addData(buys1)
      q.processAllAvailable()
      memC.addData(clicks2); memB.addData(buys2)
      q.processAllAvailable()
      // one empty pass so the batch-2 watermark takes effect for eviction
      q.processAllAvailable()

      // the streaming plan must be the symmetric hash join, not a
      // batch join smuggled in
      assert(q.lastProgress.json.contains("symmetricHashJoin") ||
             spark.table(name).queryExecution.sparkSession.streams.active.isEmpty ||
             q.lastProgress.stateOperators.nonEmpty,
        "stream-stream join must run as a stateful symmetric hash join")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // 9 rows entered the join; everything from batch 1 is past
      // watermark+horizon after the flush, so retained state must be
      // (at most) the flush rows — NOT the whole history
      assert(stateRows <= 4, s"join state not evicted: $stateRows rows retained")
    } finally q.stop()

    val streamed = spark.table(name)
    val batch = Streams.clickPurchaseJoin((clicks1 ++ clicks2).toDF(),
                                          (buys1 ++ buys2).toDF())
    assert(canon(streamed) == canon(batch))
    // the pair set is exactly the two in-horizon conversions + the flush pair
    assert(batch.count() == 3)
    assert(canon(batch.select("click_id", "buy_id")) == Seq("1|2", "4|5", "8|9"))
  }

  test("T7b left-outer stream join emits unmatched clicks only after the watermark proves no match") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    val clicks1 = Seq(Ev(1, 1, "click", 1.0, at("2024-01-01 10:00:00")),   // matches
                      Ev(2, 2, "click", 1.0, at("2024-01-01 10:05:00")))   // never matches
    val buys1 = Seq(Ev(3, 1, "purchase", 9.0, at("2024-01-01 10:10:00")))
    val flushC = Seq(Ev(8, 9, "click", 1.0, at("2024-01-02 10:00:00")))
    val flushB = Seq(Ev(9, 9, "purchase", 9.0, at("2024-01-02 10:00:01")))

    val memC = MemoryStream[Ev]
    val memB = MemoryStream[Ev]
    val name = s"louter_out_${System.nanoTime()}"
    val q = Streams.clickPurchaseJoin(
        memC.toDF().withWatermark("ts", "10 minutes"),
        memB.toDF().withWatermark("ts", "10 minutes"), "left_outer")
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      memC.addData(clicks1); memB.addData(buys1)
      q.processAllAvailable()
      // before any watermark advance past 10:05+30min, click 2 must NOT
      // have been emitted null-padded — a match could still arrive
      val early = spark.table(name).where(col("click_id") === 2).count()
      assert(early == 0, "unmatched click emitted before the watermark proved no match")
      memC.addData(flushC); memB.addData(flushB)
      q.processAllAvailable()
      q.processAllAvailable() // let the advanced watermark finalize outer results
    } finally q.stop()
    val streamed = spark.table(name)
    // now click 2 appears exactly once, null-padded
    val u2 = streamed.where(col("click_id") === 2).collect()
    assert(u2.length == 1 && u2(0).isNullAt(u2(0).fieldIndex("buy_id")))
    // and the stream equals the batch left join on the closed subset
    // (the flush click's own row may still be held back by the final
    // watermark, so compare on batch-1 clicks only)
    val batch = Streams.clickPurchaseJoin((clicks1 ++ flushC).toDF(),
                                          (buys1 ++ flushB).toDF(), "left_outer")
    assert(canon(streamed.where(col("click_id") <= 2)) ==
           canon(batch.where(col("click_id") <= 2)))
  }

  test("T5 streaming dropDuplicates equals batch first-event dedup on keys") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture)
    val name = s"dedup_out_${System.nanoTime()}"
    // streaming dedup keeps the FIRST arrival per key; MemoryStream
    // preserves addData order, which is ts order in the fixture, so the
    // kept (user, event_type) key set must equal the batch row_number=1 set
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
    val batch = Streams.firstEventPerType(fixture.toDF())
      .select("user_id", "event_type", "first_event_id")
    assert(canon(streamed) == canon(batch))
  }

  test("T12 stream-static CF scoring: a MemoryStream of arrivals against the persisted model equals batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the static side: the RELOADED serving model (built once by
    // ensureCfModel — the same catalog table the batch form reads)
    val model = Streams.cfServingModel(spark, sfTest)
    val arrivals = Streams.streamArrivals(spark, sfTest)
      .selectExpr("cast(user_id as long)", "cast(item_id as long)",
                  "cast(strength as double)")
      .as[(Long, Long, Double)].collect().toSeq
    assert(arrivals.nonEmpty, "the arrival window must be non-empty")
    val batch = canon(Streams.cfStreamScoreQuery(spark, sfTest))
    val mem = MemoryStream[(Long, Long, Double)]
    mem.addData(arrivals)
    val name = s"cfscore_out_${System.nanoTime()}"
    // stateless stream-static join: Append mode, no watermark needed
    val q = Streams.cfStreamScore(
        mem.toDF().toDF("user_id", "item_id", "strength"), model)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(canon(spark.table(name)) === batch,
      "stream-static scoring diverged from the batch form on identical arrivals")
  }

  test("T13 streaming index admission: foreachBatch micro-batch admission equals the batch wave replay") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import operators.Dedup
    // the stream grows its OWN lineage — the registry's grow tables
    // stay immutable (the sibling-oracle discipline)
    val names = Map("shingles" -> "graft_dedupgrow_shingles_t13strm",
                    "sizes" -> "graft_dedupgrow_sizes_t13strm")
    Dedup.writeResidentIndex(spark, sfTest, names)
    val sh = Dedup.shingles(spark, sfTest)
    def waveRows(lo: Long, hi: Long) = sh
      .where(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "s").as[(Long, String)].collect().toSeq
    val w1 = waveRows(Dedup.IncrementalFrom, Dedup.GrowMid)
    val w2 = waveRows(Dedup.GrowMid, Long.MaxValue)
    assert(w1.nonEmpty && w2.nonEmpty, "both admission waves must be non-empty")
    val mem = MemoryStream[(Long, String)]
    // foreachBatch drives the SAME admitWave the batch grow leg runs —
    // one admission implementation, two runners
    val admit: (DataFrame, Long) => Unit =
      (b: DataFrame, _: Long) => Dedup.admitWave(spark, names, b)
    val q = mem.toDF().toDF("doc_id", "s").writeStream
      .foreachBatch(admit).start()
    try {
      mem.addData(w1); q.processAllAvailable() // micro-batch 1 = wave 1
      mem.addData(w2); q.processAllAvailable() // micro-batch 2 = wave 2
    } finally q.stop()
    // batch replay: ensureDedupGrow admits wave 1; wave 2's survivors
    // are the docs dedupServeGrow does NOT match against the grown index
    Dedup.ensureDedupGrow(spark, sfTest)
    val grown = Dedup.dedupGrowNames(sfTest)
    val w2dups = Dedup.dedupServeGrow(spark, sfTest)
      .select("new_id").as[Long].collect().toSet
    val expected = (spark.table(grown("shingles"))
        .select("doc_id", "s").as[(Long, String)].collect().toSeq ++
      w2.filterNot(r => w2dups.contains(r._1))).sorted
    val got = spark.table(names("shingles"))
      .select("doc_id", "s").as[(Long, String)].collect().toSeq.sorted
    assert(got.nonEmpty && got === expected,
      "streamed admission index diverges from the batch wave replay")
    // the size table tracks the admitted shingle rows exactly
    val gotSizes = spark.table(names("sizes"))
      .select("doc_id", "ns").as[(Long, Long)].collect().toMap
    val expSizes = expected.groupBy(_._1).map { case (d, rs) => d -> rs.size.toLong }
    assert(gotSizes === expSizes, "size table out of step with the admitted shingles")
    names.values.foreach(n => graft.sources.Sources.retireTable(spark, n))
  }

  test("file-source stream: tumbling counts over events parquet equal batch") {
    // readStream over the fixture parquet (schema must be declared for
    // file streams; whatever physical ts type the fixture carries, the
    // batch path's normalizer is applied identically)
    val batchRaw = spark.read.parquet(s"$sfTest/events.parquet")
    val stream = Tables.normalizeTs(spark.readStream.schema(batchRaw.schema)
      .option("pathGlobFilter", "events.parquet") // file streams need a directory
      .parquet(sfTest))
      .withWatermark("ts", "10 minutes")
    val name = s"file_out_${System.nanoTime()}"
    val q = Streams.tumblingCounts(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
    val batch = Streams.tumblingCounts(Tables.events(spark, sfTest))
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 0)
  }

  test("foreachBatch sink: incremental aggregation into a parquet target") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = "target/tmp/stream_agg_sink"
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingCounts(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode(OutputMode.Complete())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // complete-mode refresh: each micro-batch rewrites the serving
        // copy atomically (overwrite) — the standard foreachBatch
        // pattern for pushing stream state to a batch-readable store
        batch.write.mode("overwrite").parquet(target)
      }.start()
    try {
      mem.addData(fixture.take(4))
      q.processAllAvailable()
      mem.addData(fixture.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    val served = spark.read.parquet(target)
    val batchAll = Streams.tumblingCounts(fixture.toDF())
    assert(canon(served) == canon(batchAll))
  }

  test("T10 replay-idempotent upsert: duplicated micro-batch delivery converges to exactly-once state") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    val mem = MemoryStream[Ev]
    var target = Streams.latestPerKey(
      spark.emptyDataset[Ev].toDF().select(cols.map(col): _*))
    var applied = 0
    val q = mem.toDF().select(cols.map(col): _*)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // at-least-once simulation: the sink write "succeeded" but the
        // commit "was lost" for batch 1, so it is applied AGAIN — an
        // idempotent LWW merge must leave the target unchanged
        val replays = if (batchId == 1L) 2 else 1
        (0 until replays).foreach { _ =>
          target = Streams.upsertMerge(target, batch.toDF()).localCheckpoint()
          applied += 1
        }
      }.start()
    try {
      mem.addData(fixture.take(3))
      q.processAllAvailable()
      mem.addData(fixture.slice(3, 6))
      q.processAllAvailable()
      mem.addData(fixture.drop(6))
      q.processAllAvailable()
    } finally q.stop()
    assert(applied >= 4, "the replay leg must actually have run")
    // converged state == flat latest-per-user over ALL events, as if
    // every batch had been delivered exactly once
    val flat = Streams.latestPerKey(fixture.toDF().select(cols.map(col): _*))
    assert(canon(target) == canon(flat))
    // and replaying the ENTIRE history once more is a fixpoint
    val replayedAll = Streams.upsertMerge(target,
      fixture.toDF().select(cols.map(col): _*))
    assert(canon(replayedAll) == canon(target))
  }

  test("T6b stateful session close via event-time timeout") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sess_state_${System.nanoTime()}"
    // one open session per user in state; the session closes (emits)
    // when the watermark passes last_event + 30min — the incremental
    // form of the batch session_window
    val closed = mem.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[(Long, Long, Long)]) =>
          val GapMs = 30 * 60 * 1000L
          if (state.hasTimedOut) {
            val (start, _, n) = state.get
            state.remove()
            Iterator((uid, start, n))
          } else {
            val sorted = evs.map(_.ts.getTime).toList.sorted
            var (start, last, n) = state.getOption.getOrElse((sorted.head, sorted.head, 0L))
            val closed = scala.collection.mutable.Buffer[(Long, Long, Long)]()
            for (t <- sorted) {
              if (n > 0 && t > last + GapMs) { // gap splits: emit and restart
                closed += ((uid, start, n))
                start = t; last = t; n = 1
              } else {
                if (n == 0) start = t
                last = math.max(last, t); n += 1
              }
            }
            state.update((start, last, n))
            state.setTimeoutTimestamp(last + GapMs)
            closed.iterator
          }
      }
    val q = closed.toDF("user_id", "session_start_ms", "n_events")
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Seq(Ev(1, 7, "view", 1.0, ts(0)), Ev(2, 7, "view", 2.0, ts(10))))
      q.processAllAvailable()
      // an event far past the session gap advances the watermark beyond
      // last(10:10) + 30min -> the open session must close and emit
      mem.addData(Seq(Ev(3, 7, "view", 3.0, ts(200))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 7L && rows(0).getLong(1) == ts(0).getTime && rows(0).getLong(2) == 2L)
  }

  test("stream-stream interval join equals the batch range join") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    def joinViewsToBuys(views: org.apache.spark.sql.DataFrame,
                        buys: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      buys.join(views,
        col("buy_user") === col("view_user") &&
        col("view_ts") < col("buy_ts") &&
        col("view_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR"))
        .select(col("buy_id"), col("view_id"))

    val viewsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
                col("ts").as("view_ts"))
    val buysOf = (df: org.apache.spark.sql.DataFrame) =>
      df.where(col("event_type") === "click" || col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("buy_user"),
                col("ts").as("buy_ts"))

    val mem = MemoryStream[Ev]
    mem.addData(fixture)
    val src = mem.toDF()
    val streamed = joinViewsToBuys(
        viewsOf(src).withWatermark("view_ts", "2 hours"),
        buysOf(src).withWatermark("buy_ts", "2 hours"))
    val name = s"ssjoin_${System.nanoTime()}"
    val q = streamed.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()

    val batchDf = fixture.toDF()
    val expected = canon(joinViewsToBuys(viewsOf(batchDf), buysOf(batchDf)))
    assert(canon(spark.table(name)) == expected)
    assert(expected.nonEmpty) // the fixture genuinely produces attributed pairs
  }

  test("T6 flatMapGroupsWithState: running per-user event counter") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture)
    val name = s"state_out_${System.nanoTime()}"
    val counted = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((uid, total))
      }
    val q = counted.toDF("user_id", "n_events")
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
    try q.processAllAvailable() finally q.stop()
    val finalCounts = spark.table(name)
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val expected = fixture.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    val got = finalCounts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("T6c transformWithState: ValueState running aggregates equal batch") {
    // the new API requires the RocksDB state store; scope the conf to a
    // fresh session so the other streaming tests keep the default store
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture)
    val name = s"tws_out_${System.nanoTime()}"
    val q = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new CountMaxProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
    try q.processAllAvailable() finally q.stop()
    // Update mode emits one row per (key, batch); the LAST row per key
    // is the final state — with a single batch, just read per key
    val got = s2.table(name).groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("max_value").as("max_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = fixture.groupBy(_.user_id).map { case (u, evs) =>
      u -> ((evs.size.toLong, evs.map(_.value).max))
    }
    assert(got == expected)
  }

  test("stream-static broadcast join: event weights enrich the stream") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    // static dimension: per-type implicit-feedback weights
    val dim = Seq(("view", 1.0), ("click", 2.0), ("purchase", 5.0))
      .toDF("event_type", "w")
    val got = runStream(
      st => st.join(broadcast(dim), Seq("event_type"), "left")
        .groupBy("user_id")
        .agg(sum(coalesce($"w", lit(0.0)) * $"value").as("wsum")),
      OutputMode.Complete())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wmap = Map("view" -> 1.0, "click" -> 2.0, "purchase" -> 5.0)
    val expected = fixture.groupBy(_.user_id).map { case (u, evs) =>
      u -> evs.map(e => wmap.getOrElse(e.event_type, 0.0) * e.value).sum
    }
    assert(got == expected)
  }

  test("windowed cardinality on a stream: approx_count_distinct within HLL error of batch exact") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    // exact countDistinct is unsupported on streams — the documented
    // swap (Streams.tumblingUsers scaladoc) is approx_count_distinct
    val got = runStream(
      st => st.groupBy(window($"ts", "1 hour").as("w"))
        .agg(approx_count_distinct($"user_id", 0.02).as("n_users"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("ws"), $"n_users"),
      OutputMode.Complete())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = fixture.groupBy(e => e.ts.getTime / 3600000L)
      .map { case (_, evs) => evs.map(_.user_id).distinct.size }
    // tiny cardinalities: HLL at rsd=0.02 is exact in practice here
    assert(got.values.sum === exact.sum)
  }

  test("T8 windowed top-K: streamed counts ranked per batch equal the batch form") {
    val session = spark
    import session.implicits._
    // stage 1 (streaming-safe aggregate) runs on the stream; stage 2
    // (bounded TopKByScore ranking) applies per micro-batch output —
    // the foreachBatch deployment shape
    val streamedCounts = runStream(Streams.windowUserCounts)
    val streamed = Streams.rankTopUsers(streamedCounts)
    val batch = Streams.rankTopUsers(Streams.windowUserCounts(fixture.toDF()))
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 0)
    // bounded output: at most K users per window
    val perWindow = batch.groupBy("window_start").count().collect()
    perWindow.foreach(r => assert(r.getLong(1) <= Streams.StreamTopK))
  }

  test("T9 drift monitor: streamed bucket counts rolled to PSI equal the batch form") {
    val session = spark
    import session.implicits._
    val batchDf = fixture.toDF()
    // static monitor config: reference breakpoints from the corpus
    val qs = Streams.DriftQuantiles.mkString("array(", ", ", ")")
    val bks = batchDf
      .agg(expr(s"transform(percentile(value, $qs), b -> round(b, 4))").as("b"))
      .head.getSeq[Double](0)
    val ref = Streams.driftReference(batchDf, bks)
    // stage 1 on the stream, stage 2 per batch output (foreachBatch shape)
    val streamed = Streams.driftPsi(runStream(Streams.driftBucketCounts(_, bks)), ref)
    val batch = Streams.driftPsi(Streams.driftBucketCounts(batchDf, bks), ref)
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 0)
    // a window drawn from the reference itself must read as stable
    batch.collect().foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= -1e-9, s"PSI must be non-negative, got $psi")
    }
  }
}
