package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-loader contract pins.
  *
  * The events fixture has shipped with three different physical `ts`
  * encodings across driver generations (TIMESTAMP(NANOS) read as long,
  * timestamp_ntz, timestamp) — round 5 closed green and then the
  * fixture flipped encodings, crashing all 46 events-dependent queries
  * in the end-of-round run. These tests pin [[Tables.normalizeTs]] to
  * produce the identical session-zone µs timestamp from every encoding
  * so the next flip is a no-op.
  */
class TablesSpec extends AnyFunSuite with SparkFixture {

  private val usWanted = 1704067200123456L // 2024-01-01T00:00:00.123456Z

  test("normalizeTs: long nanos truncate to the µs timestamp") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Long.valueOf(usWanted * 1000L + 789L))),
      StructType(Seq(StructField("ts", LongType))))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) === usWanted)
  }

  test("normalizeTs: timestamp_ntz casts value-preserving under the UTC session") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.time.LocalDateTime.parse("2024-01-01T00:00:00.123456"))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) === usWanted)
  }

  test("normalizeTs: native timestamp passes through unchanged") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.time.Instant.ofEpochSecond(1704067200L, 123456000L))),
      StructType(Seq(StructField("ts", TimestampType))))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) === usWanted)
  }

  test("spread: a sub-parallel input is repartitioned to the session target") {
    val one = spark.range(0, 100, 1, 1).toDF("k")
    val out = Tables.spread(one, "k")
    assert(out.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions)
  }

  test("spread: an already-parallel input passes through un-exchanged") {
    // r14 scale-safety gate: at 100 TB scans arrive as many splits and
    // spread must NOT pay a full shuffle of the projected columns (nor
    // reduce parallelism below the natural split count)
    val many = spark.range(0, 100, 1,
      spark.sessionState.conf.numShufflePartitions).toDF("k")
    assert(Tables.spread(many, "k") eq many,
      "spread must be the identity on an input at/above half the target parallelism")
  }

  test("events loader yields a TIMESTAMP ts on the on-disk fixture") {
    val ev = Tables.events(spark, sfTest)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
    // downstream contract: unix_micros must resolve (this is exactly the
    // expression that failed analysis when the fixture flipped to NTZ)
    assert(ev.select(unix_micros(col("ts"))).head.getLong(0) > 0L)
  }
}
