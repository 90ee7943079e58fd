package graft

import graft.functions.{KmvBuffer, KmvMins}
import graft.operators.Advanced
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Off-fixture scale execution of the KMV sketch tier (the discipline
  * every new mechanism gets: a measured replay, not an argument — the
  * AnnScaleSpec/MediaScaleSpec closure).
  *
  * The corpus is 10⁶ distinct string ids hashed with the exact h48(md5)
  * expression the queries use; the expected sketch is an independent
  * driver-side recompute (java MessageDigest over the same UTF-8
  * bytes), so agreement is EXACT — the distributed partial-cap /
  * merge path must reproduce the k smallest distinct hashes
  * bit-for-bit at 4 partitions × 250k rows each.
  */
class KmvScaleSpec extends AnyFunSuite with SparkFixture {

  private def h48Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 12 hex digits = first 6 bytes
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  test("10^6-value sketch replays the driver-side k minima bit-for-bit", ScaleTest) {
    val n = 1000000
    val got = spark.range(0L, n.toLong).repartition(4)
      .select(expr(
        "cast(conv(substring(md5(cast(id AS string)), 1, 12), 16, 10) AS bigint)").as("h"))
      .agg(KmvMins.kmvMins(Advanced.KmvK, col("h")).as("mins"))
      .collect().head.getSeq[Long](0).toList

    val whole = new KmvBuffer(Advanced.KmvK)
    var i = 0
    while (i < n) { whole.offer(h48Local(i.toString)); i += 1 }
    val want = whole.vals.take(whole.size).toList
    assert(got == want)

    // estimator at 10^6 distinct: (k-1)·M / h_(k) within the k=64
    // sampling band (σ ≈ 12.7%; this deterministic draw is fixed)
    val est = (Advanced.KmvK - 1).toDouble * Advanced.KmvM / got.last.toDouble
    val relErr = math.abs(est - n) / n
    assert(relErr < 0.4, s"est=$est relErr=$relErr")
  }

  test("sketch union of 4 disjoint shards equals the whole-corpus sketch", ScaleTest) {
    val n = 400000
    val shards = (0 until 4).map { s =>
      val b = new KmvBuffer(Advanced.KmvK)
      var i = s
      while (i < n) { b.offer(h48Local(i.toString)); i += 4 }
      b
    }
    val whole = new KmvBuffer(Advanced.KmvK)
    var i = 0
    while (i < n) { whole.offer(h48Local(i.toString)); i += 1 }
    val merged = new KmvBuffer(Advanced.KmvK)
    shards.foreach(merged.mergeFrom)
    assert(merged.vals.take(merged.size).toList == whole.vals.take(whole.size).toList)
  }
}
