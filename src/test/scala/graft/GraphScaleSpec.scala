package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the integer PageRank recurrence beyond the
  * fixture's catalog-sized graph, on BOTH sides of the broadcast
  * ceiling (the same scale-executed-not-just-argued closure
  * StatsScaleSpec gave the rank machinery and AnnScaleSpec the IVF
  * tier).
  *
  * Graph: 200,000 nodes, 2,000,000 deterministic directed edges (pure
  * integer recurrence — src = e mod N, dst offset from a golden-ratio
  * multiply, weight 1 + e mod 7; no RNG, no hash()). The driver-side
  * truth replays the EXACT integer recurrence ((100−d)·base +
  * d·Σ (rank·w) div ow) div 100 on arrays, so engine agreement is
  * bit-exact equality of the full 200k-rank vector, not a tolerance.
  */
class GraphScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.GraphRank

  private val N = 200000
  private val E = 2000000
  private val MulK = 2654435761L

  private def edgeTriple(e: Long): (Long, Long, Long) = {
    val src = e % N
    val dst = (src + 1L + (e * MulK) % (N - 1)) % N // offset in 1..N-1 ⇒ never a self-loop
    (src, dst, 1L + e % 7)
  }

  private def localRanks(): Array[Long] = {
    val es = Array.tabulate(E)(i => edgeTriple(i.toLong))
    val ow = new Array[Long](N)
    es.foreach { case (s, _, w) => ow(s.toInt) += w }
    val base = GraphRank.TotalUnits / N
    var rank = Array.fill(N)(base)
    for (_ <- 1 to GraphRank.Rounds) {
      val contrib = new Array[Long](N)
      es.foreach { case (s, d, w) =>
        contrib(d.toInt) += rank(s.toInt) * w / ow(s.toInt)
      }
      rank = Array.tabulate(N)(i =>
        ((100 - GraphRank.DampPct) * base + GraphRank.DampPct * contrib(i)) / 100)
    }
    rank
  }

  test("2M-edge graph: integer recurrence bit-exact on both broadcast branches",
      ScaleTest) {
    val edges = spark.range(0L, E.toLong)
      .select((col("id") % N).as("src"),
        ((col("id") % N + 1L + (col("id") * MulK) % (N - 1)) % N).as("dst"),
        (col("id") % 7 + 1L).as("w"))
    val ew = edges.join(edges.groupBy("src").agg(sum("w").as("ow")), "src")
      .localCheckpoint()
    val nodes = spark.range(0L, N.toLong).select(col("id").as("item"))
    val truth = localRanks()
    for (ceiling <- Seq(Long.MaxValue, 0L)) { // broadcast branch, then shuffled branch
      val got = GraphRank.pagerankOf(ew, nodes, N.toLong, ceiling)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === N)
      val mismatch = (0 until N).find(i => got(i.toLong) != truth(i))
      assert(mismatch.isEmpty, s"ceiling=$ceiling: first mismatching node $mismatch " +
        mismatch.map(i => s"(got ${got(i.toLong)}, truth ${truth(i)})").getOrElse(""))
      // the damped mass balance must hold: every rank ≥ the teleport floor
      val floor = (100 - GraphRank.DampPct) * (GraphRank.TotalUnits / N) / 100
      assert(got.values.min >= floor)
    }
  }

  test("2M-edge graph: Katz integer recurrence bit-exact on both broadcast branches",
      ScaleTest) {
    val edges = spark.range(0L, E.toLong)
      .select((col("id") % N).as("src"),
        ((col("id") % N + 1L + (col("id") * MulK) % (N - 1)) % N).as("dst"))
      .localCheckpoint()
    val nodes = spark.range(0L, N.toLong).select(col("id").as("item"))
    // local exact replay (duplicate directed edges contribute once each,
    // exactly as the engine's edge-list aggregate does)
    val es = Array.tabulate(E) { i =>
      val (s0, d, _) = edgeTriple(i.toLong); (s0, d)
    }
    val aN = GraphRank.KatzAlphaNum; val aD = GraphRank.KatzAlphaDen
    val unit = GraphRank.KatzUnit
    var c = Array.fill(N)(0L)
    for (_ <- 1 to GraphRank.KatzRounds) {
      val contrib = new Array[Long](N)
      es.foreach { case (s0, d) => contrib(d.toInt) += aN * (unit + c(s0.toInt)) / aD }
      c = contrib
    }
    for (ceiling <- Seq(Long.MaxValue, 0L)) {
      val got = GraphRank.katzOf(edges, nodes, N.toLong, ceiling)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === N)
      val mismatch = (0 until N).find(i => got(i.toLong) != c(i))
      assert(mismatch.isEmpty, s"ceiling=$ceiling: first mismatching node $mismatch " +
        mismatch.map(i => s"(got ${got(i.toLong)}, truth ${c(i)})").getOrElse(""))
    }
    // attenuated path counts are positive wherever an in-edge exists
    assert(c.count(_ > 0) > N / 2)
  }

  test("2M-edge graph: landmark closeness BFS hop-exact on both broadcast branches",
      ScaleTest) {
    val edges = spark.range(0L, E.toLong)
      .select((col("id") % N).as("src"),
        ((col("id") % N + 1L + (col("id") * MulK) % (N - 1)) % N).as("dst"))
      .localCheckpoint()
    // local replay: adjacency (dups harmless for BFS, but degree —
    // the landmark selector — counts edge ROWS, as the engine does)
    val deg = new Array[Int](N)
    val adj = Array.fill(N)(scala.collection.mutable.ArrayBuffer.empty[Int])
    (0 until E).foreach { i =>
      val (s0, d, _) = edgeTriple(i.toLong)
      deg(s0.toInt) += 1; adj(s0.toInt) += d.toInt
    }
    val landmarks = (0 until N).sortBy(v => (-deg(v), v)).take(GraphRank.NLandmarks)
    val hu = new Array[Long](N); val reached = new Array[Long](N)
    for (l <- landmarks) {
      val dist = Array.fill(N)(-1); dist(l) = 0
      var frontier = Array(l)
      for (d <- 1 to GraphRank.CloseHops) {
        val next = scala.collection.mutable.ArrayBuffer.empty[Int]
        frontier.foreach(v => adj(v).foreach { u =>
          if (dist(u) < 0) { dist(u) = d; next += u }
        })
        frontier = next.toArray
      }
      (0 until N).foreach { v =>
        if (dist(v) >= 1) { hu(v) += GraphRank.HarmonicLcm / dist(v); reached(v) += 1 }
      }
    }
    val expected = (0 until N).filter(hu(_) > 0)
      .sortBy(v => (-hu(v), v)).take(GraphRank.CloseTop)
      .map(v => (v.toLong, reached(v), hu(v)))
    for (ceiling <- Seq(Long.MaxValue, 0L)) {
      val got = GraphRank.closenessOf(edges, N.toLong, ceiling).collect()
        .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("reached"),
                   r.getAs[Long]("harmonic_units")))
      assert(got.toSeq == expected, s"ceiling=$ceiling: closeness replay mismatch")
    }
    // the head must at least be some landmark's direct neighbor (12
    // units per hop-1 adjacency); with ~10 out-edges/node and 4 hops
    // each landmark covers only ~10⁴ of the 2·10⁵ nodes, so full
    // 6-landmark coverage is NOT assumed
    assert(expected.head._3 >= GraphRank.HarmonicLcm)
  }
}
