package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the synchronous LPA recurrence beyond the
  * fixture's catalog-sized graph, on BOTH sides of the broadcast
  * ceiling — the same bit-exact off-fixture closure GraphScaleSpec
  * gave the PageRank recurrence (the label vector now feeds TWO
  * queries: the community rollup and the modularity audit, so its
  * exactness carries more weight than one query's oracle).
  *
  * Graph: 150,000 nodes, 1,500,000 deterministic directed edges (the
  * GraphScaleSpec generator family: src = e mod N, golden-ratio dst
  * offset, weight 1 + e mod 7 — no RNG, no hash()). The driver-side
  * truth replays the EXACT recurrence (argmax over summed neighbor
  * label weights, ties to the SMALLEST label) on arrays; agreement is
  * equality of the full 150k-label vector after LpaRounds rounds.
  */
class LpaScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.GraphRank

  private val N = 150000
  private val E = 1500000
  private val MulK = 2654435761L

  private def edgeTriple(e: Long): (Long, Long, Long) = {
    val src = e % N
    val dst = (src + 1L + (e * MulK) % (N - 1)) % N // never a self-loop
    (src, dst, 1L + e % 7)
  }

  /** Exact driver-side replay of [[GraphRank.lpaRound]]'s semantics:
    * every node adopts the label with the largest total incoming edge
    * weight, ties to the smallest label. Nodes are relabeled only if
    * they receive any edge (matching the dst-keyed aggregate). */
  private def localLabels(): Map[Long, Long] = {
    val es = Array.tabulate(E)(i => edgeTriple(i.toLong))
    // lpaRound aggregates by dst over edges keyed src -> dst
    var lbl = scala.collection.mutable.Map.empty[Long, Long]
    es.foreach { case (s, d, _) => lbl(s) = s; lbl(d) = d }
    for (_ <- 1 to GraphRank.LpaRounds) {
      val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
      es.foreach { case (s, d, w) =>
        val k = (d, lbl(s)); acc(k) = acc.getOrElse(k, 0L) + w
      }
      val next = scala.collection.mutable.Map.empty[Long, Long]
      acc.foreach { case ((d, l), sw) =>
        val cur = next.get(d)
        val better = cur match {
          case None => true
          case Some(curL) =>
            val curW = acc((d, curL))
            sw > curW || (sw == curW && l < curL)
        }
        if (better) next(d) = l
      }
      // nodes with no incoming edge drop out of the aggregate, exactly
      // as in the engine's dst-keyed groupBy
      lbl = next
    }
    lbl.toMap
  }

  test("1.5M-edge graph: sync LPA labels bit-exact on both broadcast branches",
      ScaleTest) {
    val edges = spark.range(0L, E.toLong)
      .select((col("id") % N).as("src"),
        ((col("id") % N + 1L + (col("id") * MulK) % (N - 1)) % N).as("dst"),
        (col("id") % 7 + 1L).as("w"))
      .localCheckpoint()
    val truth = localLabels()
    for (fitsBroadcast <- Seq(true, false)) {
      var lbls = edges.select(col("src")).unionByName(edges.select(col("dst").as("src")))
        .distinct().select(col("src"), col("src").as("lbl")).localCheckpoint()
      for (_ <- 1 to GraphRank.LpaRounds) {
        lbls = GraphRank.lpaRound(edges, lbls, fitsBroadcast)
          .withColumnRenamed("item", "src")
          .localCheckpoint()
      }
      val got = lbls.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === truth.size,
        s"label vector size (broadcast=$fitsBroadcast)")
      assert(got === truth, s"label vector mismatch (broadcast=$fitsBroadcast)")
    }
  }
}
