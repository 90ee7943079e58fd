package graft

import graft.operators.GraphRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the graph-rank operators beyond the DuckDB oracle
  * (which already pins exact values): rank-mass bounds, ordering
  * contracts, and PMI sign/symmetry laws on the fixture data.
  */
class GraphRankSpec extends AnyFunSuite with SparkFixture {

  test("pagerank emits TopOut rows ranked 1..N by (rank desc, item asc)") {
    val out = GraphRank.itemPagerank(spark, sfTest).collect()
    assert(out.length == GraphRank.TopOut)
    assert(out.map(_.getInt(0)).toSeq == (1 to GraphRank.TopOut))
    val ranks = out.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }

  test("pagerank mass stays bounded: every rank positive, total below TotalUnits") {
    // fixed-point floor-division only ever loses mass, never creates it
    val out = GraphRank.itemPagerank(spark, sfTest).collect()
    assert(out.forall(_.getLong(2) > 0))
    assert(out.map(_.getLong(2)).sum < GraphRank.TotalUnits)
  }

  test("pagerank is partitioning-invariant (integer fixed-point determinism)") {
    val a = GraphRank.itemPagerank(spark, sfTest).collect().map(_.toSeq).toSeq
    val repart = spark.newSession()
    repart.conf.set("spark.sql.shuffle.partitions", "7")
    val b = GraphRank.itemPagerank(repart, sfTest).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("pmi support floor and ranking contract hold") {
    val out = GraphRank.pairPmi(spark, sfTest).collect()
    assert(out.length == GraphRank.PmiTop)
    assert(out.forall(_.getLong(3) >= GraphRank.MinCo))
    val pmis = out.map(_.getDouble(4))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // pairs are emitted in the canonical i<j half-space
    assert(out.forall(r => r.getLong(1) < r.getLong(2)))
  }
}
