package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the wedge machinery (local clustering
  * coefficient + transitivity, Adamic-Adar link prediction) beyond the
  * fixture's catalog-sized graph — the scale-executed-not-just-argued
  * closure GraphScaleSpec gave PageRank and StatsScaleSpec the rank
  * sums.
  *
  * Graph: a ring of K=2,000 size-25 cliques where adjacent cliques
  * share exactly one node — 48,000 nodes, 600,000 edges, 4.6M
  * triangles, ~15M wedges, 1.15M Adamic-Adar candidate pairs. Every
  * quantity has a CLOSED FORM: an internal node has deg m−1 and sits in
  * C(m−1,2) triangles (cc = 1 exactly); a shared node has deg 2(m−1)
  * and 2·C(m−1,2) triangles; a cross-clique non-edge pair has exactly
  * one common neighbor (the shared node), so its AA score is exactly
  * round(10⁶/ln(2(m−1))). Engine agreement is exact integer equality,
  * not a tolerance.
  */
class TriangleScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.GraphRank

  private val K = 2000 // cliques in the ring
  private val M = 25   // clique size
  private val Stride = M - 1
  private val N = K * Stride // shared nodes make it K(m−1), not K·m

  /** The oriented (item_i < item_j) half-edge frame: all pairs inside
    * each clique; clique i covers nodes i·(m−1) .. i·(m−1)+m−1 mod N,
    * so clique i and i+1 share node (i+1)(m−1) and nothing else. */
  private def edgeFrame() = {
    val pairs = (for {
      j1 <- 0 until M; j2 <- (j1 + 1) until M
    } yield (j1, j2)).toSeq
    val pairsDf = spark.createDataFrame(pairs).toDF("j1", "j2")
    spark.range(0L, K.toLong).crossJoin(pairsDf)
      .select(
        ((col("id") * Stride + col("j1")) % N).as("u"),
        ((col("id") * Stride + col("j2")) % N).as("v"))
      .select(least(col("u"), col("v")).as("item_i"),
        greatest(col("u"), col("v")).as("item_j"))
  }

  test("600k-edge clique ring: cc, transitivity and triangle membership are exact",
      ScaleTest) {
    val e = edgeFrame().localCheckpoint()
    assert(e.count() === K.toLong * M * (M - 1) / 2)
    val out = GraphRank.localClusteringOf(
      e.select(col("item_i").as("a"), col("item_j").as("b"))).collect()
    // closed forms
    val triInternal = (M - 1).toLong * (M - 2) / 2            // C(m−1,2)
    val degShared = 2L * (M - 1)
    val tTotal = K.toLong * M * (M - 1) * (M - 2) / 6         // K·C(m,3)
    val wTotal = K.toLong * (M - 2) * (M - 1) * (M - 2) / 2 + // internal wedges
      K.toLong * degShared * (degShared - 1) / 2              // shared-node wedges
    val transitivity = BigDecimal(3.0 * tTotal / wTotal)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // top-30 by (cc desc, deg desc, item asc): internal nodes (cc=1)
    // beat shared nodes; the head is the 30 smallest non-multiples of
    // (m−1)
    val expectedIds = Iterator.from(1).filter(_ % Stride != 0).take(30).toSeq
    assert(out.map(_.getAs[Long]("item_id")).toSeq === expectedIds.map(_.toLong))
    out.foreach { r =>
      assert(r.getAs[Long]("deg") === (M - 1).toLong)
      assert(r.getAs[Long]("n_triangles") === triInternal)
      assert(r.getAs[Long]("cc_units") === 1000000L)
      assert(r.getAs[Double]("cc") === 1.0)
      assert(r.getAs[Double]("transitivity") === transitivity)
    }
  }

  test("600k-edge clique ring: every AA candidate scores exactly one shared middle",
      ScaleTest) {
    val e = edgeFrame().localCheckpoint()
    val out = GraphRank.linkPredictOf(e).collect()
    val u = math.round(1000000.0 / math.log(2.0 * (M - 1)))
    assert(out.length === GraphRank.AaTop)
    out.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") === 1L,
        "cross-clique pairs share exactly the one ring node")
      assert(r.getAs[Long]("aa_units") === u)
      assert(r.getAs[Double]("aa_score") ===
        BigDecimal(u / 1000000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // ties resolve by (item_i, item_j): reproduce the exact head from
    // the closed-form candidate set (x left of the shared node s, y
    // right of it, x≁y by construction)
    val candidates = (0 until K).iterator.flatMap { i =>
      val s = ((i + 1) * Stride) % N
      val left = (0 until M).map(j => (i * Stride + j) % N).filter(_ != s)
      val right = (0 until M).map(j => ((i + 1) * Stride + j) % N).filter(_ != s)
      for (x <- left.iterator; y <- right) yield (math.min(x, y).toLong, math.max(x, y).toLong)
    }.toSeq
    assert(candidates.size === K * Stride * Stride)
    val expectedHead = candidates.distinct.sorted.take(GraphRank.AaTop)
    assert(out.map(r => (r.getAs[Long]("item_i"), r.getAs[Long]("item_j"))).toSeq
      === expectedHead)
  }
}
