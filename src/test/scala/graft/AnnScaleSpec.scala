package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the IVF kNN tier beyond fixture size.
  *
  * The embeddings fixture is 500 vectors at every SF, so the cell-probe
  * candidate generator had never run on a corpus large enough to stress
  * candidate volume — the N·probe/cells claim was an argument, not a
  * measurement (the same gap DedupScaleSpec closed for the banded dedup
  * paths). This spec synthesizes a clustered 100,000-vector corpus by
  * deterministic construction (every coordinate is a pure hash of
  * cluster/point/dimension indices — no RNG) and runs the REAL
  * frame-parameterized operators with the scale sizing the scaladoc
  * prescribes: cells ≈ √N, multi-probe 4.
  *
  * Corpus: 1,000 clusters × 100 points in 64-d; a point perturbs its
  * cluster center by 15% per coordinate, so true neighbors are
  * cluster-mates and the planted structure gives an unambiguous
  * ground truth (computed by the exact tier itself).
  *
  * Measured on this box (local[4], 2026-08-13, N = 100k, 256 cells,
  * probe 4, 50 queries): candidates = 78,559 = 1.57% of the 5·10⁶
  * brute-force pair space — within noise of the probe/cells = 4/256
  * ≈ 1.6% model — and recall@5 = 1.000 against the exact tier (the
  * planted clusters keep true neighbors inside probed cells).
  */
class AnnScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.Similarity

  private val NVecs = 100000
  private val Clusters = 1000
  private val Dims = 64
  private val ScaleCells = 256 // ~sqrt(N), the standard IVF sizing
  private val ScaleProbe = 4
  private val ScaleQueries = 50
  private val ScaleK = 5

  /** Deterministic clustered corpus: coordinate j of point i =
    * center(i % Clusters, j) + 0.15 · noise(i, j), both drawn from
    * murmur3 hashes mapped into [-1, 1).
    */
  private def syntheticVectors(n: Long = NVecs.toLong): DataFrame =
    spark.range(0L, n)
      .select(col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${Dims - 1}), j -> cast(
             |  (pmod(hash(id % $Clusters, j), 2000) - 1000) / 1000.0
             |  + 0.15 * (pmod(hash(id, j), 2000) - 1000) / 1000.0
             |AS float))""".stripMargin).as("embedding"))

  test("1e6-vector corpus at sqrt(N) = 1000 cells: balanced index, bounded probe, recall floor",
      ScaleTest) {
    // the order-of-magnitude step past the 1e5 test below: 10^9 scored
    // (vector, centroid) pairs feed the map-side argmax — the r8
    // assignment shape whose shuffle moves one slim row per vector
    // (the old corpus-sized window would have shuffled ~300 GB here
    // scaled to embeddings; see cellAssignFrom's scaladoc)
    val n = 1000000L
    val cells = 1000 // = sqrt(N), the standard IVF sizing
    val probe = 4
    val nq = 20
    val e = syntheticVectors(n).cache()
    assert(e.count() === n)

    // index balance: with centroids drawn one-per-planted-cluster
    // (vec_id < 1000 covers each cluster exactly once), every cell
    // must be populated and no cell may degenerate to a hot partition
    val t0 = System.nanoTime()
    val cellSizes = Similarity.cellAssignFrom(e, cells)
      .groupBy("cid").agg(count(lit(1)).as("n")).collect()
    val assignSec = (System.nanoTime() - t0) / 1e9
    info(f"assignment pass (10^9 scored pairs): $assignSec%.1f s")
    assert(cellSizes.length === cells, "every cell must be non-empty")
    assert(cellSizes.map(_.getAs[Long]("n")).sum === n)
    val maxCell = cellSizes.map(_.getAs[Long]("n")).max
    info(s"max cell = $maxCell (mean = ${n / cells})")
    assert(maxCell <= 5L * (n / cells),
      s"cell skew: max $maxCell vs mean ${n / cells}")

    // one cached candidate pass serves both the volume count and the
    // ranked answer (rankIvf)
    val scored = Similarity.ivfScored(e, cells, probe, nq).cache()
    val candidates = scored.count()
    val brutePairs = nq * (n - 1)
    val frac = candidates.toDouble / brutePairs
    info(f"candidates=$candidates of $brutePairs (${frac * 100}%.3f%%; model ${probe * 100.0 / cells}%.1f%%)")
    assert(candidates > 0L)
    assert(frac < 0.05, f"probe degenerated toward a scan: $frac%.4f")

    val truth = Similarity.knnBruteFrom(e, nq, ScaleK).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val approx = Similarity.rankIvf(scored, ScaleK).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val recall = hits.sum / hits.size
    info(f"recall@$ScaleK = $recall%.3f over ${truth.size} queries")
    assert(recall >= 0.9,
      f"planted clusters must keep neighbors inside probed cells: $recall%.3f")
    scored.unpersist(blocking = false)

    // full recall-vs-cost curve at the same 10^6 x 1000-cell scale —
    // feasible ONLY because the r8 cumulative-histogram rewrite made
    // the curve O(candidates + cells); the r7 explode form would have
    // planned ~10^10 rows here. Self-check row + monotonicity + the
    // IVF recall floor at the operating point.
    val curve = Similarity.ivfRecallCurveFrom(e, cells, 8, ScaleK)
      .collect().sortBy(_.getAs[Long]("probe"))
    assert(curve.last.getAs[Long]("probe") === cells.toLong)
    assert(curve.last.getAs[Long]("recall_bp") === 10000L,
      "the full-probe row IS the ground truth: recall must be exactly 10000 bp")
    val bps = curve.map(_.getAs[Long]("recall_bp"))
    val cnds = curve.map(_.getAs[Long]("n_candidates"))
    assert(bps.zip(bps.tail).forall { case (a, b) => a <= b }, "recall must be monotone in probe depth")
    assert(cnds.zip(cnds.tail).forall { case (a, b) => a <= b }, "cost must be monotone in probe depth")
    val atProbe = curve.find(_.getAs[Long]("probe") === probe.toLong).get
    info(s"curve@probe=$probe: recall_bp=${atProbe.getAs[Long]("recall_bp")} " +
      s"candidates=${atProbe.getAs[Long]("n_candidates")}")
    assert(atProbe.getAs[Long]("recall_bp") >= 9000L,
      "planted clusters must reach >=0.9 recall at the operating probe depth")
    e.unpersist(blocking = false)
  }

  test("1e5-vector corpus: sqrt(N) cells bound candidates, multi-probe recall holds",
      ScaleTest) {
    val e = syntheticVectors().cache()
    assert(e.count() === NVecs)

    // ground truth from the exact tier (broadcast query side)
    val truth = Similarity.knnBruteFrom(e, ScaleQueries, ScaleK)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    // candidate volume: the scored join the probe actually pays
    val candidates = Similarity.ivfScored(e, ScaleCells, ScaleProbe, ScaleQueries).count()
    val brutePairs = ScaleQueries.toLong * (NVecs - 1)
    val frac = candidates.toDouble / brutePairs
    info(f"candidates=$candidates vs brute=$brutePairs (${frac * 100}%.2f%%)")
    // probe/cells = 4/256 ≈ 1.6% expected; allow skewed cells headroom
    assert(candidates > 0L)
    assert(frac < 0.10, f"cell probe degenerated to a near-scan: $frac%.3f")

    // recall@K of the scale-sized probe against the exact tier
    val approx = Similarity.knnIvfFrom(e, ScaleCells, ScaleProbe, ScaleQueries, ScaleK)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val recall = hits.sum / hits.size
    info(f"recall@$ScaleK = $recall%.3f over ${truth.size} queries")
    assert(recall >= 0.9,
      f"clustered corpus must keep its neighbors inside probed cells: $recall%.3f")
    e.unpersist(blocking = false)
  }

  test("composed IVF->PQ retrieval at 1e5 vectors: shortlist bounded, recall floor vs exact L2",
      ScaleTest) {
    // the production composition (cell shortlist -> ADC top-R -> exact
    // re-rank) against its own ground truth: exact integer-L2 top-K
    // over the full corpus, recomputed driver-side from the identical
    // quantization q = round((v+1)*KmScale)
    val n = 100000
    val cells = 316 // ~sqrt(N)
    val nq = 20
    val e = syntheticVectors(n.toLong).cache()
    assert(e.count() === n.toLong)
    val es = operators.Training.pqSubOf(operators.Training.quantizedOf(e))
      .localCheckpoint() // codebook training + codes + LUT + re-rank all read it
    val cent = operators.Training.pqCodebooksOf(es)
    val got = Similarity.ivfPqFrom(e, es, cent, cells, ScaleProbe, nq,
        Similarity.IvfPqRerank, ScaleK).collect()
    assert(got.length === nq * ScaleK, "every query must fill its top-K")
    val approx = got.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    // driver-side exact ground truth on the same integer quantization
    val vecs = e.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.round((v + 1.0) * operators.Training.KmScale)).toArray
    }.toMap
    val truth = (0L until nq.toLong).map { q =>
      val qv = vecs(q)
      val top = vecs.iterator.filter(_._1 != q).map { case (id, v) =>
        var d = 0L; var j = 0
        while (j < v.length) { val t = v(j) - qv(j); d += t * t; j += 1 }
        (d, id)
      }.toArray.sortBy(identity).take(ScaleK).map(_._2).toSet
      q -> top
    }.toMap
    val hits = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size.toDouble / t.size }
    val recall = hits.sum / hits.size
    info(f"composed IVF->PQ recall@$ScaleK = $recall%.3f over $nq queries")
    assert(recall >= 0.8,
      f"cell shortlist + ADC top-${Similarity.IvfPqRerank} + exact re-rank must keep " +
        f"planted neighbors: $recall%.3f")
    // the re-rank must actually work for its keep: every returned rank
    // is ordered by the exact distance, and the shortlist the ADC saw
    // is a probe-bounded fraction of the corpus
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("exact_dist_units"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b })
    }

    // the re-rank-depth tuning curve at the same scale: recall vs the
    // exact top-K of the full shortlist must be monotone in R, and the
    // R = IvfPqRerank operating point must justify the buffer
    val curve = Similarity.ivfPqRerankCurveFrom(e, es, cent, cells,
        ScaleProbe, nq, Similarity.IvfPqRerank, ScaleK)
      .collect().sortBy(_.getAs[Long]("rerank"))
    assert(curve.length === Similarity.IvfPqRerank)
    val bps = curve.map(_.getAs[Long]("recall_bp"))
    assert(bps.zip(bps.tail).forall { case (a, b) => a <= b },
      "recall must be monotone in re-rank depth")
    info(s"rerank curve: R=$ScaleK -> ${bps(ScaleK - 1)} bp, " +
      s"R=${Similarity.IvfPqRerank} -> ${bps.last} bp")
    assert(bps.last >= 8000L,
      s"the R=${Similarity.IvfPqRerank} buffer must recover >=0.8 of the " +
        s"exact-shortlist answer: ${bps.last} bp")
    e.unpersist(blocking = false)
  }

  test("mutual-kNN at sqrt(N) cells: edges bounded, planted clusters dominate",
      ScaleTest) {
    // 20k-vector slice (√N ≈ 141 cells): the within-cell pair space is
    // Σ|cell|² ≈ N·√N — the linear-in-N-per-cell sizing the operator's
    // scaladoc prescribes, exercised far beyond the 500-vector fixture
    val n = 20000
    val cells = 141
    val e = syntheticVectors().where(col("vec_id") < n).cache()
    assert(e.count() === n.toLong)
    val edges = Similarity.mutualEdgesFrom(e, cells, Similarity.MknnK).collect()
    info(s"mutual edges: ${edges.length}")
    // mutuality bound: each vertex contributes at most K directed
    // edges, a mutual pair consumes two
    assert(edges.length > 0)
    assert(edges.length <= n * Similarity.MknnK / 2)
    edges.foreach { r =>
      assert(r.getAs[Long]("src") < r.getAs[Long]("dst"))
    }
    // the planted structure: true neighbors are cluster-mates, so
    // mutual edges must overwhelmingly stay within a planted cluster
    val intra = edges.count { r =>
      r.getAs[Long]("src") % Clusters == r.getAs[Long]("dst") % Clusters
    }
    val share = intra.toDouble / edges.length
    info(f"intra-cluster mutual-edge share = $share%.3f")
    assert(share >= 0.9,
      f"mutual edges should connect planted cluster-mates: $share%.3f")
    e.unpersist(blocking = false)
  }
}
