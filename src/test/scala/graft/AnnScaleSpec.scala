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

  /** The selectivity trap measured at scale, parameterized by label
    * rarity: a planted ~(1/mod) label (pmod(hash(id), mod) == 0 —
    * deterministic, independent of the cluster geometry) makes
    * search-then-filter at buffer K nearly vacuous, while
    * filter-then-search keeps every REACHABLE truth member
    * (structural identity asserted with zero slack), and the recovery
    * curve shows the buffer ≈ K/selectivity folklore as numbers.
    * `bufWide` = the rule-of-thumb recovery buffer for that rarity. */
  private def filteredSelectivityCase(mod: Int, bufWide: Int): Unit = {
    val n = 100000
    val cells = 316
    val nq = 20
    val lbl = 1
    val e = syntheticVectors(n.toLong)
      .withColumn("label",
        when(pmod(hash(col("vec_id")), lit(mod)) === 0, lbl).otherwise(0))
      .cache()
    assert(e.count() === n.toLong)
    val sel = e.where(col("label") === lbl).count()
    info(f"planted selectivity = ${sel * 100.0 / n}%.2f%% ($sel of $n)")
    assert(sel > 0 && sel < n / 20, "the label must be selective")

    // shared passes, exactly as the registry queries share them
    val cand = Similarity.filteredCandFrom(e, cells, ScaleProbe, nq).localCheckpoint()
    val truthAgg = Similarity.filteredTruthFrom(e, nq, ScaleK, lbl).localCheckpoint()
    val truthSet = truthAgg
      .select(col("query_id"), explode(col("tk")).as("t"))
      .select(col("query_id"), col("t.id").as("neighbor_id"))
    val totalTruth = truthAgg.agg(sum("n_truth")).collect()(0).getLong(0)
    // the recall ceiling NO post-filter buffer can beat: truth members
    // whose cell the query never probed are unreachable at any depth
    val reachable = truthSet.join(cand.where(col("label") === lbl),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"truth=$totalTruth reachable-in-probed-cells=$reachable")

    val summary = Similarity.knnFilteredFrom(e, cells, ScaleProbe, nq, ScaleK,
        lbl, candOpt = Some(cand), truthOpt = Some(truthAgg)).collect()
    val preHits = summary.filter(_.getAs[String]("mode") == "pre")
      .map(_.getAs[Long]("n_hits")).sum
    val postHits = summary.filter(_.getAs[String]("mode") == "post")
      .map(_.getAs[Long]("n_hits")).sum
    info(f"pre recall = ${preHits * 100.0 / totalTruth}%.1f%% " +
      f"post@K recall = ${postHits * 100.0 / totalTruth}%.1f%%")
    // structural identity: a truth member inside the filtered candidate
    // set has < K filtered candidates above it, so the pre-filter top-K
    // recovers EVERY reachable truth member — no slack in this bound
    assert(preHits === reachable,
      s"pre-filter must recover every reachable truth member: $preHits vs $reachable")
    // the crater: at ~2% selectivity the unfiltered top-K almost never
    // contains a labeled vector
    assert(postHits * 2 <= preHits,
      s"search-then-filter at buffer K must visibly crater: $postHits vs $preHits")

    val curve = Similarity.knnFilteredCurveFrom(e, cells, ScaleProbe, nq,
        ScaleK, lbl, bufWide, candOpt = Some(cand), truthOpt = Some(truthAgg))
      .collect().sortBy(_.getAs[Long]("buffer"))
    assert(curve.length === bufWide)
    val hitsByBuf = curve.map(_.getAs[Long]("n_hits"))
    assert(hitsByBuf.zip(hitsByBuf.tail).forall { case (a, b) => a <= b },
      "post-filter hits must be monotone in buffer depth")
    val atK = hitsByBuf(ScaleK - 1)
    val atWide = hitsByBuf.last
    assert(atK === postHits, "the buffer-K row IS the post mode of the summary")
    info(s"recovery: buffer=$ScaleK -> $atK hits, buffer=$bufWide -> $atWide " +
      s"(ceiling $reachable)")
    // where the recovery crosses 80% of the ceiling — the measured
    // buffer a post-filter deployment would have to pay at this rarity
    val crossAt = hitsByBuf.indexWhere(_ * 10 >= reachable * 8) + 1
    info(s"80%-of-ceiling crossing at buffer=$crossAt (folklore K/sel = $bufWide)")
    assert(atWide > atK, "widening the buffer must recover recall")
    assert(atWide * 10 >= reachable * 8,
      s"the K/selectivity buffer must recover >=80% of the reachable ceiling: " +
        s"$atWide vs $reachable")
    e.unpersist(blocking = false)
  }

  test("filtered ANN at 1e5 vectors with a planted 2% label: post-filter craters, " +
      "buffer widening recovers toward the pre-filter ceiling", ScaleTest) {
    filteredSelectivityCase(mod = 50, bufWide = 250) // ≈ K / 0.02
  }

  test("filtered ANN at 1e5 vectors with a planted 1% label: the regime where " +
      "buffer widening genuinely fights probe widening", ScaleTest) {
    // r10 verdict #6: the fixture pins ~10%, the 2% case pins the
    // crater; at 1% the post-filter buffer must widen to ~K/0.01 ADC
    // evaluations per query to recover — 100× the pre-filter's kept
    // set — which is the measured argument for filter-then-search at
    // real-world predicate rarities
    filteredSelectivityCase(mod = 100, bufWide = 500) // ≈ K / 0.01
  }

  test("incremental ingest into a frozen index: assignment parity with a rebuild " +
      "when the quantizer survives the split", ScaleTest) {
    // the steady-state growth path on planted data: the batch is the
    // LAST 20% of vec_ids (arrival order — how a corpus actually
    // grows), so every centroid id (< cells) stays resident and the
    // frozen quantizer IS the rebuilt quantizer. Then incremental
    // assignment must be BIT-IDENTICAL to a from-scratch rebuild —
    // zero drift in every cell — and the frozen-index search must
    // match the rebuilt-index search row for row.
    val n = 100000L
    val cut = 80000L
    val cells = 316
    val nq = 20
    val e = syntheticVectors(n).cache()
    val base = e.where(col("vec_id") < cut)
    assert(e.count() === n)

    val growth = Similarity.ivfIngestFrom(e, base, cells).collect()
    assert(growth.length === cells, "every frozen cell must appear")
    assert(growth.map(_.getAs[Long]("n_drift")).sum === 0L,
      "unchanged centroids => incremental assignment == rebuild, zero drift")
    assert(growth.map(_.getAs[Long]("n_new")).sum === n - cut)
    assert(growth.map(_.getAs[Long]("n_total")).sum === n)
    val maxGrowth = growth.map(_.getAs[Long]("growth_bp")).max
    info(s"max per-cell growth = $maxGrowth bp " +
      s"(uniform arrival would be ${(n - cut) * 10000 / cut} bp)")

    val recall = Similarity.ivfIngestRecallFrom(e, base, cells, ScaleProbe,
        nq, ScaleK).collect()
    val byVariant = recall.map(r =>
      r.getAs[String]("variant") -> r.getAs[Long]("n_hits")).toMap
    info(s"frozen=${byVariant("frozen")} rebuilt=${byVariant("rebuilt")} " +
      s"of ${recall.head.getAs[Long]("n_truth")}")
    assert(byVariant("frozen") === byVariant("rebuilt"),
      "identical quantizers must retrieve identically")
    e.unpersist(blocking = false)
  }

  test("filtered composed IVF->PQ at 2e4 vectors: exact on the reachable labeled set",
      ScaleTest) {
    // the structural identity for the composed filtered tier: when the
    // filtered candidate count per query fits inside the ADC buffer
    // (selectivity makes the expensive stage SMALLER — the pre-filter
    // argument), the ADC top-R contains every reachable labeled
    // candidate and the exact re-rank therefore returns EXACTLY the
    // quantized-L2 top-K of {labeled vectors in probed cells} — which
    // this test replays driver-side, integer for integer, no slack
    val n = 20000L
    val cells = 141
    val nq = 10
    val lbl = 1
    val e = syntheticVectors(n)
      .withColumn("label",
        when(pmod(hash(col("vec_id")), lit(30)) === 0, lbl).otherwise(0))
      .cache()
    assert(e.count() === n)
    val es = operators.Training.pqSubOf(operators.Training.quantizedOf(e))
      .localCheckpoint()
    val cent = operators.Training.pqCodebooksOf(es)
    val got = Similarity.ivfPqFrom(e, es, cent, cells, ScaleProbe, nq,
        Similarity.IvfPqRerank, ScaleK, labelOpt = Some(lbl)).collect()

    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    got.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) === lbl,
        "every returned neighbor must satisfy the predicate")
    }

    // driver replay: probed cells per query (the REAL probe frame),
    // labeled assignment, exact integer quantized-L2
    val probes = Similarity.queryProbesTo(e, e, cells, nq)
      .where(col("crk") <= ScaleProbe).select(col("vec_id"), col("cid"))
      .collect().groupBy(_.getAs[Long]("vec_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cid")).toSet }
    val cidOf = Similarity.cellAssignFrom(e, cells).select("vec_id", "cid")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val vecs = e.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.round((v + 1.0) * operators.Training.KmScale)).toArray
    }.toMap
    val labeledIds = labels.collect { case (id, l) if l == lbl => id }.toSet
    (0L until nq.toLong).foreach { q =>
      val reach = labeledIds.filter(id => id != q && probes(q).contains(cidOf(id)))
      assert(reach.size <= Similarity.IvfPqRerank,
        s"query $q: the filtered candidate set (${reach.size}) must fit the ADC buffer " +
          "for the exactness identity to bind")
      val qv = vecs(q)
      val truth = reach.toSeq.map { id =>
        val v = vecs(id)
        var d = 0L; var j = 0
        while (j < v.length) { val t = v(j) - qv(j); d += t * t; j += 1 }
        (d, id)
      }.sorted.take(ScaleK)
      val mine = got.filter(_.getAs[Long]("query_id") == q)
        .sortBy(_.getAs[Int]("rk"))
        .map(r => (r.getAs[Long]("exact_dist_units"), r.getAs[Long]("neighbor_id")))
      assert(mine.toSeq === truth,
        s"query $q: composed filtered retrieval must equal the exact " +
          s"quantized-L2 top-K of the reachable labeled set")
    }
    info(s"exactness identity held for all $nq queries " +
      s"(reachable labeled candidates per query <= ${Similarity.IvfPqRerank})")
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
