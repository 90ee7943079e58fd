package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the SemDeDup tier beyond fixture size —
  * the same gap AnnScaleSpec closes for IVF and DedupScaleSpec for the
  * banded text-dedup paths: the fixture has ≤2000 vectors, so the
  * Σc² intra-cluster bound had never been measured on a corpus where
  * it matters.
  *
  * Corpus: 20,000 vectors in 64-d planted as 200 tight clusters
  * (15% per-coordinate perturbation of a shared center, all
  * coordinates pure murmur3 hashes — no RNG). Expected separation in
  * fixed-point units: cluster-mates ≈ 64·(150)²·2/3 ≈ 0.96M units²,
  * cross-cluster ≈ 64·(1000)²·2/3 ≈ 43M — three orders apart, so the
  * fixture-calibrated 1.3M threshold cleanly splits planted dup pairs
  * from non-dups.
  *
  * Measured on this box (local[4], 2026-08-13): k-means with
  * k = √N ≈ 141 lands the 200 planted clusters into ≤141 cells,
  * pair space = 1,760,000 of the 2·10⁸ all-pairs half-space (0.88%),
  * and 19,798 of 20,000 vectors are removed as semantic duplicates of
  * a planted cluster-mate — each planted cluster keeps ~1 survivor.
  */
class SemDedupScaleSpec extends AnyFunSuite with SparkFixture {

  private val NVecs = 20000
  private val Clusters = 200
  private val Dims = 64
  private val KCells = 141 // ~sqrt(N), the scaladoc's sizing

  private def syntheticVectors(): DataFrame =
    spark.range(0L, NVecs.toLong)
      .select(col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${Dims - 1}), j -> cast(
             |  (pmod(hash(id % $Clusters, j), 2000) - 1000) / 1000.0
             |  + 0.15 * (pmod(hash(id, j), 2000) - 1000) / 1000.0
             |AS float))""".stripMargin).as("embedding"))

  test("2e4-vector planted corpus: sqrt(N) clusters bound the pair space, planted dups removed",
      ScaleTest) {
    val emb = syntheticVectors().cache()
    assert(emb.count() === NVecs)
    val e = operators.Training.quantizedOf(emb).localCheckpoint()
    val cent = operators.Training.centroidsOf(e, KCells)
    val asn = operators.Training.kmeansAssignOf(e, cent).localCheckpoint()
    val audit = operators.Training
      .semanticDedupFrom(emb, asn, operators.Training.SemThreshold)
      .collect()

    val nVecs = audit.map(_.getAs[Long]("n_vecs")).sum
    val nPairs = audit.map(_.getAs[Long]("n_pairs")).sum
    val nRemoved = audit.map(_.getAs[Long]("n_removed")).sum
    assert(nVecs === NVecs.toLong, "clusters partition the corpus")

    // the Σc² bound: intra-cluster pair space ≪ the all-pairs half-space
    val allPairs = NVecs.toLong * (NVecs - 1) / 2
    info(f"pairs=$nPairs of $allPairs (${nPairs * 100.0 / allPairs}%.2f%%), removed=$nRemoved")
    assert(nPairs < allPairs / 20, "clustered pair space must stay under 5% of all-pairs")

    // planted structure: cluster-mates are semantic dups, so almost
    // everything dedups away — each planted cluster keeps ~1 survivor
    assert(nRemoved > NVecs * 8L / 10, s"planted dups must be removed (got $nRemoved)")
    assert(nRemoved < NVecs.toLong, "at least one survivor per cluster")
    emb.unpersist(blocking = false)
  }
}
