package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the deterministic Lloyd's core beyond the
  * fixture's 2k-vector corpus — the k-means model table now feeds five
  * queries (embed report, SemDeDup, curriculum, purity, validity), so
  * its off-fixture exactness carries the same weight the recurrence
  * specs give PageRank/LPA.
  *
  * Corpus: 102,400 vectors × 64 dims of planted clusters (vector v
  * belongs to cluster v mod 8) with per-cluster-IDENTICAL jitter
  * patterns — every cluster sees the same 16 jitter rows 800 times, so
  * the post-update centroid has the CLOSED FORM center(c,p) +
  * (Σ_j jitter(j,p)) div 16, every member's final distance depends only
  * on its jitter index, and the planted partition is the unique
  * fixpoint from the first-8-ids init (inter-center gaps ≥ 97/dim vs
  * jitter ≤ 5/dim). Agreement is integer equality of the full 102k
  * assignment vector, all 512 centroid cells, and every distance.
  */
class KmeansScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.Training

  private val C = Training.KClusters // 8 planted = 8 trained
  private val JitterRows = 16
  private val N = 102400 // divisible by 8·16: every (cluster, jitter) cell equal
  private val D = 64

  private def center(c: Long, p: Long): Long = 500L + (c * 97 + p * 13) % 1201
  private def jitter(j: Long, p: Long): Long = (j * 31 + p * 7) % 11 - 5
  private def q(v: Long, p: Long): Long =
    center(v % C, p) + jitter((v / C) % JitterRows, p)

  test("102k-vector planted corpus: assignment, centroids and distances are exact",
      ScaleTest) {
    val e = spark.range(0L, N.toLong * D)
      .select(expr(s"id div $D").as("vec_id"), (col("id") % D).as("pos"))
      .withColumn("q", expr(
        s"500L + (vec_id % $C * 97 + pos * 13) % 1201" +
          s" + ((vec_id div $C) % $JitterRows * 31 + pos * 7) % 11 - 5"))
      .localCheckpoint()
    val cent = Training.centroidsOf(e, C).collect()
    // closed-form centroid: center + (Σ_j jitter) div 16 (the cluster
    // label is row_number over the first 8 vec_ids, i.e. planted c+1)
    val jitterSum = Array.tabulate(D)(p =>
      (0 until JitterRows).map(j => jitter(j.toLong, p.toLong)).sum)
    assert(cent.length === C * D)
    cent.foreach { r =>
      val cl = r.getAs[Int]("cluster"); val p = r.getAs[Long]("pos")
      val expect = center((cl - 1).toLong, p) +
        Math.floorDiv(jitterSum(p.toInt), JitterRows)
      assert(r.getAs[Long]("c") === expect,
        s"centroid cell (cluster=$cl pos=$p)")
    }
    // every member's distance depends only on its jitter row
    val off = Array.tabulate(D)(p => Math.floorDiv(jitterSum(p), JitterRows))
    val distByJ = Array.tabulate(JitterRows)(j =>
      (0 until D).map { p =>
        val d = jitter(j.toLong, p.toLong) - off(p); d.toLong * d
      }.sum)
    val asn = Training.kmeansAssignOf(e, Training.centroidsOf(e, C))
      .collect()
    assert(asn.length === N)
    asn.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(r.getAs[Int]("cluster") === (v % C).toInt + 1,
        s"vector $v must recover its planted cluster")
      assert(r.getAs[Long]("dist") === distByJ(((v / C) % JitterRows).toInt),
        s"distance of vector $v")
    }
  }
}
