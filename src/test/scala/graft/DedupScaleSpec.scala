package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Marks scale-volume tests excluded from the default `sbt test` run
  * (see build.sbt); run with
  * `sbt 'set Test/testOptions := Seq(); testOnly graft.DedupScaleSpec'`
  * (the build-level `-l` exclude must be cleared: sbt APPENDS `--`
  * args to `Test/testOptions`, and a ScalaTest exclude beats an
  * include of the same tag, so a bare `-- -n graft.ScaleTest` runs
  * nothing).
  */
object ScaleTest extends Tag("graft.ScaleTest")

/** Empirical validation of the banded dedup paths beyond fixture size.
  *
  * The documents fixture is ~500 rows at every SF, so the banded
  * candidate generators (MinHash LSH, k-chunk SimHash) had never been
  * executed on a corpus large enough to stress candidate volume — plan
  * shape was pinned (PlanShapeSpec) but the candidates ≪ n²/2 claim
  * was an argument, not a measurement. This spec synthesizes corpora
  * by deterministic construction (no RNG: every token is a pure
  * function of family/copy/position indices) and measures.
  *
  * Fast tier (always runs): k-chunk SimHash banding equivalence — the
  * banded result at k = 3/4/5 must equal the brute-force Hamming scan
  * pair-for-pair on a 2,000-signature corpus with planted near-dups.
  * Banding only shapes CANDIDATE generation; the exact bit_count
  * verify makes the result k-invariant, and this pins it.
  *
  * Scale tier (tagged [[ScaleTest]]): a 100,000-doc corpus — 5,000
  * families × 20 copies, copy c perturbing p = c mod 10 leading
  * tokens of its family's 50-token text, family vocabularies fully
  * disjoint — written as documents.parquet and run through the REAL
  * operators (same parquet → shingle → band plans Verify runs).
  * Within-family exact shingle Jaccard is the complete ground truth
  * (disjoint vocab ⇒ no cross-family shingle, so the stop-listed
  * inverted index IS exact). Measured on this box (local[4], 2026-08-13):
  * MinHash candidates = 942,531 = 0.019% of the n²/2 ≈ 5·10⁹ pair
  * space, recall 1.0 over the 75,000 ground-truth pairs at j ≥ 0.9;
  * SimHash k=5 emits the identical 147,505-pair set as k=3 while
  * generating 32× fewer candidates (358,884 vs 11,527,384) — the
  * empirical form of "raising k shrinks buckets geometrically", i.e.
  * the knob a 10⁹-doc corpus turns.
  */
class DedupScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.Dedup

  /** Deterministic signature corpus: `families` base signatures (a
    * 32-bit mix of the family index), each with `copies` variants
    * flipping `copy % 5` distinct bit positions (copy-dependent, so
    * variants of one family sit at controlled Hamming distances and
    * different families are unrelated).
    */
  private def syntheticSigs(families: Int, copies: Int): DataFrame = {
    spark.range(0L, families.toLong * copies)
      .select(col("id").as("doc_id"),
        (col("id") / copies).cast("long").as("fam"),
        (col("id") % copies).cast("long").as("cp"))
      // base signature: splitmix-style avalanche of the family index,
      // masked to SimBits bits
      .withColumn("base", expr(
        s"""((fam * 2654435761) ^ ((fam * 2654435761) div 65536) ^ (fam * 40503)) % ${1L << Dedup.SimBits}"""))
      .withColumn("base", expr(s"IF(base < 0, base + ${1L << Dedup.SimBits}, base)"))
      // flip (cp % 5) bits at copy-dependent positions ((cp*7+i*11) % 32).
      // NB sequence(0, -1) is DESCENDING in Spark, so the 0-flip case
      // must short-circuit instead of relying on an empty sequence.
      .withColumn("sig", expr(
        s"""IF(cp % 5 = 0, base,
           |   aggregate(sequence(0, int(cp % 5) - 1),
           |             base,
           |             (acc, i) -> cast(acc ^ shiftleft(1L, int((cp * 7 + i * 11) % ${Dedup.SimBits})) AS bigint)))""".stripMargin))
      .select("doc_id", "sig")
  }

  test("simhash banding is k-invariant and equals the brute-force Hamming scan") {
    val sigs = syntheticSigs(families = 200, copies = 10).cache()
    try {
      // brute force over all 2,000 signatures — ground truth
      val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      val brute = a.crossJoin(b)
        .where(col("doc_a") < col("doc_b") &&
               expr(s"bit_count(sig_a ^ sig_b) <= ${Dedup.MaxHamming}"))
        .select("doc_a", "doc_b")
      val bruteN = brute.count()
      assert(bruteN > 1000, s"construction should plant >1000 near-dup pairs, got $bruteN")
      for (k <- Seq(3, 4, 5)) {
        val banded = Dedup.simhashPairsFromSigs(sigs, k).select("doc_a", "doc_b")
        assert(banded.count() == bruteN, s"k=$k pair count differs from brute force")
        assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
          s"k=$k pair SET differs from brute force")
      }
    } finally sigs.unpersist()
  }

  test("1e5-doc corpus: banded candidates are a vanishing fraction of the pair space, recall holds",
       ScaleTest) {
    val families = 5000
    val copies = 20 // n = 100,000 docs
    val toksPerDoc = 50
    val n = families.toLong * copies
    val dir = "target/scale-corpus"
    // 5,000 families × 20 copies; copy c replaces its family text's
    // p = c mod 10 leading tokens with copy-unique tokens. All vocab
    // is family-scoped ⇒ cross-family Jaccard is exactly 0, so
    // within-family scoring is the COMPLETE ground truth.
    spark.range(0L, n)
      .select(col("id").as("doc_id"),
        (col("id") / copies).cast("long").as("fam"),
        (col("id") % copies).cast("long").as("cp"))
      .withColumn("p", col("cp") % 10)
      .withColumn("text", expr(
        s"""array_join(transform(sequence(0, ${toksPerDoc - 1}),
           |  j -> IF(j < p, printf('r%dy%dz%d', fam, cp, j),
           |               printf('w%dx%d', fam, j))), ' ')""".stripMargin))
      .withColumn("lang", expr("printf('l%d', fam % 5)"))
      .withColumn("source", expr("printf('s%d', fam % 7)"))
      .select("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // ---- MinHash LSH banding through the real parquet-fed operator
    val mhCands = timed("minhash candidate generation")(
      Dedup.minhashCandidates(spark, dir).cache())
    val mhN = timed("minhash candidate count")(mhCands.count())
    val pairSpace = n * (n - 1) / 2
    info(s"minhash candidates: $mhN of $pairSpace possible (${mhN * 100.0 / pairSpace}%)")
    assert(mhN < pairSpace / 100,
      s"banding must prune >99% of the $pairSpace pair space, emitted $mhN")

    // ---- ground truth: exact shingle Jaccard (complete by construction)
    val truth = timed("exact ground truth (stop-listed inverted index)") {
      Dedup.pairScores(spark, dir)
        .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
        .where(col("j") >= 0.9)
        .select("doc_a", "doc_b").cache()
    }
    val truthN = truth.count()
    info(s"ground-truth pairs at j>=0.9: $truthN")
    assert(truthN > 10000, s"construction should plant >10k true pairs, got $truthN")

    // ---- recall of the banding at j >= 0.9 (the q_lsh_recall bar)
    val caught = truth.join(mhCands, Seq("doc_a", "doc_b"), "left_semi").count()
    info(s"minhash banding recall at j>=0.9: $caught/$truthN = ${caught.toDouble / truthN}")
    assert(caught.toDouble / truthN >= 0.9,
      s"recall at j>=0.9 fell below 0.9: $caught/$truthN")

    // ---- SimHash k-chunk banding: k=5 must emit the k=3 pair set
    val sigs = timed("simhash signatures")(
      Dedup.simhashSigs(spark, dir).cache())
    val k3 = timed("simhash pairs k=3")(
      Dedup.simhashPairsFromSigs(sigs, 3).select("doc_a", "doc_b").cache())
    val k3N = k3.count()
    val k5 = timed("simhash pairs k=5")(
      Dedup.simhashPairsFromSigs(sigs, 5).select("doc_a", "doc_b").cache())
    val k5N = k5.count()
    info(s"simhash pairs: k=3 -> $k3N, k=5 -> $k5N")
    assert(k3N == k5N && k5.exceptAll(k3).isEmpty,
      "k=5 combination banding must emit the identical exact pair set")
    val c3 = Dedup.simhashCandidatesFromSigs(sigs, 3).count()
    val c5 = Dedup.simhashCandidatesFromSigs(sigs, 5).count()
    info(s"simhash candidates: k=3 -> $c3, k=5 -> $c5 (of $pairSpace)")
    assert(c3 < pairSpace / 100 && c5 < pairSpace / 100,
      "simhash banding must prune >99% of the pair space at both k")
    Seq(mhCands, truth, sigs, k3, k5).foreach(_.unpersist())
  }
}
