package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the perceptual media tier beyond fixture
  * size — the media twin of [[DedupScaleSpec]]'s text runs. The r8
  * round proved the banding machinery at 10⁵ TEXT SimHash signatures
  * and reused it verbatim for the aHash tier, but the media path
  * itself (payload → grid cells → integer-cross-product bits →
  * banding → CC survivor tally) had only fixture-scale evidence. This
  * spec plants a 100,000-payload corpus whose aHash signatures are
  * EXACTLY controllable and replays every stage driver-side.
  *
  * Construction: each payload is [[operators.Multimodal.AHashCells]]
  * cells × CellLen bytes, cell c all 'b' (98) where the planted
  * 31-bit pattern has bit c set, else all 'a' (97). With at least one
  * 0-bit (bit 31 never set), the global mean sits strictly between 97
  * and 98, so the integer cross-product rule lights EXACTLY the
  * planted bits — expected signature == planted pattern, bit for bit.
  * Families get avalanche-mixed base patterns; copy cp flips cp%3
  * copy-dependent bit positions, planting pairs at Hamming 0/1/2
  * around [[operators.Dedup.MaxHamming]] = 2 (and some at 3-4 that
  * must NOT appear).
  *
  * Measured on this box (local[4], 2026-08-15, n = 100,000): see the
  * committed BASELINE.md r9 row.
  */
class MediaScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.{Dedup, Multimodal, PipelineOps}

  private val Families = 5000
  private val Copies = 20 // n = 100,000 payloads
  private val CellLen = 4 // bytes per grid cell -> 128-byte payloads

  /** splitmix-style avalanche to a 31-bit pattern (bit 31 stays 0 so
    * the all-ones signature degeneracy is unreachable). */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & 0x7FFFFFFFL
  }

  private def pattern(fam: Long, cp: Long): Long = {
    var p = mix(fam)
    var i = 0
    while (i < (cp % 3).toInt) { p ^= 1L << ((cp * 7 + i * 11) % 31).toInt; i += 1 }
    p
  }

  private def payload(p: Long): String = {
    val sb = new StringBuilder(Multimodal.AHashCells * CellLen)
    var c = 0
    while (c < Multimodal.AHashCells) {
      val ch = if (((p >> c) & 1L) == 1L) 'b' else 'a'
      var j = 0
      while (j < CellLen) { sb.append(ch); j += 1 }
      c += 1
    }
    sb.toString
  }

  test("1e5-payload aHash tier: exact signature parity, pair parity, candidate bound, canonical tally",
      ScaleTest) {
    val n = Families * Copies
    val rows = (0 until n).map { id =>
      val fam = id.toLong / Copies
      val cp = id.toLong % Copies
      (id.toLong, payload(pattern(fam, cp)), s"s${fam % 7}")
    }
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text", "source").repartition(32).cache()
    assert(docs.count() === n.toLong)

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // ---- stage 1: payload -> grid -> signature, bit-exact vs the plant
    val sigRows = timed("aHash signatures (12.8M exploded cells)") {
      Multimodal.aHashSigsFrom(docs).collect()
    }
    assert(sigRows.length === n)
    sigRows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = pattern(id / Copies, id % Copies)
      assert(r.getAs[Long]("sig") === expected,
        s"doc $id signature diverged from the planted pattern")
    }

    // ---- driver replay of the pair set: distinct patterns first (the
    // corpus holds ~14 variants per family), then expand value-pairs
    // to id-pairs — exact, covers planted AND accidental cross-family
    // closeness
    val idsByPat = (0 until n).groupBy(id => pattern(id.toLong / Copies, id.toLong % Copies))
    val pats = idsByPat.keys.toArray
    val expectPairs = timed(s"driver replay over ${pats.length} distinct patterns") {
      val buf = scala.collection.mutable.HashSet.empty[(Long, Long)]
      // same-pattern groups: all internal pairs at Hamming 0
      idsByPat.valuesIterator.foreach { ids =>
        var i = 0
        while (i < ids.length) {
          var j = i + 1
          while (j < ids.length) {
            buf += ((ids(i).toLong, ids(j).toLong)); j += 1
          }
          i += 1
        }
      }
      // cross-pattern pairs within the Hamming radius
      var i = 0
      while (i < pats.length) {
        var j = i + 1
        while (j < pats.length) {
          if (java.lang.Long.bitCount(pats(i) ^ pats(j)) <= Dedup.MaxHamming) {
            for (a <- idsByPat(pats(i)); b <- idsByPat(pats(j)))
              buf += ((math.min(a, b).toLong, math.max(a, b).toLong))
          }
          j += 1
        }
        i += 1
      }
      buf
    }
    info(s"replay expects ${expectPairs.size} pairs")
    assert(expectPairs.size > 100000, "construction should plant >1e5 near-dup pairs")

    // ---- stage 2: the real banded pair path, pair-for-pair
    val got = timed("mediaNearDupFrom (banded pairs + md5 flags)") {
      Multimodal.mediaNearDupFrom(docs).collect()
    }
    val gotPairs = got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(gotPairs.size === got.length, "pair list must be duplicate-free")
    assert(gotPairs === expectPairs.toSet,
      s"banded pair set diverged: got ${gotPairs.size}, expected ${expectPairs.size}")
    // the perceptual catch: byte-identical copies flag is_exact = 1,
    // perturbed re-encodes (most of the set) flag 0 — both present
    val exactN = got.count(_.getAs[Int]("is_exact") == 1)
    info(s"pairs: ${got.length} total, $exactN byte-identical, ${got.length - exactN} perceptual-only")
    assert(exactN > 0, "same-payload copies must flag is_exact")
    assert(got.length - exactN > exactN,
      "the perceptual tier's reason to exist: most planted pairs must be md5-invisible")

    // ---- banding candidate bound (the claim that makes 10^9 feasible)
    val pairSpace = n.toLong * (n - 1) / 2
    val cands = timed("banding candidates") {
      Dedup.simhashCandidatesFromSigs(
        Multimodal.aHashSigsFrom(docs), Dedup.MaxHamming + 1).count()
    }
    info(s"candidates: $cands of $pairSpace (${cands * 100.0 / pairSpace}%)")
    assert(cands < pairSpace / 100,
      s"banding must prune >99% of the pair space, emitted $cands")

    // ---- stage 3: CC survivor tally vs a driver union-find replay
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }; r }
    expectPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val removedIds = (0 until n).filter(id => find(id) != id)
    val bySource = removedIds.groupBy(id => s"s${(id / Copies) % 7}").map { case (s, ids) => s -> ids.size }
    val tally = timed("mediaCanonicalFrom (shared CC fixpoint)") {
      Multimodal.mediaCanonicalFrom(docs,
        PipelineOps.ccLabels(Multimodal.mediaNearDupFrom(docs).select("doc_a", "doc_b")))
        .collect()
    }
    val payloadBytes = (Multimodal.AHashCells * CellLen).toLong
    val payloadsBySource = (0 until n).groupBy(id => s"s${(id / Copies) % 7}")
      .map { case (s, ids) => s -> ids.size.toLong }
    tally.foreach { r =>
      val s = r.getAs[String]("source")
      val expectedRemoved = bySource.getOrElse(s, 0).toLong
      assert(r.getAs[Long]("n_payloads") === payloadsBySource(s),
        s"source $s payload count diverged")
      assert(r.getAs[Long]("n_removed") === expectedRemoved,
        s"source $s removed-count diverged")
      assert(r.getAs[Long]("bytes_saved") === expectedRemoved * payloadBytes)
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_payloads") - expectedRemoved)
    }
    assert(tally.map(_.getAs[Long]("n_payloads")).sum === n.toLong)
    assert(tally.map(_.getAs[Long]("n_removed")).sum === removedIds.size.toLong)
    docs.unpersist(blocking = false)
  }

  test("q_media_neardup is non-vacuous on the sf0.1 fixture", ScaleTest) {
    // the driver's sf0.01 correctness row for this query matches 0 == 0
    // rows, so the committed gate alone never exercised the
    // pair/is_exact path (ADVICE r8); this pins that the corpus the
    // full sf0.1 gate runs actually produces near-dup pairs, so a
    // regression can't hide behind an empty==empty hash-match
    val sf01 = "/root/testdata/sf0.1"
    if (new java.io.File(sf01).isDirectory) {
      val pairs = operators.Multimodal.mediaNearDup(spark, sf01).collect()
      info(s"sf0.1 near-dup pairs: ${pairs.length}")
      assert(pairs.nonEmpty,
        "sf0.1 must plant at least one perceptual near-dup pair; " +
          "if the fixture generation changed, re-check the aHash gate")
    } else cancel(s"$sf01 fixture not present")
  }
}
