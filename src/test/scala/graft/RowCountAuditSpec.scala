package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry gate-vacuity audit (ScaleTest-tagged like
  * [[PlanAuditSpec]]: executes every query, minutes).
  *
  * The hazard (r9 verdict "what's wrong" #1): a query whose output is
  * EMPTY at the driver's gate SF hash-matches its oracle vacuously —
  * 0 == 0 proves nothing about the operator. q_media_neardup sat in
  * exactly that state at sf0.01 for a round (its sf0.1 run is the
  * real evidence). This audit makes the class mechanical the same way
  * global windows, cartesians and fact-table rescans got their
  * sweeps: every registered query must emit ≥ 1 row at the smallest
  * checked SF, and any exception must be DECLARED below and must
  * prove non-vacuity at the largest checked SF instead — so a future
  * zero-row query fails loudly either way, and a stale exception
  * (query no longer empty) fails the staleness pin.
  *
  * Current exception list: EMPTY — as of r10 every one of the
  * registry's queries produces rows at sf0.001 (q_media_neardup's
  * empty SF is 0.01, not 0.001; the per-SF gates cover it at 0.001
  * and 0.1). If a future fixture regeneration or a new sparse-output
  * query empties one at sf0.001, it must be added here WITH its
  * larger-SF proof, not silently.
  */
class RowCountAuditSpec extends AnyFunSuite with SparkFixture {

  /** Queries legitimately empty at [[sfTest]]; each must be
    * non-vacuous at [[sfBig]] (asserted below). */
  private val EmptyAtTiny: Set[String] = Set.empty

  private val sfTiny = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.1"

  test("every registered query emits >= 1 row at a checked SF", ScaleTest) {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val zero = names.filter { n =>
      SparkEntry.queries(n)(spark, sfTiny).count() == 0L
    }.toSet
    assert((zero -- EmptyAtTiny).isEmpty,
      s"queries with a VACUOUS (zero-row) gate at sf0.001 — their oracle " +
        s"hash-match proves nothing; fix the query or declare the exception " +
        s"with a larger-SF proof: " + (zero -- EmptyAtTiny).toSeq.sorted.mkString(", "))
    assert((EmptyAtTiny -- zero).isEmpty,
      s"stale EmptyAtTiny entries (no longer empty at sf0.001) — prune: " +
        (EmptyAtTiny -- zero).toSeq.sorted.mkString(", "))
    EmptyAtTiny.toSeq.sorted.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sfBig).count() > 0L,
        s"$n is empty at EVERY checked SF — the correctness gate never " +
          s"exercises it; the query needs a fixture-reachable output")
    }
  }
}
