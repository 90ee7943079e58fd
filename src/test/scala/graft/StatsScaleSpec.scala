package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the exact-rank stats machinery beyond
  * fixture size and value domain (the gap the r6 verdict flagged: the
  * coarse-bucket prefix mechanics had only ever run on sf0.1's narrow
  * domains, so their off-fixture correctness was an argument, not a
  * measurement — the same closure AnnScaleSpec gave the IVF tier).
  *
  * Every synthetic corpus is a PURE INTEGER recurrence (id·K mod P),
  * replicated bit-for-bit in local Scala — so the expected histogram /
  * Gini / U statistics are computed by an independent driver-side
  * implementation (flat sorted arrays, textbook formulas) and compared
  * against the distributed two-level-prefix closed forms:
  *
  *  - equi-depth: 1.2M ALL-DISTINCT values over a ~[0, 10^7) domain —
  *    ~2000 coarse buckets (the fixture has ~21), rem = 0 path;
  *  - Gini: 1M customers over ~500k distinct cent values (real tie
  *    groups straddling bucket boundaries), 2S ≈ 5·10^17 exercising
  *    the int64 headroom the docstring claims;
  *  - Mann–Whitney: 1.5M observations in ~100k tie groups with a
  *    planted +20.00 shift on sample A, so z must be large-positive
  *    and every rank moment agrees with the flat-sort recompute
  *    (half-integer rank sums are exact in double, so agreement is
  *    exact, not approximate).
  */
class StatsScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.Stats

  private val MulK = 2654435761L // Knuth's 2^32 golden-ratio multiplier

  test("equi-depth histogram: 1.2M distinct values over a 10^7 domain", ScaleTest) {
    val n = 1200000
    val p = 999999937L
    val vals = spark.range(0L, n.toLong)
      .select(expr(s"cast((id * ${MulK}L) % ${p}L AS double) / 100.0").as("v"))
    val got = Stats.equidepthHistOf(vals, buckets = 10)
      .collect().sortBy(_.getAs[Long]("bucket"))

    val raw = Array.tabulate(n)(i => (i.toLong * MulK) % p)
    assert(raw.distinct.length === n) // injective below P: every value distinct
    val sorted = raw.sorted.map(_.toDouble / 100.0)
    val per = n / 10 // rem = 0: every bucket takes exactly q rows
    assert(got.length === 10)
    for (b <- 1 to 10) {
      val r = got(b - 1)
      val slice = sorted.slice((b - 1) * per, b * per)
      assert(r.getAs[Long]("bucket") === b.toLong)
      assert(r.getAs[Long]("n_rows") === per.toLong)
      assert(r.getAs[Double]("min_v") === slice.head)
      assert(r.getAs[Double]("max_v") === slice.last)
      assert(math.abs(r.getAs[Double]("avg_v") - slice.sum / per) < 1e-3)
    }
  }

  test("gini: 1M customers, tie groups across bucket boundaries", ScaleTest) {
    val n = 1000000
    val p = 500009L
    val rev = spark.range(0L, n.toLong)
      .select((expr(s"(id * ${MulK}L) % ${p}L") + lit(1L)).as("cents"))
    val r = Stats.revenueGiniOf(rev).collect().head

    val cents = Array.tabulate(n)(i => (i.toLong * MulK) % p + 1L).sorted
    val t = cents.foldLeft(BigInt(0))(_ + _)
    val s = cents.zipWithIndex.foldLeft(BigInt(0)) { case (acc, (v, i)) =>
      acc + BigInt(v) * (i + 1L)
    }
    val gini = (2 * BigDecimal(s) - BigDecimal(n + 1L) * BigDecimal(t)).toDouble /
      (n.toDouble * t.toDouble)
    val n0 = n - n / 10
    val topShare = cents.drop(n0).foldLeft(BigInt(0))(_ + _).toDouble / t.toDouble
    assert(2 * s < BigInt(Long.MaxValue), "2S must sit inside the documented int64 headroom")
    assert(r.getAs[Long]("n_customers") === n.toLong)
    assert(r.getAs[Long]("total_cents") === t.toLong)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-6)
    assert(math.abs(r.getAs[Double]("top10_share") - topShare) < 1e-6)
  }

  test("mann-whitney: 1.5M observations, 100k tie groups, planted shift", ScaleTest) {
    val n = 1500000
    val p = 100003L
    val shiftCents = 2000L
    val pairs = spark.range(0L, n.toLong)
      .select(
        (expr(s"cast((id * ${MulK}L) % ${p}L AS double)") +
          when(col("id") % 3 === 0, lit(shiftCents.toDouble)).otherwise(lit(0.0)))
          .divide(lit(100.0)).as("v"),
        (col("id") % 3 === 0).as("is_a"))
    val r = Stats.mannWhitneyOf(pairs).collect().head

    // independent flat recompute: average ranks from one sorted pass
    val obs = Array.tabulate(n) { i =>
      val isA = i % 3 == 0
      val base = (i.toLong * MulK) % p + (if (isA) shiftCents else 0L)
      (base.toDouble / 100.0, isA)
    }.sortBy(_._1)
    var idx = 0
    var r1 = 0.0
    var tie3 = 0L
    var n1 = 0L
    while (idx < n) {
      var j = idx
      while (j < n && obs(j)._1 == obs(idx)._1) j += 1
      val t = (j - idx).toLong
      val avgRank = idx + (t + 1.0) / 2.0 // idx = ranks before the group
      val na = obs.slice(idx, j).count(_._2).toLong
      r1 += na * avgRank
      tie3 += t * t * t - t
      n1 += na
      idx = j
    }
    val n2 = n - n1
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val z = (u1 - n1 * n2 / 2.0) /
      math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3.toDouble / (n.toDouble * (n - 1.0))))
    val rb = 1.0 - 2.0 * u1 / (n1.toDouble * n2)
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(math.abs(r.getAs[Double]("u1") - u1) < 1e-6 * math.abs(u1))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
    assert(math.abs(r.getAs[Double]("rank_biserial") - rb) < 1e-6)
    assert(r.getAs[Double]("z") > 10.0, "the planted +20.00 shift on A must dominate")
  }

  test("qte: 1M-population per-arm order statistics with a planted treatment shift", ScaleTest) {
    val n = 1000000
    val p = 999999937L
    val shift = 50000L // planted uniform +50000 on arm 1
    val perUser = spark.range(0L, n.toLong)
      .select(
        ((col("id") * MulK) % p + when(col("id") % 2 === 1, lit(shift)).otherwise(lit(0L)))
          .as("v"),
        (col("id") % 2).as("arm"))
    val got = operators.Stats.qteOf(perUser)
      .collect().sortBy(_.getAs[Long]("tau"))

    val byArm = (0 to 1).map { a =>
      a.toLong -> Array.tabulate(n / 2) { j =>
        val id = 2L * j + a
        (id * MulK) % p + (if (a == 1) shift else 0L)
      }.sorted
    }.toMap
    assert(got.length === Stats.QteTaus.length)
    got.foreach { r =>
      val tau = r.getAs[Long]("tau")
      def kth(a: Long): Long = {
        val vs = byArm(a); vs(((vs.length.toLong * tau + 99) / 100 - 1).toInt)
      }
      assert(r.getAs[Long]("q_control_cents") === kth(0L), s"tau=$tau control")
      assert(r.getAs[Long]("q_treat_cents") === kth(1L), s"tau=$tau treat")
      // a uniform +shift moves every quantile by ~shift (exact up to
      // the discrete grid): the estimated effect must sit near it
      assert(math.abs(r.getAs[Long]("qte_cents") - shift) < p / 500,
        s"tau=$tau qte=${r.getAs[Long]("qte_cents")}")
    }
  }

  test("conformal: 1M-row wide-domain q-hat exact, coverage recounts", ScaleTest) {
    val n = 1000000
    val p = 999999937L
    val base = spark.range(0L, n.toLong)
      .select(concat(lit("s"), (col("id") % 5).cast("string")).as("segment"),
        ((col("id") * MulK) % p).as("cents"),
        expr("(id div 5) % 2").as("arm"))
    val got = operators.Stats.conformalOf(base)
      .collect().sortBy(_.getString(0))

    // local ground truth per segment
    val bySeg = (0 until 5).map { s =>
      val rows = (0 until n).iterator
        .filter(_ % 5 == s)
        .map(id => ((id / 5) % 2, (id.toLong * MulK) % p)).toArray
      ("s" + s, rows.filter(_._1 == 0).map(_._2), rows.filter(_._1 == 1).map(_._2))
    }
    assert(got.length === 5)
    got.zip(bySeg).foreach { case (r, (seg, cal, ev)) =>
      assert(r.getString(0) === seg)
      val nCal = cal.length.toLong
      val mu = math.round(cal.sum.toDouble / nCal) // Σ < 2^53, exact
      val scores = cal.map(c => math.abs(c - mu)).sorted
      val k = math.min(
        ((nCal + 1) * Stats.ConfNum + Stats.ConfDen - 1) / Stats.ConfDen, nCal)
      val qhat = scores((k - 1).toInt)
      assert(r.getAs[Long]("n_cal") === nCal, s"n_cal of $seg")
      assert(r.getAs[Long]("k") === k, s"k of $seg")
      assert(r.getAs[Long]("qhat_cents") === qhat,
        s"q-hat of $seg — the 10⁹-wide score domain rides the adaptive " +
          "coarse cells and the interval-cover rank rule")
      val covered = ev.count(c => math.abs(c - mu) <= qhat).toLong
      assert(r.getAs[Long]("n_eval") === ev.length.toLong, s"n_eval of $seg")
      assert(r.getAs[Long]("n_covered") === covered, s"n_covered of $seg")
      // a near-uniform population has thin tails, so realized
      // coverage concentrates tightly around the 0.9 target
      assert(math.abs(covered.toDouble / ev.length - 0.9) < 0.02, s"coverage of $seg")
    }
  }

  test("token budget: 1M-doc greedy prefix at a wide score domain", ScaleTest) {
    val session = spark
    import session.implicits._
    val n = 1000000
    val p = 999999937L
    val d = spark.range(0L, n.toLong)
      .select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 8).cast("string")).as("source"),
        (((col("id") * MulK) % p) % 497 + 1).as("toks"),
        // ~100k distinct scores → ~10-doc tie groups, stressing the
        // within-key per-doc cumulative at scale
        (((col("id") * 40503L) % p) % 100000).as("sfp"))
    val got = operators.TextAnalysis.tokenBudgetOf(d, budgetPct = 10L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap

    val docs = Array.tabulate(n) { i =>
      val id = i.toLong
      (id, s"s${id % 8}", (id * MulK) % p % 497 + 1, (id * 40503L) % p % 100000)
    }
    val budget = docs.map(_._3).sum * 10 / 100
    var cum = 0L
    val kept = docs.sortBy { case (id, _, _, sfp) => (-sfp, id) }.map { dd =>
      val k = cum < budget; cum += dd._3; (dd, k)
    }
    val expected = kept.groupBy(_._1._2).map { case (src, ds) =>
      src -> ((ds.length.toLong, ds.count(_._2).toLong, ds.filter(_._2).map(_._1._3).sum))
    }
    assert(got.size === expected.size)
    expected.foreach { case (src, (nd, nk, kt)) =>
      val r = got(src)
      assert(r.getAs[Long]("n_docs") === nd, s"$src docs")
      assert(r.getAs[Long]("n_kept") === nk, s"$src kept")
      assert(r.getAs[Long]("kept_tokens") === kt, s"$src tokens")
      assert(r.getAs[Long]("budget_tokens") === budget)
    }
  }

  test("spearman DECIMAL(38) branch: exact past the int64 moment bound (2M rows)",
      ScaleTest) {
    // n = 2M puts sum(r^2) ~ 4n^3/3 ~ 1.07e19 PAST Long.MaxValue —
    // the bound the BIGINT path's docstring declares. The decimal
    // branch must agree with a BigInt driver replay of the identical
    // average-rank/moment algebra.
    val n = 2000000
    val balDom = 1000000L // ~2 ids per residue: real tie groups
    val df = spark.range(0L, n.toLong).select(
      expr(s"cast((id * ${MulK}L) % ${balDom}L AS double)").as("bal"),
      expr(s"cast(((id * ${MulK}L) % ${balDom}L) * 3 + (id * 7919L) % 1000L AS double)")
        .as("cts"))
    val got = operators.Stats.spearmanFrom(df, decimalMoments = true)
      .collect().head
    assert(got.getAs[Long]("n") === n.toLong)

    // driver replay: identical integer recurrences, BigInt moments
    val bal = Array.tabulate(n)(i => (i.toLong * MulK) % balDom)
    val cts = Array.tabulate(n)(i => ((i.toLong * MulK) % balDom) * 3 + (i.toLong * 7919L) % 1000L)
    def ranks2(vs: Array[Long]): collection.Map[Long, Long] = {
      val grouped = vs.groupBy(identity).map { case (v, xs) => (v, xs.length.toLong) }
      var before = 0L
      val m = collection.mutable.Map.empty[Long, Long]
      grouped.toSeq.sortBy(_._1).foreach { case (v, t) =>
        m(v) = 2 * before + t + 1; before += t
      }
      m
    }
    val rx = ranks2(bal); val ry = ranks2(cts)
    var sx, sy = BigInt(0); var sxy, sxx, syy = BigInt(0)
    var i = 0
    while (i < n) {
      val a = BigInt(rx(bal(i))); val b = BigInt(ry(cts(i)))
      sx += a; sy += b; sxy += a * b; sxx += a * a; syy += b * b
      i += 1
    }
    // the bound is genuinely exceeded: int64 would have wrapped
    assert(sxx > BigInt(Long.MaxValue), s"sxx=$sxx must exceed int64")
    assert(syy > BigInt(Long.MaxValue))
    val nB = BigInt(n)
    val rho = (nB * sxy - sx * sy).toDouble /
      math.sqrt((nB * sxx - sx * sx).toDouble * (nB * syy - sy * sy).toDouble)
    val gotRho = got.getAs[Double]("rho_spearman")
    info(f"rho engine=$gotRho%.6f local=$rho%.6f (sxx=$sxx)")
    assert(math.abs(gotRho - rho) < 1e-6 + 1e-9,
      s"decimal-branch rho $gotRho vs BigInt replay $rho")
  }
}
