package graft

import graft.functions.{KmvBuffer, KmvMins}
import graft.operators.Advanced
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property coverage for the KMV distinct sketch
  * (graft.functions.KmvMins) and the estimator arithmetic behind
  * q_kmv_distinct / q_kmv_overlap.
  */
class KmvSpec extends AnyFunSuite with SparkFixture {

  test("buffer keeps the k smallest DISTINCT values under any offer order") {
    val p = Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 80L)), Gen.chooseNum(1, 16)) {
      (xs: List[Long], k: Int) =>
        val b = new KmvBuffer(k)
        xs.foreach(b.offer)
        val got = b.vals.take(b.size).toList
        val want = xs.distinct.sorted.take(k)
        got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.toString)
  }

  test("merge of split buffers equals the single-buffer sketch (sketch union)") {
    val p = Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 60L)), Gen.chooseNum(1, 8)) {
      (xs: List[Long], k: Int) =>
        val whole = new KmvBuffer(k)
        xs.foreach(whole.offer)
        val (l, r) = xs.splitAt(xs.size / 2)
        val bl = new KmvBuffer(k); l.foreach(bl.offer)
        val br = new KmvBuffer(k); r.foreach(br.offer)
        bl.mergeFrom(br)
        whole.vals.take(whole.size).toList == bl.vals.take(bl.size).toList
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.toString)
  }

  test("aggregate surface matches sort-distinct-take over groups, incl. dup-heavy input") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(11)
    // dup-heavy: each value offered ~4 times on average
    val rows = (1 to 2000).map(_ => (rnd.nextInt(3).toLong, rnd.nextInt(120).toLong))
    val df = rows.toDF("g", "v")
    val got = df.groupBy("g").agg(KmvMins.kmvMins(16, col("v")).as("mins"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(16)
    }
    assert(got == want)
  }

  test("under-filled sketch is the exact distinct set (small group)") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, 5L), (1L, 3L), (1L, 5L), (1L, 9L)).toDF("g", "v")
    val got = df.groupBy("g").agg(KmvMins.kmvMins(64, col("v")).as("mins"))
      .collect().head.getSeq[Long](1).toList
    assert(got == List(3L, 5L, 9L))
  }

  test("kmv_mins resolves from SQL text (registry wrap path)") {
    val s2 = spark.newSession()
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.registerFunction(s2, "kmv_mins",
      exprs => KmvMins(exprs(1), exprs(0).eval().asInstanceOf[Number].intValue))
    s2.range(0, 100).createOrReplaceTempView("kmv_r100")
    val got = s2.sql("SELECT kmv_mins(3, id % 7) AS m FROM kmv_r100")
      .collect().head.getSeq[Long](0).toList
    assert(got == List(0L, 1L, 2L))
  }

  test("estimator accuracy on a planted 50k-distinct corpus (deterministic)") {
    val session = spark
    import session.implicits._
    val n = 50000
    // h48 over distinct string ids — the exact hash the queries use
    val df = session.range(n).select(
      expr("cast(conv(substring(md5(cast(id AS string)), 1, 12), 16, 10) AS bigint)").as("h"))
    val mins = df.agg(KmvMins.kmvMins(Advanced.KmvK, col("h")).as("mins"))
      .collect().head.getSeq[Long](0)
    assert(mins.size == Advanced.KmvK)
    val est = (Advanced.KmvK - 1).toDouble * Advanced.KmvM / mins.last.toDouble
    val relErr = math.abs(est - n) / n
    // k=64 → σ ≈ 12.7%; this seedless-deterministic draw lands well
    // inside 3σ. Pin a loose ceiling so a hash/estimator regression
    // (wrong domain, off-by-one on h_(k)) fails loudly.
    assert(relErr < 0.4, s"est=$est relErr=$relErr")
  }

  test("q_kmv_distinct: sf0.001 under-fills (exact branch), sf0.01 fills (estimator branch)") {
    // sf0.001: 15 users per type < k=64 → the sketch IS the distinct set
    val small = Advanced.kmvDistinct(spark, sfTest).collect()
    assert(small.nonEmpty)
    small.foreach { r =>
      assert(r.getAs[Long]("sketch_n") < Advanced.KmvK)
      assert(r.getAs[Double]("est_users") == r.getAs[Long]("exact_users").toDouble)
      assert(r.getAs[Double]("rel_err") == 0.0)
    }
    // sf0.01 (the driver gate SF): 150 users per type > k → full estimator
    val gate = Advanced.kmvDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(gate.forall(_.getAs[Long]("sketch_n") == Advanced.KmvK))
    gate.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.6, s"$r") // k=64 → σ≈12.7%; loose ceiling
    }
  }

  test("q_kmv_overlap: estimates consistent and non-trivially varied at sf0.001") {
    val rows = Advanced.kmvOverlap(spark, sfTest).collect()
    assert(rows.length > 100) // C(20,2) = 190 source pairs expected
    rows.foreach { r =>
      val jac = r.getAs[Double]("est_jaccard")
      val union = r.getAs[Double]("est_union")
      val common = r.getAs[Double]("est_common")
      val exactJac = r.getAs[Double]("exact_jaccard")
      assert(jac >= 0.0 && jac <= 1.0)
      assert(exactJac >= 0.0 && exactJac <= 1.0)
      assert(union > 0.0)
      // est_common ≈ jac · union (same arithmetic, different rounding points)
      assert(math.abs(common - jac * union) <= union * 0.01 + 1.0, s"$r")
    }
    // source shingle sets genuinely differ: overlap must not be all-1.0
    assert(rows.exists(_.getAs[Double]("est_jaccard") < 0.99))
    // sketch jaccard tracks exact jaccard on average (σ ≈ 1/√k per pair)
    val mae = rows.map(r =>
      math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_jaccard"))).sum / rows.length
    assert(mae < 0.25, s"mean |est-exact| jaccard error $mae")
  }
}
