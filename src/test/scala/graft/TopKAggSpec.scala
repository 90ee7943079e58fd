package graft

import graft.functions.{TopKBuffer, TopKByScore}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property coverage for the bounded top-K aggregate
  * (graft.functions.TopKByScore): buffer laws directly, and the SQL
  * surface against the row_number window it replaces.
  */
class TopKAggSpec extends AnyFunSuite with SparkFixture {

  test("buffer keeps k best by (score desc, id asc) under any offer order") {
    val p = Prop.forAll(Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L))),
                        Gen.chooseNum(1, 8)) { (xs: List[(Double, Long)], k: Int) =>
      val b = new TopKBuffer(k)
      xs.foreach { case (s, id) => b.offer(s, id, id * 2) }
      val got = b.sortedIdx.map(i => (b.scores(i), b.ids(i), b.extras(i))).toList
      val want = xs.map { case (s, id) => (s, id, id * 2) }
        .sortWith((a, c) => a._1 > c._1 || (a._1 == c._1 && a._2 < c._2))
        .take(k)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.toString)
  }

  test("merge of split buffers equals single-buffer result") {
    val p = Prop.forAll(Gen.listOf(Gen.zip(Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(0L, 30L)))) {
      (xs: List[(Double, Long)]) =>
        val whole = new TopKBuffer(5)
        xs.foreach { case (s, id) => whole.offer(s, id, 0L) }
        val (l, r) = xs.splitAt(xs.size / 2)
        val bl = new TopKBuffer(5); l.foreach { case (s, id) => bl.offer(s, id, 0L) }
        val br = new TopKBuffer(5); r.foreach { case (s, id) => br.offer(s, id, 0L) }
        bl.mergeFrom(br)
        whole.sortedIdx.map(i => (whole.scores(i), whole.ids(i))).toList ==
          bl.sortedIdx.map(i => (bl.scores(i), bl.ids(i))).toList
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.toString)
  }

  test("SQL surface matches the row_number window formulation") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(40).toDouble, rnd.nextInt(1000).toLong))
      .distinct
    val df = rows.toDF("g", "score", "id").cache()
    val viaAgg = df.groupBy("g")
      .agg(TopKByScore.topK(3, col("score"), col("id"), lit(0L)).as("nbrs"))
      .select(col("g"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
              col("nbr.id").as("id"), col("nbr.score").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("g"), col("rk"), col("id"), col("score"))
    val a = viaAgg.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
