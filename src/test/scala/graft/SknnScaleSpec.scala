package graft

import graft.operators.Recsys
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Off-fixture scale execution of the session-kNN tier: 200k history
  * baskets all sharing one hot item with every active basket — the
  * exact shape whose pair space explodes without the recency posting
  * cap (1000 actives × 200k baskets = 2·10⁸ pairs; with the cap,
  * 1000 × [[Recsys.SknnPostings]] = 5·10⁵). The expected survivors
  * are computable locally (the cap keeps the most recent postings,
  * ties on similarity break by basket id), so the assertion is an
  * exact replay, not a smoke check.
  */
class SknnScaleSpec extends AnyFunSuite with SparkFixture {

  test("200k-basket hot-item corpus: cap bounds the pair space, recs replay exactly",
      ScaleTest) {
    val session = spark
    import session.implicits._
    val nB = 200000
    val nUsers = 1000
    val base = java.time.LocalDate.of(1990, 1, 1)
    def ts(d: Int) = java.sql.Timestamp.valueOf(base.plusDays(d.toLong).atStartOfDay())
    // history: basket i (user 20, day i) = {1, 10_000_000 + i}
    val histOrders = session.range(0L, nB.toLong)
      .select((col("id") + 1000000L).as("o_orderkey"), lit(20L).as("o_custkey"),
        expr("timestamp'1990-01-01 00:00:00' + make_interval(0,0,0,cast(id as int),0,0,0)")
          .as("o_orderdate"))
    // actives: user u (day nB+10+u) basket 5_000_000+u = {1, 2}; plus
    // user 20's own later active so all history baskets stay history
    val activeOrders = (0 until nUsers).map(u =>
      (5000000L + u, u.toLong + 100L, ts(nB + 10 + u))) :+
      ((9999999L, 20L, ts(nB + 5000)))
    val orders = histOrders.unionByName(activeOrders.toDF("o_orderkey", "o_custkey", "o_orderdate"))
    val histItems = session.range(0L, nB.toLong)
      .select((col("id") + 1000000L).as("l_orderkey"), lit(1L).as("l_partkey"))
      .unionByName(session.range(0L, nB.toLong)
        .select((col("id") + 1000000L).as("l_orderkey"), (col("id") + 10000000L).as("l_partkey")))
    val activeItems = (0 until nUsers).flatMap(u =>
      Seq((5000000L + u, 1L), (5000000L + u, 2L))) :+ ((9999999L, 777L))
    val lineitem = histItems.unionByName(activeItems.toDF("l_orderkey", "l_partkey"))
    val dir = java.nio.file.Files.createTempDirectory("sknnscale").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitem.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val t0 = System.nanoTime()
    val recs = Recsys.sknnRecommend(session, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"sknn over $nB%d hot-item baskets: ${secs}%.1f s, ${recs.length} rec rows")

    // expected: per active user the cap keeps the nB-1 ... most recent
    // SknnPostings history baskets for item 1 (basket nB-1 is history
    // too — user 20's active is the separate 9999999 order); ties on
    // sim² break by basket id ASC, so the top-SknnK neighbors are the
    // SMALLEST basket ids among the cap survivors, and the recs are
    // their unique items plus item 1's... item 1 is IN the active
    // basket, so only unique items surface.
    val capStart = nB - Recsys.SknnPostings // first surviving basket index
    val expectedItems = (capStart until capStart + Recsys.SknnTopN)
      .map(i => 10000000L + i).toSet
    val byUser = recs.groupBy(_.getAs[Long]("user_id"))
    // user 20's active {777} shares no item with history → no neighbors
    assert(byUser.size == nUsers)
    (0 until nUsers).foreach { u =>
      val rows = byUser(u.toLong + 100L)
      assert(rows.length == Recsys.SknnTopN)
      val got = rows.map(_.getAs[Long]("item_id")).toSet
      assert(got == expectedItems, s"user ${u + 100}: $got vs $expectedItems")
    }
  }
}
