package graft

import graft.operators.Recsys
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics coverage for the session-based kNN recommender and GAUC
  * beyond their oracle hash-matches: a planted-corpus replay for SKNN
  * (the expected neighbor wins) and an independent brute-force
  * pair-counting replay of the weighted per-user AUC.
  */
class SessionRecSpec extends AnyFunSuite with SparkFixture {

  test("sknn: recommendations never include active-basket items; ranks dense") {
    val out = Recsys.sknnRecommend(spark, sfTest).cache()
    val n = out.count()
    assert(n > 0)
    // rk dense 1..k per user, scores positive and non-increasing
    val bad = out.groupBy("user_id")
      .agg(min("rk").as("mn"), max("rk").as("mx"), count(lit(1)).as("c"),
           min("score_units").as("ms"))
      .where(col("mn") =!= 1 || col("mx") =!= col("c") || col("ms") <= 0)
      .count()
    assert(bad == 0)
    out.unpersist()
  }

  test("sknn: planted corpus — the overlapping historical basket drives the rec") {
    val session = spark
    import session.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // user 10's active basket {1,2}; history basket 100 (user 20) = {1,2,7}
    // overlaps fully, basket 101 (user 30) = {3,9} not at all. Expected
    // top rec for user 10: item 7 (from the cosine-nearest basket 100).
    val orders = Seq(
      (100L, 20L, ts("1998-01-01 00:00:00")),
      (101L, 30L, ts("1998-01-02 00:00:00")),
      (102L, 10L, ts("1999-01-01 00:00:00")), // user 10 earlier basket {5}
      (103L, 10L, ts("1999-06-01 00:00:00")), // user 10 ACTIVE basket {1,2}
      (104L, 20L, ts("1999-07-01 00:00:00")), // user 20 active {3}
      (105L, 30L, ts("1999-07-02 00:00:00")), // user 30 active {9}
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (100L, 1L), (100L, 2L), (100L, 7L),
      (101L, 3L), (101L, 9L),
      (102L, 5L),
      (103L, 1L), (103L, 2L),
      (104L, 3L),
      (105L, 9L),
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("sknn").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitem.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val recs = Recsys.sknnRecommend(session, dir)
      .where(col("user_id") === 10L).collect()
    assert(recs.nonEmpty)
    val top = recs.minBy(_.getAs[Int]("rk"))
    assert(top.getAs[Long]("item_id") == 7L, recs.mkString(", "))
    // and nothing from the active basket {1,2} is ever recommended
    assert(recs.forall(r => !Set(1L, 2L).contains(r.getAs[Long]("item_id"))))
  }

  test("sknn: the per-item recency posting cap binds — old baskets drop out") {
    val session = spark
    import session.implicits._
    // hot item 1 appears in SknnPostings+40 history baskets; only the
    // most RECENT SknnPostings may pair with the active basket. The 40
    // oldest carry a tracer item (8888) that must therefore never be
    // recommended; recent baskets carry tracer 7777, which must be.
    val base = java.time.LocalDate.of(1995, 1, 1)
    val nOld = 40
    val nAll = Recsys.SknnPostings + nOld
    // all history baskets belong to user 20, whose ACTIVE basket is a
    // separate later order — otherwise every basket is its owner's
    // latest and the history set is empty
    val hist = (0 until nAll).map { i =>
      val day = java.sql.Timestamp.valueOf(base.plusDays(i.toLong).atStartOfDay())
      (1000L + i, 20L, day)
    }
    val active = Seq(
      (9000L, 10L, java.sql.Timestamp.valueOf(base.plusDays(3000L).atStartOfDay())),
      (9100L, 20L, java.sql.Timestamp.valueOf(base.plusDays(4000L).atStartOfDay())))
    val orders = (hist ++ active).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = (
      (0 until nAll).flatMap { i =>
        val tracer = if (i < nOld) 8888L else 7777L
        Seq((1000L + i, 1L), (1000L + i, tracer))
      } ++ Seq((9000L, 1L), (9000L, 2L), (9100L, 999L))
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("sknncap").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitem.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val recs = Recsys.sknnRecommend(session, dir)
      .where(col("user_id") === 10L).collect()
      .map(_.getAs[Long]("item_id")).toSet
    assert(recs.contains(7777L), s"recent tracer missing from $recs")
    assert(!recs.contains(8888L), s"capped-out tracer leaked into $recs")
  }

  test("gauc: brute-force pair-counting replay at sf0.001") {
    val row = Recsys.evalGauc(spark, sfTest).collect().head
    // independent replay: rebuild candidates relationally, then count
    // concordant/tied pairs per user locally
    val o = Tables.orders(spark, sfTest)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"), col("o_orderdate"))
    val l = Tables.lineitem(spark, sfTest).select(col("l_orderkey"), col("l_partkey"))
    val ui = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("user_id"), col("l_partkey").as("item_id"), col("o_orderdate"))
    val split = lit(Recsys.SplitDate).cast("timestamp_ntz")
    val train = ui.where(col("o_orderdate") < split)
      .select("user_id", "item_id").distinct().cache()
    val test = ui.where(col("o_orderdate") >= split)
      .select("user_id", "item_id").distinct().cache()
    val pool = train.groupBy("item_id").agg(countDistinct("user_id").as("pop"))
      .orderBy(col("pop").desc, col("item_id").asc).limit(Recsys.GaucCand)
      .collect().map(r => r.getAs[Long]("item_id") -> r.getAs[Long]("pop")).toMap
    val trainSet = train.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("item_id"))).toSet
    val testPairs = test.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("item_id")))
    val testUsers = testPairs.map(_._1).distinct
    val testSet = testPairs.toSet
    val perUser = testUsers.flatMap { u =>
      val cand = pool.toSeq.filter { case (i, _) => !trainSet((u, i)) }
      val (pos, neg) = cand.partition { case (i, _) => testSet((u, i)) }
      if (pos.isEmpty || neg.isEmpty) None
      else {
        var conc = 0.0
        for ((_, sp) <- pos; (_, sn) <- neg)
          conc += (if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0)
        val auc = conc / (pos.size.toDouble * neg.size)
        val aucFp = math.round(auc * Recsys.GaucUnits)
        Some((pos.size.toLong, aucFp))
      }
    }
    assert(perUser.nonEmpty)
    val gauc = perUser.map { case (n1, fp) => n1 * fp }.sum.toDouble /
      (perUser.map(_._1).sum * Recsys.GaucUnits).toDouble
    val macroAuc = perUser.map(_._2).sum.toDouble /
      (perUser.size.toLong * Recsys.GaucUnits).toDouble
    assert(row.getAs[Long]("n_eval_users") == perUser.size)
    assert(row.getAs[Long]("total_pos") == perUser.map(_._1).sum)
    assert(math.abs(row.getAs[Double]("gauc") - gauc) < 1e-6, s"$row vs $gauc")
    assert(math.abs(row.getAs[Double]("macro_auc") - macroAuc) < 1e-6, s"$row vs $macroAuc")
    train.unpersist(); test.unpersist()
  }
}
