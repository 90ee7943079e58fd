package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MlRecsysSpec extends AnyFunSuite with SparkFixture {

  test("ALS emits at most 5 finite-scored recs per user, ranked 1..n") {
    val recs = operators.MlRecsys.alsRecommend(spark, sfTest).cache()
    assert(recs.count() > 0)
    val perUser = recs.groupBy("user_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    assert(perUser.where(col("n") > 5 || col("maxrk") =!= col("n")).count() === 0)
    assert(recs.where(isnan(col("score")) || col("score").isNull).count() === 0)
    // rank order: score must be non-increasing within a user
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("rk")
    val inversions = recs.withColumn("prev", lag("score", 1).over(w))
      .where(col("prev").isNotNull && col("score") > col("prev") + 1e-6).count()
    assert(inversions === 0)
  }

  test("FP-Growth itemset frequencies respect min support") {
    val baskets = Tables.lineitem(spark, sfTest).select("l_orderkey").distinct().count()
    val minFreq = math.floor(0.0008 * baskets).toLong
    val sets = operators.MlRecsys.fpgrowthItemsets(spark, sfTest)
    assert(sets.count() > 0)
    assert(sets.where(col("freq") < minFreq).count() === 0)
  }

  test("LR ranking emits probabilities in [0,1], top-5 per user, rank-ordered") {
    val r = operators.MlRecsys.lrRanking(spark, sfTest).cache()
    assert(r.count() > 0)
    assert(r.where(col("score") < 0.0 || col("score") > 1.0).count() === 0)
    val perUser = r.groupBy("user_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    assert(perUser.where(col("n") > 5 || col("maxrk") =!= col("n")).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("rk")
    val inversions = r.withColumn("prev", lag("score", 1).over(w))
      .where(col("prev").isNotNull && col("score") > col("prev")).count()
    assert(inversions === 0)
  }

  test("item2vec synonyms are 5 items with cosine in [-1, 1]") {
    val syn = operators.MlRecsys.item2vecSynonyms(spark, sfTest)
    val rows = syn.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
  }

  test("implicit ALS: bounded ranked lists, finite scores") {
    val r = operators.MlRecsys.alsImplicit(spark, sfTest).cache()
    assert(r.count() > 0)
    val perUser = r.groupBy("user_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    assert(perUser.where(col("n") > 5 || col("maxrk") =!= col("n")).count() === 0)
    assert(r.where(col("score").isNull || isnan(col("score"))).count() === 0)
  }

  test("prefixspan: length-1 patterns match plain sequence-support counts") {
    val pats = operators.MlRecsys.seqPatterns(spark, sfTest).cache()
    assert(pats.count() > 0)
    // support of a single-item pattern = number of users whose sequence
    // contains the item in at least one basket
    val o = Tables.orders(spark, sfTest).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfTest).select("l_orderkey", "l_partkey")
    val support = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n_users"))
    val singles = pats.where(col("n_steps") === 1 && !col("pattern").contains(","))
      .select(col("pattern").cast("long").as("l_partkey"), col("freq"))
    val bad = singles.join(support, "l_partkey")
      .where(col("freq") =!= col("n_users")).count()
    assert(bad === 0)
  }

  test("seq_patterns_exact: brute-force recompute; MLlib tier agrees pattern-for-pattern") {
    val exact = operators.MlRecsys.seqPatternsExact(spark, sfTest).collect()
    assert(exact.nonEmpty)
    // brute-force truth from the collected per-user step-ordered baskets
    val o = Tables.orders(spark, sfTest)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string").as("od")) // ISO string sorts like the timestamp
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val rows = Tables.lineitem(spark, sfTest).select("l_orderkey", "l_partkey").collect()
      .flatMap { r =>
        o.get(r.getLong(0)).map { case (u, t) => (u, (t, r.getLong(0)), r.getLong(1)) }
      }.distinct
    val seqs: Map[Long, Seq[Set[Long]]] = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._3).toSet)
    }
    val nUsers = seqs.size
    val floor = operators.MlRecsys.SeqPatternMinUsers *
      math.sqrt(nUsers / operators.MlRecsys.SeqPatternGateSeqs)
    val support = scala.collection.mutable.Map.empty[(String, Int, Int), Long]
    seqs.values.foreach { baskets =>
      val items = baskets.flatten.toSet
      items.foreach(a => support((a.toString, 1, 1)) =
        support.getOrElse((a.toString, 1, 1), 0L) + 1)
      // ordered pair exists iff first step of A precedes last step of B
      def firstStep(x: Long) = baskets.indexWhere(_.contains(x))
      def lastStep(x: Long) = baskets.lastIndexWhere(_.contains(x))
      for (a <- items; b <- items if a != b && firstStep(a) < lastStep(b))
        support((s"$a;$b", 2, 2)) = support.getOrElse((s"$a;$b", 2, 2), 0L) + 1
      val same = baskets.flatMap(bk => for (a <- bk; b <- bk if a < b) yield (a, b)).toSet
      same.foreach { case (a, b) =>
        support((s"$a,$b", 1, 2)) = support.getOrElse((s"$a,$b", 1, 2), 0L) + 1 }
    }
    val truth = support.toSeq.filter(_._2 >= floor)
      .map { case ((p, ns, ni), f) => (p, ns, ni, f) }
      .sortBy { case (p, _, _, f) => (-f, p) }.take(100)
    val got = exact.map(r => (r.getAs[String]("pattern"), r.getAs[Int]("n_steps"),
      r.getAs[Int]("n_items"), r.getAs[Long]("freq"))).toSeq
    assert(got === truth)
    // the MLlib miner (same floor, same granularity) must agree with the
    // brute-force support map on every pattern it emits (canonicalize its
    // within-step item order, which PrefixSpan does not fix)
    val ml = operators.MlRecsys.seqPatterns(spark, sfTest).collect()
    assert(ml.nonEmpty)
    val full = support.toMap
    ml.foreach { r =>
      val canon = r.getAs[String]("pattern").split(";").map(step =>
        step.split(",").map(_.toLong).sorted.mkString(",")).mkString(";")
      val ns = r.getAs[Int]("n_steps")
      val ni = canon.count(c => c == ',' || c == ';') + 1
      assert(full.get((canon, ns, ni)).contains(r.getAs[Long]("freq")),
        s"MLlib pattern $canon freq ${r.getAs[Long]("freq")} not in brute-force truth")
    }
  }

  test("association rules: confidence/lift recompute exactly from the baskets") {
    import org.apache.spark.sql.functions._
    val rules = operators.MlRecsys.assocRules(spark, sfTest).collect()
    assert(rules.nonEmpty)
    val d = Tables.lineitem(spark, sfTest)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item")).distinct().cache()
    val n = d.select("oid").distinct().count().toDouble
    val counts = d.groupBy("item").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pair = d.as("a").join(d.as("b"),
        col("a.oid") === col("b.oid") && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item"), col("b.item")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rules.foreach { r =>
      val (a, b) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      val nab = r.getAs[Long]("n_ab")
      assert(pair((a, b)) == nab)
      val conf = r.getAs[Double]("confidence")
      assert(math.abs(conf - nab.toDouble / counts(a)) < 1e-6)
      assert(conf > 0 && conf <= 1.0)
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - nab * n / (counts(a).toDouble * counts(b))) < 1e-5)
    }
    d.unpersist()
  }
}
