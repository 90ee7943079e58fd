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
