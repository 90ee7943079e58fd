package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical validation of the codegen pair-expansion path — the CF
  * family's shared core — beyond fixture size: 100,000 users × 20
  * items = 2M interactions expand to 19M packed pairs through the
  * REAL PairPack machinery (collect_list → codegen generator → packed
  * aggregate), and the resulting co-occurrence table must equal a
  * driver-side replay EXACTLY.
  *
  * Corpus: deterministic clustered interactions (cluster c = u mod 50
  * owns a 40-item block; user u's 20 items walk the block from offset
  * u div 50), so every pair stays within one block and the distinct
  * pair space is bounded (≤ 50·C(40,2) = 39,000) while the expanded
  * volume is the full 100k·C(20,2) = 19M — exactly the hot-shingle /
  * active-user shape the packed aggregate exists for.
  */
class RecsysScaleSpec extends AnyFunSuite with SparkFixture {

  import operators.Recsys

  private val Users = 100000
  private val ItemsPerUser = 20
  private val Clusters = 50
  private val Block = 40

  private def itemOf(u: Long, j: Long): Long =
    (u % Clusters) * Block + (u / Clusters + j) % Block

  test("2M interactions: packed pair aggregate equals the driver-side replay",
      ScaleTest) {
    val n = Users.toLong * ItemsPerUser
    val r = spark.range(0L, n)
      .select(expr(s"id DIV $ItemsPerUser").as("user_id"),
        expr(s"((id DIV $ItemsPerUser) % $Clusters) * $Block + " +
          s"((id DIV $ItemsPerUser) DIV $Clusters + id % $ItemsPerUser) % $Block")
          .as("item_id"))
    val plan = Recsys.pairsWithin(r, "user_id", "item_id")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("pair_pack"),
      "the expansion must go through the codegen PairPack generator")
    val got = Recsys.unpack(
        Recsys.pairsWithin(r, "user_id", "item_id")
          .groupBy("pk").agg(count(lit(1)).as("co")), "a", "b")
      .collect().map(x => (x.getAs[Long]("a"), x.getAs[Long]("b")) -> x.getAs[Long]("co"))
      .toMap

    val truth = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var u = 0L
    while (u < Users) {
      val items = Array.tabulate(ItemsPerUser)(j => itemOf(u, j.toLong)).sorted
      var i = 0
      while (i < items.length) {
        var j = i + 1
        while (j < items.length) {
          val k = (items(i), items(j))
          truth(k) = truth.getOrElse(k, 0L) + 1
          j += 1
        }
        i += 1
      }
      u += 1
    }
    assert(got.size === truth.size,
      s"distinct pair count ${got.size} != replay ${truth.size}")
    val mismatch = truth.iterator.find { case (k, v) => got.get(k) != Some(v) }
    assert(mismatch.isEmpty, s"first mismatching pair: $mismatch")
    // shape invariants of the planted structure
    assert(truth.size <= Clusters * Block * (Block - 1) / 2)
    assert(got.values.sum === Users.toLong * ItemsPerUser * (ItemsPerUser - 1) / 2,
      "total expanded pair instances must be exactly N*C(K,2)")
  }

  test("refresh at scale: a 1% batch delta-merged into 20k-user statistics equals the rebuild",
      ScaleTest) {
    // The production-shaped case the fixture can't show (its post-split
    // window covers ~36% of history): 20k users' frozen statistics,
    // then a 1%-of-users batch — boosts that cross the cap (new items
    // entering capped sets) plus brand-new users. The delta merge must
    // equal a from-scratch rebuild over the merged strengths, row for
    // row, at a scale where the pair space is ~10^6.
    val spark2 = spark
    import spark2.implicits._
    val users = 20000L
    val itemsPer = 10
    val oldStrengths = spark.range(users).select(col("id").as("user_id"))
      .select(col("user_id"), explode(expr(s"sequence(0, ${itemsPer - 1})")).as("j"))
      .select(col("user_id"),
        expr(s"(user_id % $Clusters) * $Block + (user_id div $Clusters + j) % $Block").as("item_id"),
        (lit(100.0) - col("j")).as("strength"))
    // batch: every 100th user buys a NEW item (outside their block walk)
    // hard enough to enter the capped set; every 400th user is brand new
    val post = spark.range(users / 100).select((col("id") * 100).as("user_id"))
      .select(col("user_id"),
        ((col("user_id") % Clusters) * Block + lit(Block - 1)).as("item_id"),
        lit(500.0).as("strength"))
      .unionByName(spark.range(50).select(
        (col("id") + users).as("user_id"),
        (col("id") % 7).as("item_id"),
        lit(3.0).as("strength")))
    def statsOf(strengths: org.apache.spark.sql.DataFrame) = {
      val capped = Recsys.capHistories(strengths).select("user_id", "item_id")
      (Recsys.pairsWithin(capped, "user_id", "item_id")
         .groupBy("pk").agg(count(lit(1)).as("co")),
       capped.groupBy("item_id").agg(count(lit(1)).as("n_users")))
    }
    val (oldPairs, oldCounts) = statsOf(oldStrengths)
    val got = Recsys.refreshFrom(
        oldStrengths, oldPairs.localCheckpoint(), oldCounts.localCheckpoint(), post)
      .collect()
    val fullStrengths = oldStrengths.unionByName(post)
      .groupBy("user_id", "item_id").agg(sum("strength").as("strength"))
    val (fullPairs, fullCounts) = statsOf(fullStrengths)
    val want = Recsys.knnFromPairCounts(
      Recsys.unpack(fullPairs, "item_i", "item_j"), fullCounts).collect()
    assert(got.nonEmpty && got.length === want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a === b, "scaled refresh diverges from the rebuild")
    }
  }
}
