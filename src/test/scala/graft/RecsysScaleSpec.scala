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
}
