package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout patterns for the 100 TB deployment, demonstrated
  * concretely with plan assertions (SURVEY.md §4 notes):
  *
  *  - `events` partitioned by date → a date predicate prunes partitions
  *    at planning time (the scan lists only matching directories);
  *  - fact tables bucketed on the join key → the join executes with NO
  *    shuffle exchange on either side (co-located bucket join).
  *
  * Both write scratch data under target/ (never the fixtures).
  */
class ScaleLayoutSpec extends AnyFunSuite with SparkFixture {

  test("date-partitioned events scan prunes partitions under a date filter") {
    val out = "target/tmp/events_by_date"
    val e = Tables.events(spark, sfTest)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
    e.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val dates = e.select("event_date").distinct().collect().map(_.getString(0)).sorted
    assert(dates.length > 1, "fixture must span multiple dates for pruning to mean anything")
    val keep = dates.head

    val pruned = spark.read.parquet(out).where(col("event_date") === keep)
    val expected = e.where(col("event_date") === keep).count()
    assert(pruned.count() == expected)

    // partition pruning is visible in the scan's partition filters
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"),
      s"expected partition filters in scan:\n$scan")
  }

  test("bucketed fact-fact join plans without shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog dies with the JVM but the warehouse dirs
    // survive — clear them or saveAsTable refuses the location
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.orders(spark, sfTest).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sfTest).select("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
            col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-located bucket join: no shuffle (Exchange) feeding the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and it is the same row count as the plain join
    val plain = Tables.lineitem(spark, sfTest)
      .join(Tables.orders(spark, sfTest), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }
}
