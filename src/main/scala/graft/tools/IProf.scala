package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: break down the interaction-table materialization cost. */
object IProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-32s rows=$n%-9d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    t("warmup") { spark.range(100).count() }
    val o = graft.Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = graft.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_quantity")
    t("scan lineitem") { l.count() }
    val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
    t("join") { joined.count() }
    val agg = joined.groupBy(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .agg(sum("l_quantity").as("strength"))
    t("groupBy agg") { agg.count() }
    val w = Window.partitionBy(col("user_id")).orderBy(col("strength").desc, col("item_id").asc)
    val capped = agg.withColumn("hrk", row_number().over(w)).where(col("hrk") <= 100).drop("hrk")
    t("window cap") { capped.count() }
    val p = capped.persist()
    t("persist") { p.count() }
    t("re-read") { p.count() }
    spark.stop()
  }
}
