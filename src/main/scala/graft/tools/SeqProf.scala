package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: stage timing for the exact sequential-pattern miner. */
object SeqProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s rows=$n%-10d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val b = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("o_orderkey").as("ok"),
              col("o_orderdate").as("od"), col("l_partkey").as("item"))
      .distinct()
    t("b (baskets)") { b.count() }
    val st = b.withColumn("step",
        dense_rank().over(Window.partitionBy("user_id").orderBy("od", "ok")))
      .select("user_id", "item", "step").localCheckpoint()
    t("st (checkpoint)") { st.count() }
    val span = st.groupBy("user_id", "item")
      .agg(min("step").as("smin"), max("step").as("smax"))
    t("span") { span.count() }
    val arr = span.groupBy("user_id")
      .agg(expr("slice(sort_array(collect_list(struct(smin, item, smax))), 1, 200)").as("sp"))
      .localCheckpoint()
    t("arr (checkpoint)") { arr.count() }
    val capped = arr.select(col("user_id"), explode(col("sp")).as("a"))
      .select(col("user_id"), col("a.item").as("item"),
              col("a.smin").as("smin"), col("a.smax").as("smax"))
    t("capped") { capped.count() }
    val l2seqPairs = arr.select(col("sp"), explode(col("sp")).as("a"))
      .select(col("a"), explode(col("sp")).as("bb"))
      .where(col("a.item") =!= col("bb.item") && col("a.smin") < col("bb.smax"))
    t("l2seq pre-agg rows") { l2seqPairs.count() }
    t("l2seq agg") {
      l2seqPairs.groupBy(col("a.item").as("ia"), col("bb.item").as("ib"))
        .agg(count(lit(1)).as("freq")).count()
    }
    val stc = st.join(capped.select("user_id", "item"), Seq("user_id", "item"), "left_semi")
    t("stc semi") { stc.count() }
    t("l2same") {
      stc.groupBy("user_id", "step")
        .agg(sort_array(collect_set(col("item"))).as("its"))
        .select(col("user_id"), col("its"), posexplode(col("its")).as(Seq("i", "ia")))
        .select(col("user_id"), col("ia"), explode(expr("slice(its, i + 2, size(its))")).as("ib"))
        .distinct()
        .groupBy("ia", "ib").agg(count(lit(1)).as("freq")).count()
    }
    spark.stop()
  }
}
