package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for q_sknn_recommend's stages (throwaway). */
object SknnProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SKNNPROF $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    import graft.Tables
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"), col("o_orderdate"))
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    val bi = t("bi+ckpt") {
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey").as("bk"), col("user_id"),
                col("o_orderdate").as("dt"), col("l_partkey").as("item_id"))
        .distinct().localCheckpoint()
    }
    val active = bi.select("user_id", "bk", "dt").distinct()
      .groupBy("user_id").agg(max(struct(col("dt"), col("bk"))).as("m"))
      .select(col("user_id"), col("m.bk").as("abk"))
    t("active")(active.count())
    val sizes = bi.groupBy("bk").agg(count(lit(1)).as("n"))
    val aItems = t("aItems+ckpt") {
      bi.as("b").join(active.as("a"),
          col("b.user_id") === col("a.user_id") && col("b.bk") === col("a.abk"))
        .select(col("b.user_id").as("user_id"), col("a.abk").as("abk"),
                col("b.item_id").as("item_id"))
        .join(sizes.select(col("bk").as("abk"), col("n").as("na")), "abk")
        .localCheckpoint()
    }
    val hist = bi.join(active.select(col("abk")), bi("bk") === col("abk"), "left_anti")
    val postings = hist
      .withColumn("ds", expr("cast(unix_date(cast(dt AS date)) AS double)"))
      .groupBy("item_id")
      .agg(graft.functions.TopKByScore.topK(graft.operators.Recsys.SknnPostings, col("ds"), col("bk"), lit(0L)).as("ps"))
      .select(col("item_id"), explode(col("ps")).as("p"))
      .select(col("item_id"), col("p.id").as("hbk"))
      .join(sizes.select(col("bk").as("hbk"), col("n").as("nh")), "hbk")
    t("postings")(postings.count())
    val pairs = aItems.join(postings, "item_id")
      .groupBy("user_id", "abk", "na", "hbk", "nh")
      .agg(count(lit(1)).as("inter"))
      .withColumn("s_units", expr(s"(inter * inter * ${graft.operators.Recsys.SknnUnits}L) div (na * nh)"))
    t("pairs")(pairs.count())
    val nbrs = pairs.groupBy("user_id")
      .agg(graft.functions.TopKByScore.topK(
        graft.operators.Recsys.SknnK, col("s_units").cast("double"), col("hbk"), col("s_units")).as("nb"))
      .select(col("user_id"), explode(col("nb")).as("n"))
      .select(col("user_id"), col("n.id").as("hbk"), col("n.extra").as("s_units"))
    t("nbrs")(nbrs.count())
    val histItems = bi.select(col("bk").as("hbk"), col("item_id"))
    val recs = nbrs.join(histItems, "hbk")
      .join(aItems.select("user_id", "item_id"), Seq("user_id", "item_id"), "left_anti")
      .groupBy("user_id", "item_id").agg(sum("s_units").as("score_units"))
    t("recs")(recs.count())
    t("FULL")(graft.SparkEntry.queries("q_sknn_recommend")(spark, sfDir).count())
    t("FULL2")(graft.SparkEntry.queries("q_sknn_recommend")(spark, sfDir).count())
    spark.stop()
  }
}
