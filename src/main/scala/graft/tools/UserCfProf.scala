package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the UserCF similarity pipeline
  * (the usercf memo build that q_usercf_recommend pays first). Not part
  * of the driver contract.
  */
object UserCfProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-44s rows=$n%-10d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val hist = graft.Tables.interactions(spark, sfDir)
      .groupBy("user_id")
      .agg(graft.functions.TopKByScore.topK(100, col("strength"), col("item_id"), lit(0L)).as("hs"))
      .select(col("user_id"), explode(col("hs")).as("h"))
      .select(col("user_id"), col("h.id").as("item_id"))
      .persist()
    t("capped interactions (persist)") { hist.count() }

    val grouped = hist.groupBy("item_id")
      .agg(sort_array(collect_list(col("user_id"))).as("es"))
    t("per-item user arrays") { grouped.count() }

    val packed = grouped.select(explode(graft.functions.PairPack.pairPack(col("es"))).as("pk"))
    t("exploded packed user pairs") { packed.count() }

    val agg = packed.repartition(col("pk")).groupBy("pk").agg(count(lit(1)).as("co"))
    t("user-pair aggregate") { agg.count() }

    val aggP = agg.persist()
    t("user-pair aggregate (persist)") { aggP.count() }

    val counts = hist.groupBy("user_id").agg(count(lit(1)).as("n_items"))
    val pairs = aggP
      .withColumn("user_u", shiftright(col("pk"), 32))
      .withColumn("user_v", col("pk").bitwiseAND(lit((1L << 32) - 1)))
    val cu = counts.select(col("user_id").as("user_u"), col("n_items").as("nu"))
    val cv = counts.select(col("user_id").as("user_v"), col("n_items").as("nv"))
    val half = pairs
      .join(broadcast(cu), "user_u")
      .join(broadcast(cv), "user_v")
      .withColumn("sim", round(col("co") / sqrt(col("nu") * col("nv")), 6))
    t("half with sims (broadcast joins)") { half.count() }

    val sim = half.select(explode(array(
        struct(col("user_u"), col("user_v"), col("sim"), col("co")),
        struct(col("user_v").as("user_u"), col("user_u").as("user_v"), col("sim"), col("co"))
      )).as("p"))
      .select(col("p.user_u").as("user_u"), col("p.user_v").as("user_v"),
              col("p.sim").as("sim"), col("p.co").as("co"))
    t("mirrored") { sim.count() }

    val top = sim.groupBy("user_u")
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("user_v"), col("co")).as("nbrs"))
    t("top-K aggregate") { top.count() }

    spark.stop()
  }
}
