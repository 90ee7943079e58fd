package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the ItemCF pipeline to find the
  * actual cost center. Not part of the driver contract.
  */
object CfProfile {
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
      println(f"$label%-40s rows=$n%-10d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val w = Window.partitionBy(col("user_id")).orderBy(col("strength").desc, col("item_id").asc)
    val r = graft.Tables.interactions(spark, sfDir)
      .withColumn("hrk", row_number().over(w))
      .where(col("hrk") <= 100)
      .drop("hrk")
      .select("user_id", "item_id")
      .persist()

    t("capped interactions (persist)") { r.count() }
    t("capped interactions (cached re-read)") { r.count() }

    val grouped = r.groupBy("user_id").agg(sort_array(collect_list(col("item_id"))).as("es"))
    t("grouped arrays") { grouped.count() }

    val pairs = grouped
      .select(col("user_id"), explode(expr(
        "flatten(transform(es, (x, i) -> transform(slice(es, i + 2, size(es)), y -> struct(x AS a, y AS b))))"
      )).as("p"))
    t("exploded pairs (HOF)") { pairs.count() }

    val agg = pairs.groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("co"))
    t("pair aggregate") { agg.count() }

    val packedHof = grouped
      .select(col("user_id"), explode(expr(
        "flatten(transform(es, (x, i) -> transform(slice(es, i + 2, size(es)), y -> x * 4294967296 + y)))"
      )).as("pk"))
    t("packed pair aggregate (HOF)") {
      packedHof.groupBy("pk").agg(count(lit(1)).as("co")).count()
    }
    val packed = grouped
      .select(col("user_id"), explode(graft.functions.PairPack.pairPack(col("es"))).as("pk"))
    val paggr = packed.groupBy("pk").agg(count(lit(1)).as("co"))
    t("packed pair aggregate (codegen)") { paggr.count() }

    // alternative: self-join pair generation
    val sj = r.as("x").join(r.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.item_id") < col("y.item_id"))
      .groupBy(col("x.item_id").as("a"), col("y.item_id").as("b"))
      .agg(count(lit(1)).as("co"))
    t("self-join pair aggregate") { sj.count() }

    // tail stages of the similarity pipeline
    val counts = r.groupBy("item_id").agg(count(lit(1)).as("n_users"))
    val half = paggr
      .withColumn("item_i", shiftright(col("pk"), 32))
      .withColumn("item_j", col("pk").bitwiseAND(4294967295L))
      .join(broadcast(counts.select(col("item_id").as("item_i"), col("n_users").as("ni"))), "item_i")
      .join(broadcast(counts.select(col("item_id").as("item_j"), col("n_users").as("nj"))), "item_j")
      .withColumn("sim", round(col("co") / sqrt(col("ni") * col("nj")), 6))
    t("half-space sim (bcast joins)") { half.count() }
    val mirrored = half.select(explode(array(
        struct(col("item_i"), col("item_j"), col("sim"), col("co")),
        struct(col("item_j").as("item_i"), col("item_i").as("item_j"), col("sim"), col("co"))
      )).as("p"))
      .select(col("p.item_i").as("item_i"), col("p.item_j").as("item_j"),
              col("p.sim").as("sim"), col("p.co").as("co"))
    t("mirrored") { mirrored.count() }
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item_i")).orderBy(col("sim").desc, col("item_j").asc)
    val top = mirrored.withColumn("rk", row_number().over(w2)).where(col("rk") <= 10)
    t("windowed top-k") { top.count() }

    val topAgg = mirrored.groupBy("item_i")
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("item_j"), col("co")).as("nbrs"))
      .select(col("item_i"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
    t("top-k aggregate") { topAgg.count() }

    t("full q_itemcf_similarity") {
      graft.operators.Recsys.itemcfSimilarity(spark, sfDir).count()
    }
    spark.stop()
  }
}
