package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: compare pair-aggregate formulations (binary PairPack count
  * vs arrays_zip(PairPack, PairProd) dot+count) on real interactions.
  */
object PairProf {
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
    sys.env.get("PAIRPROF_NO_COALESCE").foreach { _ =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      println("[pairprof] AQE partition coalescing DISABLED")
    }
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s rows=$n%-10d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    t("warmup") { spark.range(100).count() }
    val w = Window.partitionBy(col("user_id")).orderBy(col("strength").desc, col("item_id").asc)
    val capped = graft.Tables.interactions(spark, sfDir)
      .withColumn("hrk", row_number().over(w)).where(col("hrk") <= 100).drop("hrk")
      .persist()
    t("capped (persist)") { capped.count() }

    val groupedIds = capped.groupBy("user_id")
      .agg(sort_array(collect_list(col("item_id"))).as("es"))
    val binary = groupedIds
      .select(explode(graft.functions.PairPack.pairPack(col("es"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("co"))
    t("binary: pack->explode->agg") { binary.count() }
    t("binary again") { binary.count() }

    val groupedBoth = capped.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("item_id"), col("strength")))).as("es"))
    val zipped = groupedBoth
      .select(explode(arrays_zip(
        graft.functions.PairPack.pairPack(expr("transform(es, x -> x.item_id)")).as("pk"),
        graft.functions.PairProd.pairProd(expr("transform(es, x -> x.strength)")).as("prod"))).as("z"))
      .groupBy(col("z.pk").as("pk"))
      .agg(sum(col("z.prod")).as("dot"), count(lit(1)).as("co"))
    t("zip: pack+prod->explode->agg") { zipped.count() }
    t("zip again") { zipped.count() }

    // variant: posexplode of prods, pk recovered by element_at on packed
    val hof = groupedBoth.select(explode(expr(
        s"""flatten(transform(es, (x, i) -> transform(slice(es, i + 2, size(es)),
           |  y -> struct(x.item_id * ${graft.functions.PairPack.Base}L + y.item_id AS pk,
           |              x.strength * y.strength AS prod))))""".stripMargin
      )).as("p"))
      .groupBy(col("p.pk").as("pk"))
      .agg(sum(col("p.prod")).as("dot"), count(lit(1)).as("co"))
    t("hof: flatten/transform/slice") { hof.count() }

    // downstream of the pair agg: counts join + mirror + bounded top-K
    val pairsP = zipped.persist()
    t("pairAgg persist") { pairsP.count() }
    val counts = capped.groupBy("item_id").agg(count(lit(1)).as("n_users"))
    val half = pairsP
      .withColumn("item_i", shiftright(col("pk"), 32))
      .withColumn("item_j", col("pk").bitwiseAND(graft.functions.PairPack.Base - 1L))
      .join(broadcast(counts.select(col("item_id").as("item_i"), col("n_users").as("ni"))), "item_i")
      .join(broadcast(counts.select(col("item_id").as("item_j"), col("n_users").as("nj"))), "item_j")
      .withColumn("sim", round(col("co") / sqrt(col("ni") * col("nj")), 6))
    val mirrored = half.select(explode(array(
        struct(col("item_i"), col("item_j"), col("sim"), col("co")),
        struct(col("item_j").as("item_i"), col("item_i").as("item_j"), col("sim"), col("co"))
      )).as("p"))
      .select(col("p.item_i").as("item_i"), col("p.item_j").as("item_j"),
              col("p.sim").as("sim"), col("p.co").as("co"))
    t("mirror only") { mirrored.count() }
    val topk = mirrored.groupBy("item_i")
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("item_j"), col("co")).as("nbrs"))
    t("mirror + topK agg") { topk.count() }

    // variant: top-K each half separately (no mirror generator), merge 2K
    val tkI = half.groupBy(col("item_i"))
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("item_j"), col("co")).as("nbrs"))
    val tkJ = half.groupBy(col("item_j").as("item_i"))
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("item_i"), col("co")).as("nbrs"))
    val merged = tkI.unionByName(tkJ)
      .select(col("item_i"), explode(col("nbrs")).as("n"))
      .groupBy("item_i")
      .agg(graft.functions.TopKByScore.topK(10, col("n.score"), col("n.id"), col("n.extra")).as("nbrs"))
    t("two-half topK + merge") { merged.count() }

    // variant: mirror by unioning two projections of the CACHED half
    // (reads the persisted pair agg twice, no struct generator)
    val m2 = half.select(col("item_i"), col("item_j"), col("sim"), col("co"))
      .unionByName(half.select(col("item_j").as("item_i"), col("item_i").as("item_j"),
                               col("sim"), col("co")))
    val topk2 = m2.groupBy("item_i")
      .agg(graft.functions.TopKByScore.topK(10, col("sim"), col("item_j"), col("co")).as("nbrs"))
    t("union-mirror + topK agg") { topk2.count() }
    t("union-mirror again") { topk2.count() }
    spark.stop()
  }
}
