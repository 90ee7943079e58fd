package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage timings for q_slope_one with a pre-warmed item-pair
  * memo (mirrors the bench ordering where q_pair_pmi built it first).
  * Not part of the driver contract.
  */
object SlopeProf {
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

    // warm the shared memos the way the bench order does
    t("warm: pair_pmi") { graft.SparkEntry.queries("q_pair_pmi")(spark, sfDir).count() }
    t("warm: itemcf_similarity") { graft.SparkEntry.queries("q_itemcf_similarity")(spark, sfDir).count() }
    t("2nd: itemcf_similarity (all cached?)") { graft.SparkEntry.queries("q_itemcf_similarity")(spark, sfDir).count() }
    t("slope_one full") { graft.SparkEntry.queries("q_slope_one")(spark, sfDir).count() }
    t("slope_one again") { graft.SparkEntry.queries("q_slope_one")(spark, sfDir).count() }
    println("storage: " + spark.sparkContext.getRDDStorageInfo.map(i =>
      s"${i.name.take(60)} mem=${i.memSize / 1024 / 1024}MB disk=${i.diskSize / 1024 / 1024}MB parts=${i.numCachedPartitions}/${i.numPartitions}").mkString("\n  ", "\n  ", ""))
    spark.stop()
  }
}
