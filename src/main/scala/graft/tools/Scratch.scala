package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Recsys.warm(spark, sfDir)
    val names = graft.operators.Recsys.cfStoreNames(sfDir)
    val post = graft.operators.Recsys.postSplitDelta(spark, sfDir).localCheckpoint()
    val m = graft.operators.Recsys.mergeStats(
      spark.table(names("strengths")), spark.table(names("pairs")),
      spark.table(names("counts")), post)
    println("COUNTS post=" + post.count()
      + " changed=" + m.changed.count()
      + " pairDelta=" + m.pairDelta.count()
      + " cntDelta=" + m.cntDelta.count()
      + " storePairs=" + spark.table(names("pairs")).count()
      + " storeCounts=" + spark.table(names("counts")).count())
  }
}
