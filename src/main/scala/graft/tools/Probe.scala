package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump fixture schemas + a few rows; not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("entry")) {
      val df = graft.SparkEntry.entry(spark)
      println(s"entry rows=${df.count()}")
      df.show(5, truncate = false)
      spark.stop()
      return
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        println(s"=== $t rows=${df.count()}")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch {
        case e: Throwable => println(s"=== $t FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
