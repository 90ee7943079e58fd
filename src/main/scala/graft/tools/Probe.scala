package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump fixture schemas + a few rows, or explain/time a single
  * registered query; not part of the driver contract.
  *
  * Usage:  Probe [sfDir]                    — schema dump
  *         Probe explain <qname> [sfDir]    — formatted physical plan
  *         Probe time <qname> [sfDir]       — count() with wall time
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the broadcast policy (SCALING.md) leans on AQE picking up
      // unhinted small sides from runtime stats: pin it on explicitly
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length >= 2 && (args(0) == "explain" || args(0) == "time")) {
      val sfDir = if (args.length >= 3) args(2) else "/root/testdata/sf0.1"
      if (args(0) == "explain") {
        graft.SparkEntry.queries(args(1))(spark, sfDir).explain("formatted")
      } else {
        // time accepts a comma-separated list, run in order — exposes the
        // marginal cost of each query once shared memoized inputs are warm
        for (q <- args(1).split(',')) {
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
          println(f"$q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
      }
      spark.stop()
      return
    }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
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
