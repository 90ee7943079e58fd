package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time a comma-separated list of registry queries N times
  * each in one warmed session, print per-run seconds. Usage:
  *   runMain graft.tools.QProf q_cms_counts,q_markov_next [runs]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Recsys.warm(spark, sfDir)
    graft.operators.Dedup.warm(spark, sfDir)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QPROF $n%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
