package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler — the ONE parameterized runner (r10 advisor: the
  * former one-off stage profilers duplicated pipeline bodies and
  * could silently drift from the queries they mirrored; this tool
  * only ever calls REGISTERED code paths — SparkEntry.queries and the
  * operator families' warm hooks — so it cannot).
  *
  * Usage:
  *   runMain graft.tools.QProf q_a,q_b [runs]  — per-run seconds for
  *     registry queries in one warmed session (default 3 runs)
  *   runMain graft.tools.QProf warm            — per-family warm-stage
  *     seconds (the memoized shared tables: interaction caps, pair
  *     aggregates, similarity models, ANN index passes, eval split,
  *     BPE training — exactly the stages the expensive tail shares)
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object QProf {
  def main(args: Array[String]): Unit = {
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
      // AQE byte-based partition coalescing is blind to downstream
      // per-row cost: a small exchange feeding a pair/shingle GENERATOR
      // coalesces to one task and serializes the expansion (measured:
      // 1.5 s single-task stages at local[32]). Lowering the coalesce
      // floor keeps small-but-CPU-heavy shuffles parallel; at real
      // scale partitions sit far above either floor, so this only
      // changes behavior where the default was pathological.
      // SPARK_GRAFT_QPROF_MINPART overrides the floor for A/B runs
      // (dev tool only — Bench/Verify keep the fixed value)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_QPROF_MINPART", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"QPROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val warms: Seq[(String, (SparkSession, String) => Unit)] = Seq(
      "warm:recsys"      -> (graft.operators.Recsys.warm _),
      "warm:dedup"       -> (graft.operators.Dedup.warm _),
      "warm:graphrank"   -> (graft.operators.GraphRank.warm _),
      "warm:training"    -> (graft.operators.Training.warm _),
      "warm:mlrecsys"    -> (graft.operators.MlRecsys.warm _),
      "warm:similarity"  -> (graft.operators.Similarity.warm _),
      "warm:pipelineops" -> (graft.operators.PipelineOps.warm _),
      "warm:text"        -> (graft.operators.TextAnalysis.warm _))

    if (args.headOption.contains("warm")) {
      warms.foreach { case (label, w) => timed(label)(w(spark, sfDir)) }
    } else {
      val names =
        if (args(0) == "all") graft.SparkEntry.queries.keys.toSeq
        else args(0).split(",").toSeq
      val runs = args.lift(1).map(_.toInt).getOrElse(3)
      // SPARK_GRAFT_QPROF_STAGES=1: per-stage wall time + callsite for
      // the LAST run of each query — attributes cost to code lines
      // (guide §1.1 empirical loop; the UI is disabled here, this is
      // its stage table reduced to what the optimization loop needs).
      val stageProf = sys.env.get("SPARK_GRAFT_QPROF_STAGES").contains("1")
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
      if (stageProf) spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
              .getOrElse(0L)
            // AQE stages run from a thread pool, so i.name is useless;
            // attribute via the graft callsite if present, else the
            // stage's RDD scope chain (the physical operators it runs)
            val site = i.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("QProf"))
              .map(_.trim)
              // no graft frame (AQE pool stages): fall back to the
              // stage NAME's callsite token so checkpoint/exchange
              // stages are still attributable
              .orElse(Option(i.name).map(_.take(60)))
            val ops = i.rddInfos.flatMap(_.scope).map(_.name)
              .filterNot(Set("mapPartitionsInternal", "DeserializeToObject"))
              .distinct.mkString(">")
            val sh = f"in=${i.taskMetrics.inputMetrics.bytesRead / 1e6}%.0fM " +
              f"sr=${i.taskMetrics.shuffleReadMetrics.remoteBytesRead + i.taskMetrics.shuffleReadMetrics.localBytesRead}%.0fB " +
              f"sw=${i.taskMetrics.shuffleWriteMetrics.bytesWritten}%.0fB"
            stages.add((i.stageId, ms / 1e3,
              s"t=${i.numTasks} [$ops] $sh ${site.getOrElse("")}"))
          }
        })
      warms.foreach { case (_, w) => w(spark, sfDir) } // Bench-identical warmup
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val ts = (1 to runs).map { r =>
          if (stageProf && r == runs) { Thread.sleep(500); stages.clear() }
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"QPROF $n%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
        if (stageProf) {
          Thread.sleep(500) // let the async listener bus drain
          import scala.jdk.CollectionConverters._
          stages.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (id, s, nm) =>
            println(f"  STAGE $id%5d $s%7.2f s  ${nm.take(110)}")
          }
        }
      }
    }
    spark.stop()
  }
}
