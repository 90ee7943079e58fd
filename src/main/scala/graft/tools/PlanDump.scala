package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for registry queries to files —
  * the optimization-round evidence artifact (plans/r13/<q>_{before,after}
  * .txt). Like [[QProf]] it only calls REGISTERED code paths, so the
  * captured plan is exactly what Bench/Verify execute.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> q_a,q_b
  *   → writes <outDir>/<name>_<suffix>.txt per query.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  * Warm hooks run first so memoized/serve-backed queries show their
  * steady-state serving plan (the shape Bench times), not the one-time
  * build.
  */
object PlanDump {
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
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    Files.createDirectories(Paths.get(outDir))

    // Bench-identical warmup: shared memo tables + serve artifacts.
    Seq[(SparkSession, String) => Unit](
      graft.operators.Recsys.warm _,
      graft.operators.Dedup.warm _,
      graft.operators.GraphRank.warm _,
      graft.operators.Training.warm _,
      graft.operators.MlRecsys.warm _,
      graft.operators.Similarity.warm _,
      graft.operators.PipelineOps.warm _,
      graft.operators.TextAnalysis.warm _
    ).foreach(_(spark, sfDir))

    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"PLANDUMP wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
