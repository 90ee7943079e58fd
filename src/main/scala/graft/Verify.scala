package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (dev-only): comma-separated query-name filter
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects
      // natively; read as long nanos (Tables.events normalizes to µs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the broadcast policy (SCALING.md) leans on AQE picking up
      // unhinted small sides from runtime stats: pin it on explicitly
      .config("spark.sql.adaptive.enabled", "true")
      // TypedImperativeAggregates (TopKByScore, MisraGries) run in
      // ObjectHashAggregateExec, which falls back to SORT-BASED
      // aggregation after only 128 distinct keys per task — silently
      // re-introducing the full-input sort the bounded top-K aggregate
      // exists to avoid. 1M keys × ~400 B/buffer bounds the object map
      // at ~400 MB/task, far past every per-task group count here.
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
    new java.io.File(outDir).mkdirs()
    // A crashed query must surface in the correctness artifact, not
    // vanish from it: record every failure (name -> error) and write the
    // full registry alongside the dumps so the checker can enumerate
    // queries that produced no output at all (see ADVICE round 5 — 46
    // crashed queries once disappeared from a 111-green report).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = s"runtime_error: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected.keys.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
