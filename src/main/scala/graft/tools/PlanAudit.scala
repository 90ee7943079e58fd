package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep EVERY SparkEntry query's physical plan for the
  * shapes this suite bans at 100 TB — `Exchange SinglePartition` and
  * window specs with an empty PARTITION BY — and print one line per
  * offender with the matched fragment. The whitelist logic lives in
  * the audit's consumer (PlanShapeSpec pins); this tool is the raw
  * sweep that finds candidates. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [q_a,q_b,...]
  * (second arg scopes the sweep; scoped runs also dump each query's
  * full formatted plan for eyeballing the mechanism.)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
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
    spark.sparkContext.setLogLevel("ERROR")

    // Formatted mode dedupes reused subtrees, so counts reflect the
    // actual physical plan. Two detectors:
    //  - "Arguments: SinglePartition" = a single-partition exchange
    //    (benign when it feeds a 1-row/bounded final aggregate; a
    //    scale-killer when corpus-sized rows flow through it);
    //  - a windowspecdefinition whose FIRST argument is already a sort
    //    order = a window with an empty PARTITION BY (global sort).
    val globalWin = """windowspecdefinition\([^(),]*#\d+L? (ASC|DESC)""".r
    var nOff = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, q) =>
      try {
        val plan = q(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val sp = "Arguments: SinglePartition".r.findAllIn(plan).length
        val gw = globalWin.findAllIn(plan).length
        val cp = "CartesianProduct".r.findAllIn(plan).length
        // Repeated fact-table scans = the split-consumer defect class
        // (r9s2): differently-filtered consumers of one derived frame
        // re-plan its whole upstream chain — filters push below the
        // joins and defeat exchange reuse. ≥3 scans of one fact table
        // marks a candidate for the aggregate-first/checkpoint fix
        // (eval_dr went 4.2→2.5 s scoped from exactly this). Cached/
        // memoized subtrees scan InMemoryRelation, not parquet, so
        // warmed model tables don't false-positive here.
        val facts = Seq("events", "lineitem", "orders", "documents", "embeddings")
        val rescans = facts.map { t =>
          t -> s"$t\\.parquet".r.findAllIn(plan).length
        }.filter(_._2 >= 3)
        if (only.nonEmpty) println(s"[audit-plan] $name\n$plan")
        if (sp > 0 || gw > 0 || cp > 0 || rescans.nonEmpty) {
          nOff += 1
          val rs = if (rescans.isEmpty) ""
            else rescans.map { case (t, c) => s"$t×$c" }.mkString(" rescans=", ",", "")
          println(f"[audit] $name%-28s singlePartitionExchanges=$sp globalWindows=$gw cartesians=$cp$rs")
        }
      } catch {
        case e: Throwable =>
          println(s"[audit] $name FAILED TO PLAN: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println(s"[audit] done: $nOff queries flagged")
    spark.stop()
  }
}
