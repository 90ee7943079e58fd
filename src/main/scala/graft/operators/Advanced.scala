package graft.operators

import graft.Tables
import graft.functions.WeightedPref
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced function surfaces: the custom Aggregator UDAF (A7) and
  * pure-SQL TF-IDF content similarity (M8) — the last two SURVEY.md §2
  * rows without a query.
  */
object Advanced {

  type Q = (SparkSession, String) => DataFrame

  /** A7: per-user weighted preference via the typed Aggregator,
    * registered as SQL `weighted_pref`. The oracle reproduces the same
    * arithmetic (Σw·v / Σw with zero-value rows skipped — fixture
    * values are never NaN, and `value=0` rows carry weight but a 0
    * contribution, so both engines see identical sums).
    */
  def udafWeightedPref(spark: SparkSession, sfDir: String): DataFrame = {
    WeightedPref.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    spark.sql(
      """SELECT user_id, pref, n_events FROM (
        |  SELECT user_id,
        |    round(weighted_pref(event_type, value), 6) AS pref,
        |    count(*) AS n_events
        |  FROM events
        |  GROUP BY user_id
        |)
        |WHERE pref IS NOT NULL
        |ORDER BY pref DESC, user_id ASC
        |LIMIT 100""".stripMargin)
  }

  val udafWeightedPrefSql: String = {
    val w = WeightedPref.weights
      .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
    s"""WITH g AS (
       |  SELECT user_id,
       |    sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
       |             THEN (CASE event_type $w ELSE 0.0 END) * value ELSE 0.0 END) AS wsum,
       |    sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
       |             THEN CASE event_type $w ELSE 0.0 END ELSE 0.0 END) AS wtotal,
       |    count(*) AS n_events
       |  FROM events
       |  GROUP BY user_id
       |)
       |SELECT user_id, round(wsum / wtotal, 6) AS pref, n_events
       |FROM g
       |WHERE wtotal > 0
       |ORDER BY pref DESC, user_id ASC
       |LIMIT 100""".stripMargin
  }

  /** Number of documents profiled by the TF-IDF query. */
  val TfidfDocs = 20
  /** Terms emitted per document. */
  val TfidfTop = 5

  private val normSpark = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
  private val normDuck = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** M8 TF-IDF: tf = term count in doc, idf = ln((N+1)/(df+1)) + 1
    * (smoothed — never divides by zero, deterministic), top-$TfidfTop
    * terms per doc for doc_id < $TfidfDocs. The df aggregate runs over
    * the WHOLE corpus (that is the point of idf); the per-doc ranking
    * only over the profiled subset. ln() differs across libms by ≤1 ulp
    * — 11 digits below the 6 dp rounding, so scores are engine-stable.
    */
  def tfidfTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(expr(normSpark), " ")).as("term"))
    // corpus size as a broadcast 1-row aggregate, not a driver .count()
    val n = Tables.documents(spark, sfDir).agg(countDistinct(col("doc_id")).as("n_docs"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.where(col("doc_id") < TfidfDocs)
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= TfidfTop)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  val tfidfTermsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split($normDuck, ' ')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
       |), n AS (
       |  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
       |), scored AS (
       |  SELECT doc_id, term, tf, df,
       |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |  WHERE doc_id < $TfidfDocs
       |), ranked AS (
       |  SELECT doc_id, term, tf, df, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
       |  FROM scored
       |)
       |SELECT doc_id, rk, term, tf, df, tfidf
       |FROM ranked WHERE rk <= $TfidfTop
       |ORDER BY doc_id, rk""".stripMargin

  /** M8b TF-IDF document similarity: cosine over the sparse TF-IDF
    * vectors of the profiled docs via an inverted-index join on term —
    * the same join shape the shingle pipelines use (no dense vectors
    * materialized; at corpus scale hot terms would be df-capped).
    */
  def tfidfDocSim(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(expr(normSpark), " ")).as("term"))
    val n = Tables.documents(spark, sfDir).agg(countDistinct(col("doc_id")).as("n_docs"))
    // tf rows ARE the distinct (doc, term) pairs, so df derives from
    // tf instead of a second explode pass; severed once because tf
    // feeds df AND the vector build (r9s2 rescan sweep)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val vec = tf.where(col("doc_id") < TfidfDocs)
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("wt", col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
      // bounded: TfidfDocs docs' vectors feed the norms AND both
      // sides of the term self-join
      .localCheckpoint()
    val norms = vec.groupBy("doc_id").agg(sqrt(sum(col("wt") * col("wt"))).as("nrm"))
    val dots = vec.as("x").join(vec.as("y"),
        col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(sum(col("x.wt") * col("y.wt")).as("dot"))
    dots
      // corpus-sized norm table (a row per doc): unhinted — AQE
      // broadcasts from runtime stats locally, shuffled equi-join at scale
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
      .withColumn("cos", round(col("dot") / (col("na") * col("nb")), 4))
      .select("doc_a", "doc_b", "cos")
      .orderBy(col("cos").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(25)
  }

  /** Cosine sums fold in shuffle order, so the oracle rounds to 4 dp
    * (vs 6 elsewhere) to absorb summation-order noise in the dot
    * products; ranking ties break on (doc_a, doc_b).
    */
  val tfidfDocSimSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split($normDuck, ' ')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
       |), n AS (
       |  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
       |), vec AS (
       |  SELECT doc_id, term, tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS wt
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |  WHERE doc_id < $TfidfDocs
       |), norms AS (
       |  SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM vec GROUP BY doc_id
       |), dots AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, sum(x.wt * y.wt) AS dot
       |  FROM vec x JOIN vec y ON x.term = y.term AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 4) AS cos
       |FROM dots
       |JOIN norms na ON na.doc_id = doc_a
       |JOIN norms nb ON nb.doc_id = doc_b
       |ORDER BY cos DESC, doc_a ASC, doc_b ASC
       |LIMIT 25""".stripMargin

  /** Misra–Gries counter budget. The exact-verify threshold is 1/1000
    * of the stream; the MG deficit bound N/(k+1) = N/1025 is strictly
    * below it, so the candidate set provably contains every reported
    * key at ANY data size — which is what lets a sketch whose internal
    * state is merge-order-dependent still back a hash-exact oracle.
    */
  val HhK = 1024
  /** Report keys with frequency ≥ 1/HhDen of the stream. */
  val HhDen = 1000L

  /** Heavy hitters over the lineitem supplier stream: sketch → exact.
    * Pass 1 runs the [[graft.functions.MisraGries]] summary (one
    * bounded buffer per partition, a k-entry array per partition on the
    * shuffle — no groupBy of the full key space); pass 2 re-counts ONLY
    * the surviving candidates (broadcast semi join) and applies the
    * exact integer threshold cnt·HhDen ≥ N. Output is exact, so the
    * DuckDB oracle is the plain two-aggregate formulation. At 100 TB
    * the sketch pass is the point: the exact pass's groupBy touches
    * only rows whose key is in a ≤k-entry broadcast set.
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_suppkey").cast("long").as("k"))
    val cands = li.agg(graft.functions.MisraGries.misraGries(HhK, col("k")).as("cs"))
      .select(explode(col("cs")).as("k"))
    val total = li.agg(count(lit(1)).as("total_n"))
    li.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * HhDen >= col("total_n"))
      .select(col("k").as("suppkey"), col("cnt"),
              round(col("cnt") / col("total_n").cast("double"), 6).as("frac"))
      .orderBy(col("cnt").desc, col("suppkey").asc)
  }

  val heavyHittersSql: String =
    s"""WITH c AS (
       |  SELECT l_suppkey AS suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
       |), n AS (
       |  SELECT count(*) AS total_n FROM lineitem
       |)
       |SELECT suppkey, cnt, round(cnt / total_n::DOUBLE, 6) AS frac
       |FROM c CROSS JOIN n
       |WHERE cnt * $HhDen >= total_n
       |ORDER BY cnt DESC, suppkey ASC""".stripMargin

  /** CMS depth (independent hash rows). */
  val CmsDepth = 4
  /** CMS width (buckets per row). */
  val CmsWidth = 256
  /** Keys audited against the sketch. */
  val CmsProbeK = 20
  /** Carter–Wegman hash family h_j(k) = ((a_j·k + b_j) mod P) mod W
    * with a_j = CmsA0 + j·CmsAStep, b_j = CmsB0 + j·CmsBStep — the
    * textbook pairwise-independent CMS family, pure 64-bit integer
    * arithmetic (max product ≈ 5e6·2³¹ « 2⁶³). Replaced the earlier
    * md5-substring hash: per-row MessageDigest over 4× the corpus was
    * the whole query's cost (~4 s steady-state at sf0.1 → sub-second),
    * and an LCG-mod-prime family is the theoretically standard choice
    * anyway. Integer math is bit-identical cross-engine by
    * construction. */
  val CmsP = 2147483647L
  val CmsA0 = 1103627L
  val CmsAStep = 1217771L
  val CmsB0 = 12345L
  val CmsBStep = 67891L
  /** The shared hash expression (identical text runs in Spark SQL and
    * DuckDB): bucket of key `k` under hash row `j`. */
  def cmsBucket(j: String, k: String): String =
    s"((($CmsA0 + $j * $CmsAStep) * $k + $CmsB0 + $j * $CmsBStep) % $CmsP) % $CmsWidth"

  /** Count-min sketch over the lineitem supplier stream, audited
    * against exact counts — completes the sketch family (HLL twin,
    * linear counting, Bloom, Misra–Gries, MinHash/SimHash). The
    * Spark-first insight: a CMS is just a BOUNDED GROUP-BY — cell
    * (j, b) = count of rows hashing to bucket b under hash j — so
    * Catalyst's partial aggregation IS the sketch merge (cell-wise
    * sum, commutative), and no custom TypedImperativeAggregate is
    * needed; the whole summary is depth × width = 1024 cells
    * regardless of corpus size. Estimates depend only on final cell
    * values, so they are exactly engine-reproducible (unlike MG,
    * whose internal state is order-dependent — which is why THAT one
    * needed the exact re-count pass). est(key) = min_j cell(j, h_j) ≥
    * true count always; the output reports estimate, exact, and the
    * overestimate (≥ 0 invariant, spec-pinned) for the top probe keys.
    *
    * At 100 TB: the corpus is read once with a 4× map-side explode and
    * collapses into the 1024-cell aggregate; the probe join rides a
    * broadcast of those cells. The exact column here is the AUDIT —
    * a production stream would ship only the cells.
    */
  def cmSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_suppkey").cast("long").as("k"))
    val cells = li
      .select(explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("j"), col("k"))
      .withColumn("b", expr(cmsBucket("j", "k")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val probes = li.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("k").asc).limit(CmsProbeK)
      .select(explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("j"),
              col("k"), col("exact_cnt"))
      .withColumn("b", expr(cmsBucket("j", "k")))
    probes.join(broadcast(cells), Seq("j", "b"))
      .groupBy("k", "exact_cnt")
      .agg(min("c").as("cms_est"))
      .select(col("k").as("suppkey"), col("exact_cnt"), col("cms_est"),
              (col("cms_est") - col("exact_cnt")).as("overestimate"))
      .orderBy(col("exact_cnt").desc, col("suppkey").asc)
  }

  val cmSketchSql: String =
    s"""WITH li AS (
       |  SELECT l_suppkey::BIGINT AS k FROM lineitem
       |), hs AS (
       |  SELECT unnest(range($CmsDepth)) AS j
       |), rws AS (
       |  SELECT hs.j, li.k,
       |    ${cmsBucket("hs.j", "li.k")} AS b
       |  FROM li CROSS JOIN hs
       |), cells AS (
       |  SELECT j, b, count(*) AS c FROM rws GROUP BY j, b
       |), probes AS (
       |  SELECT k, count(*) AS exact_cnt FROM li GROUP BY k
       |  ORDER BY exact_cnt DESC, k ASC LIMIT $CmsProbeK
       |), pj AS (
       |  SELECT p.k, p.exact_cnt, hs.j,
       |    ${cmsBucket("hs.j", "p.k")} AS b
       |  FROM probes p CROSS JOIN hs
       |), est AS (
       |  SELECT pj.k, pj.exact_cnt, min(c.c)::BIGINT AS cms_est
       |  FROM pj JOIN cells c ON c.j = pj.j AND c.b = pj.b
       |  GROUP BY pj.k, pj.exact_cnt
       |)
       |SELECT k AS suppkey, exact_cnt, cms_est,
       |  (cms_est - exact_cnt)::BIGINT AS overestimate
       |FROM est
       |ORDER BY exact_cnt DESC, suppkey ASC""".stripMargin

  /** Keys reported by the skew profiler. */
  val SkewTop = 10

  /** Join-key skew profiler: the diagnostic every shuffle-heavy
    * pipeline runs before picking a partitioning strategy. One exact
    * aggregate over the fact table's join key (l_partkey), then the
    * top [[SkewTop]] keys with their share and cumulative share of all
    * rows, plus the uniform-expectation multiple (share × n_keys — how
    * many times hotter than uniform this key runs). The numbers are
    * exact integers and single IEEE divisions; at 100 TB this is the
    * query whose output decides between plain hash join, AQE skew
    * split, and manual salting.
    */
  def skewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum("n_rows").as("total_rows"), count(lit(1)).as("n_keys"))
    val top = counts
      .orderBy(col("n_rows").desc, col("l_partkey").asc)
      .limit(SkewTop)
    top.crossJoin(broadcast(totals))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_rows").desc, col("l_partkey").asc)))
      .withColumn("share", round(col("n_rows") / col("total_rows"), 6))
      .withColumn("cum_share", round(
        sum(col("n_rows")).over(Window.orderBy(col("n_rows").desc, col("l_partkey").asc)
          .rowsBetween(Window.unboundedPreceding, 0)) / col("total_rows"), 6))
      .withColumn("x_uniform", round(col("n_rows") * col("n_keys") / col("total_rows"), 4))
      .select("rk", "l_partkey", "n_rows", "share", "cum_share", "x_uniform")
      .orderBy("rk")
  }

  val skewProfileSql: String =
    s"""WITH counts AS (
       |  SELECT l_partkey, count(*) AS n_rows FROM lineitem GROUP BY l_partkey
       |), totals AS (
       |  SELECT sum(n_rows)::BIGINT AS total_rows, count(*) AS n_keys FROM counts
       |), ranked AS (
       |  SELECT l_partkey, n_rows,
       |    row_number() OVER (ORDER BY n_rows DESC, l_partkey ASC) AS rk,
       |    sum(n_rows) OVER (ORDER BY n_rows DESC, l_partkey ASC
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM counts
       |)
       |SELECT rk, l_partkey, n_rows,
       |  round(n_rows / total_rows::DOUBLE, 6) AS share,
       |  round(cum / total_rows::DOUBLE, 6) AS cum_share,
       |  round(n_rows * n_keys / total_rows::DOUBLE, 4) AS x_uniform
       |FROM ranked CROSS JOIN totals
       |WHERE rk <= $SkewTop
       |ORDER BY rk""".stripMargin

  /** Incremental-state split date: rows shipped before it are the
    * "materialized state", the rest are the "delta batch".
    */
  val IncrSplit = "1998-01-01"

  /** Incremental aggregation by state merge — the pattern behind every
    * incrementally-maintained rollup: the historical partition's
    * PARTIAL aggregate (count/sum/min/max per group, materialized once)
    * unions with the delta batch's partial aggregate and re-aggregates
    * with the merge functions (sum of sums, min of mins …), never
    * rescanning history. The oracle recomputes from scratch — equality
    * IS the correctness property of mergeable state. n_base/n_delta
    * expose that both sides actually contributed.
    */
  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
    val split = lit(IncrSplit).cast("timestamp_ntz")
    def partial(df: DataFrame): DataFrame = df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"),
           min("l_extendedprice").as("min_price"), max("l_extendedprice").as("max_price"))
    val base  = partial(li.where(col("l_shipdate") < split)).withColumn("src", lit("base"))
    val delta = partial(li.where(col("l_shipdate") >= split)).withColumn("src", lit("delta"))
    base.unionByName(delta)
      .groupBy("l_returnflag")
      .agg(sum("n_rows").as("n_rows"),
           round(sum("sum_qty"), 4).as("sum_qty"),
           min("min_price").as("min_price"),
           max("max_price").as("max_price"),
           sum(when(col("src") === "base", col("n_rows")).otherwise(0L)).as("n_base"),
           sum(when(col("src") === "delta", col("n_rows")).otherwise(0L)).as("n_delta"))
      .orderBy("l_returnflag")
  }

  val incrementalAggSql: String =
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |  round(sum(l_quantity), 4) AS sum_qty,
       |  min(l_extendedprice) AS min_price,
       |  max(l_extendedprice) AS max_price,
       |  sum(CASE WHEN l_shipdate < TIMESTAMP '$IncrSplit' THEN 1 ELSE 0 END)::BIGINT AS n_base,
       |  sum(CASE WHEN l_shipdate >= TIMESTAMP '$IncrSplit' THEN 1 ELSE 0 END)::BIGINT AS n_delta
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** Join-explosion planner — [[skewProfile]]'s sibling for the
    * decision that precedes it: before ANY self-join or fact⋈fact
    * shuffle ships, what does each candidate key cost? For every
    * candidate (table, key): exact key cardinality, max and average
    * fanout, the hottest key, and the exact self-join output size
    * Σ n(k)² — the number that decides whether a CF-style pair
    * expansion needs a per-key cap (the [[Recsys]] UserCap exists
    * because of exactly this quantity). One by-key aggregate per
    * candidate (map-side combinable), a 1-row summary, and a
    * TakeOrderedAndProject(1) for the hot key — each candidate audits
    * independently, so no window ever partitions on the tiny
    * candidate label.
    */
  def joinExplosion(spark: SparkSession, sfDir: String): DataFrame = {
    def audit(df: DataFrame, candidate: String, keyCol: String): DataFrame = {
      val byKey = df.groupBy(col(keyCol).cast("long").as("k"))
        .agg(count(lit(1)).as("cnt"))
      val agg = byKey.agg(
        sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
        max("cnt").as("max_fanout"),
        sum(col("cnt") * col("cnt")).as("est_self_join_rows"))
      val top = byKey.orderBy(col("cnt").desc, col("k").asc).limit(1)
        .select(col("k").as("top_key"), col("cnt").as("top_fanout"))
      agg.crossJoin(broadcast(top)).withColumn("candidate", lit(candidate))
    }
    val l = Tables.lineitem(spark, sfDir)
    audit(Tables.events(spark, sfDir), "events.user_id", "user_id")
      .unionByName(audit(l, "lineitem.l_orderkey", "l_orderkey"))
      .unionByName(audit(l, "lineitem.l_partkey", "l_partkey"))
      .unionByName(audit(Tables.orders(spark, sfDir), "orders.o_custkey", "o_custkey"))
      .withColumn("avg_fanout_x100", expr("(n_rows * 100) div n_keys"))
      .select(col("candidate"), col("n_rows"), col("n_keys"), col("max_fanout"),
              col("avg_fanout_x100"), col("est_self_join_rows"),
              col("top_key"), col("top_fanout"))
      .orderBy("candidate")
  }

  val joinExplosionSql: String = {
    def block(candidate: String, table: String, key: String): String =
      s"""SELECT '$candidate' AS candidate,
         |  sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
         |  max(cnt)::BIGINT AS max_fanout,
         |  ((sum(cnt) * 100) // count(*))::BIGINT AS avg_fanout_x100,
         |  sum(cnt * cnt)::BIGINT AS est_self_join_rows,
         |  (SELECT k FROM (SELECT $key::BIGINT AS k, count(*) AS cnt FROM $table GROUP BY 1)
         |     ORDER BY cnt DESC, k ASC LIMIT 1) AS top_key,
         |  (SELECT cnt FROM (SELECT $key::BIGINT AS k, count(*) AS cnt FROM $table GROUP BY 1)
         |     ORDER BY cnt DESC, k ASC LIMIT 1)::BIGINT AS top_fanout
         |FROM (SELECT $key::BIGINT AS k, count(*) AS cnt FROM $table GROUP BY 1)""".stripMargin
    Seq(
      block("events.user_id", "events", "user_id"),
      block("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      block("lineitem.l_partkey", "lineitem", "l_partkey"),
      block("orders.o_custkey", "orders", "o_custkey"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
  }

  val queries: Map[String, Q] = Map(
    "q_join_explosion"     -> (joinExplosion _),
    "q_skew_profile"       -> (skewProfile _),
    "q_incremental_agg"    -> (incrementalAgg _),
    "q_udaf_weighted_pref" -> (udafWeightedPref _),
    "q_tfidf_terms"        -> (tfidfTerms _),
    "q_tfidf_doc_sim"      -> (tfidfDocSim _),
    "q_heavy_hitters"      -> (heavyHitters _),
    "q_cms_counts"         -> (cmSketch _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_join_explosion"     -> joinExplosionSql,
    "q_skew_profile"       -> skewProfileSql,
    "q_incremental_agg"    -> incrementalAggSql,
    "q_udaf_weighted_pref" -> udafWeightedPrefSql,
    "q_tfidf_terms"        -> tfidfTermsSql,
    "q_tfidf_doc_sim"      -> tfidfDocSimSql,
    "q_heavy_hitters"      -> heavyHittersSql,
    "q_cms_counts"         -> cmSketchSql,
  )
}
