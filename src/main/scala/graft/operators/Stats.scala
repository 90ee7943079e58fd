package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced OLAP / optimizer-statistics operators: skyline (Pareto
  * front), exact equi-depth histogram, differentially-private release
  * counts, and sliding-window distinct users.
  *
  * Scale designs (the whole point of this file):
  *
  *  - Skyline uses the classic two-phase pruning: a LOCAL skyline per
  *    hash bucket (any subset-dominance implies global dominance, so
  *    bucket-local filtering is sound) shrinks n points to ~buckets ×
  *    |skyline| survivors, and only that tiny set flows through the
  *    global single-task pass. The O(n²) NOT-EXISTS formulation (the
  *    DuckDB oracle) never runs on Spark.
  *
  *  - The equi-depth histogram is EXACT yet fully distributed: instead
  *    of a global ntile sort over all rows, it aggregates to distinct
  *    values, range-partitions them, computes a per-partition prefix
  *    sum in parallel windows keyed by partition id, stitches
  *    partitions with a driver-side offset table (|partitions| rows —
  *    the one legitimate collect), and assigns each value's global
  *    rank interval to ntile buckets in closed form. At 100 TB the
  *    only global structure is the range partitioner's sample.
  *
  *  - Sliding distinct-users turns the per-day range self-join
  *    (days × events) into a 7× explode of deduplicated (user, day)
  *    pairs followed by one narrow shuffle — the standard rewrite that
  *    keeps sliding DAU linear in input size.
  */
object Stats {

  type Q = (SparkSession, String) => DataFrame

  /** Local-skyline pruning buckets. More buckets = more parallelism in
    * phase 1 and more survivors into phase 2; survivors ≈ buckets ×
    * E|skyline| ≈ buckets × ln(n) for random points — thousands at
    * most, so phase 2's single task is never the bottleneck. */
  val SkylineBuckets = 32

  /** Pareto front over parts: minimize p_retailprice, maximize p_size
    * (cheapest part at every size level). A point is dominated iff
    * another point is ≤ on price AND ≥ on size and strictly better on
    * at least one. Emits the non-dominated (price, size) points with
    * the number of parts at each.
    *
    * Phase shape: groupBy to distinct points → window per hash bucket
    * (sorted by price asc, size desc, a point survives iff its size
    * exceeds every preceding size — sound and complete for strict
    * 2-D dominance over distinct points) → identical window globally
    * over the few survivors.
    */
  def paretoFront(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.part(spark, sfDir)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    def skyline(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn("mx", max("size").over(w.orderBy(col("price").asc, col("size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("mx").isNull || col("size") > col("mx"))
        .drop("mx")
    val local = skyline(
      pts.withColumn("bkt", pmod(hash(col("price"), col("size")), lit(SkylineBuckets))),
      Window.partitionBy("bkt")).drop("bkt")
    skyline(local, Window.partitionBy())
      .select("price", "size", "n_parts")
      .orderBy("price", "size")
  }

  val paretoFrontSql: String =
    """WITH pts AS (
      |  SELECT p_retailprice AS price, p_size AS size, count(*) AS n_parts
      |  FROM part GROUP BY 1, 2
      |)
      |SELECT price, size, n_parts FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.price <= p.price AND q.size >= p.size
      |    AND (q.price < p.price OR q.size > p.size))
      |ORDER BY price, size""".stripMargin

  /** Equi-depth histogram buckets (the optimizer-statistics default). */
  val HistBuckets = 10

  /** Coarse prefix-sum bucket width over the l_extendedprice domain
    * (~900..105000 → ~21 coarse buckets). At 100 TB these boundaries
    * would come from approx_percentile instead of a fixed width; the
    * mechanism below is unchanged. */
  val HistCoarseWidth = 5000

  /** Exact equi-depth histogram of l_extendedprice in [[HistBuckets]]
    * buckets with SQL ntile semantics (first n%B buckets take the
    * extra row), computed WITHOUT a global row sort:
    *
    *  1. aggregate to (value, cnt) — bounded by the value domain, not
    *     row count;
    *  2. global rank intervals via a two-level prefix sum keyed by a
    *     DETERMINISTIC coarse bucket of the value itself
    *     (floor(v / width)): within-coarse cumulative counts run as
    *     parallel windows, the coarse totals (a few dozen rows) take
    *     one tiny global prefix window and broadcast back as offsets.
    *     No spark_partition_id, no collect — re-execution of any
    *     subtree cannot change an assignment;
    *  3. closed-form ntile: with q = n div B, rem = n mod B, bucket
    *     boundaries E(b) = b·q + min(b, rem); a value's rows land in
    *     buckets bucket(lo)..bucket(hi) with exact per-bucket counts
    *     — independent of any tie-break, since equal values occupy a
    *     contiguous rank range.
    *
    * Per-bucket stats: row count, min/max value, mean (exact weighted
    * sum).
    */
  def equidepthHist(spark: SparkSession, sfDir: String): DataFrame = {
    val byVal = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_extendedprice").as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("coarse", floor(col("v") / HistCoarseWidth).cast("long"))
    val wIn = Window.partitionBy("coarse").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byVal.withColumn("cum_in", sum("cnt").over(wIn))
    val totals = byVal.groupBy("coarse").agg(sum("cnt").as("tot"))
    val wPre = Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals
      .withColumn("off", coalesce(sum("tot").over(wPre), lit(0L)))
      .select("coarse", "off")
    val nDf = totals.agg(sum("tot").as("n"))
    // Integer-exact ceils; q/rem are columns of the broadcast n scalar.
    def bucketOf(r: String): String =
      s"CASE WHEN $r <= rem * (q + 1) THEN ($r + q) DIV (q + 1) " +
      s"ELSE rem + ($r - rem * (q + 1) + q - 1) DIV q END"
    val ranked = local.join(broadcast(offs), "coarse")
      .crossJoin(broadcast(nDf))
      .withColumn("q", expr(s"n DIV $HistBuckets"))
      .withColumn("rem", expr(s"n % $HistBuckets"))
      .withColumn("hi", col("cum_in") + col("off"))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn("b_lo", expr(bucketOf("lo")))
      .withColumn("b_hi", expr(bucketOf("hi")))
      .withColumn("bucket", explode(expr("sequence(b_lo, b_hi)")))
      // E(b) = b*q + least(b, rem); rows of v in bucket b is the
      // overlap of [lo, hi] with (E(b-1), E(b)].
      .withColumn("e_b", col("bucket") * col("q") + least(col("bucket"), col("rem")))
      .withColumn("e_prev",
        (col("bucket") - 1) * col("q") + least(col("bucket") - 1, col("rem")))
      .withColumn("rows_in",
        least(col("hi"), col("e_b")) - greatest(col("lo"), col("e_prev") + 1) + 1)
    ranked.groupBy("bucket")
      .agg(sum("rows_in").as("n_rows"),
           min("v").as("min_v"),
           max("v").as("max_v"),
           round(sum(col("v") * col("rows_in")) / sum("rows_in"), 4).as("avg_v"))
      .orderBy("bucket")
  }

  val equidepthHistSql: String =
    s"""WITH r AS (
       |  SELECT l_extendedprice AS v,
       |    ntile($HistBuckets) OVER (ORDER BY l_extendedprice) AS bucket
       |  FROM lineitem
       |)
       |SELECT bucket, count(*) AS n_rows,
       |  min(v) AS min_v, max(v) AS max_v,
       |  round(sum(v) / count(*), 4) AS avg_v
       |FROM r
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  /** Privacy budget for the DP release (Laplace scale = 1/ε). */
  val DpEps = 1.0

  /** Differentially-private release of the daily event-type counts:
    * true count plus Laplace(1/ε) noise via inverse-CDF sampling of a
    * DETERMINISTIC hash-derived uniform (u = md5(key)/2³² − ½, noise =
    * −(1/ε)·sign(u)·ln(1−2|u|)) — the production shape of a DP count
    * release (sensitivity 1 per (type, day) cell), made replayable so
    * the oracle can reproduce it bit-for-bit. Companion to the
    * k-anonymity audit (PipelineOps.kAnonymity): that one measures
    * re-identification risk, this one bounds it by mechanism.
    *
    * Scale: one narrow groupBy on a low-cardinality composite key; the
    * noise is a per-row scalar expression — no extra pass.
    */
  def dpCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat_ws('|', event_type, cast(day AS string), 'dp')), 1, 8), 16, 10) AS bigint)"))
      // (h + .5)/2³² keeps u strictly inside (−.5, .5): ln(1−2|u|)
      // stays finite for every key.
      .withColumn("u", (col("h") + 0.5) / 4294967296.0 - 0.5)
      .withColumn("noise",
        lit(-1.0 / DpEps) * signum(col("u")) * log(lit(1.0) - lit(2.0) * abs(col("u"))))
      .withColumn("noisy_n", round(col("n_events") + col("noise"), 4))
      .select("day", "event_type", "n_events", "noisy_n")
      .orderBy("day", "event_type")

  val dpCountsSql: String =
    s"""WITH c AS (
       |  SELECT event_type, ts::TIMESTAMP::DATE AS day, count(*) AS n_events
       |  FROM events GROUP BY 1, 2
       |), u AS (
       |  SELECT *,
       |    (('0x' || substr(md5(event_type || '|' || day::VARCHAR || '|' || 'dp'), 1, 8))::BIGINT + 0.5)
       |      / 4294967296.0 - 0.5 AS uu
       |  FROM c
       |)
       |SELECT day, event_type, n_events,
       |  round(n_events + (-1.0 / $DpEps) * sign(uu) * ln(1.0 - 2.0 * abs(uu)), 4) AS noisy_n
       |FROM u
       |ORDER BY day, event_type""".stripMargin

  /** Trailing window of the sliding distinct-user count, in days. */
  val DauWindowDays = 7

  /** 7-day sliding distinct active users per day. Each deduplicated
    * (user, day) pair is exploded into the [[DauWindowDays]] window-end
    * days it contributes to (capped at the corpus max day), then one
    * groupBy counts distinct users per window end — linear in input,
    * no range self-join, no per-day rescan.
    */
  def slidingDau(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val maxDay = ud.agg(max("d").as("max_d"))
    ud.crossJoin(broadcast(maxDay))
      .withColumn("day", explode(expr(s"sequence(d, least(date_add(d, ${DauWindowDays - 1}), max_d))")))
      .groupBy("day")
      .agg(countDistinct("user_id").as("users_7d"))
      .orderBy("day")
  }

  val slidingDauSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, ts::TIMESTAMP::DATE AS d FROM events
       |), wins AS (
       |  SELECT DISTINCT d + i::INTEGER AS day
       |  FROM (SELECT DISTINCT d FROM ud), range(0, $DauWindowDays) t(i)
       |  WHERE d + i::INTEGER <= (SELECT max(d) FROM ud)
       |)
       |SELECT w.day, count(DISTINCT u.user_id) AS users_7d
       |FROM wins w JOIN ud u
       |  ON u.d BETWEEN w.day - ${DauWindowDays - 1} AND w.day
       |GROUP BY w.day
       |ORDER BY w.day""".stripMargin

  /** Bootstrap replicas. */
  val BootB = 50
  /** Laplace-free uniform → Poisson(1) inverse-CDF thresholds
    * (cumulative e⁻¹·Σ1/k!): literal doubles, identical both engines. */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Poisson bootstrap CI for the mean purchase value — THE scalable
    * bootstrap (Chamandy et al.): instead of resampling n rows with
    * replacement per replica (a shuffle per replica), each row draws an
    * independent Poisson(1) weight per replica — one map-side explode,
    * one narrow aggregate, B replica means. Weights come from a
    * DETERMINISTIC hash uniform through the Poisson inverse CDF, so
    * the whole CI is replayable and oracle-backed. CI bounds are exact
    * order statistics of the replica means (2nd / 49th of 50) — no
    * quantile interpolation to disagree on.
    *
    * Scale: input × B rows flow through codegen (no shuffle until the
    * B-row replica aggregate); B controls cost linearly and the final
    * stats are over B values regardless of corpus size.
    */
  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    val w = PoissonCdf.zipWithIndex
      .foldRight("8") { case ((c, k), e) => s"CASE WHEN u < $c THEN $k ELSE $e END" }
    val rep = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
      .withColumn("b", explode(expr(s"sequence(1, $BootB)")))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat_ws(':', cast(event_id AS string), cast(b AS string), 'boot')), 1, 8), 16, 10) AS bigint)"))
      .withColumn("u", (col("h") + 0.5) / 4294967296.0)
      .withColumn("w", expr(w))
      .groupBy("b")
      .agg((sum(col("w") * col("value")) / sum("w")).as("mean_b"))
    val ranked = rep
      .withColumn("rk", row_number().over(Window.orderBy(col("mean_b").asc, col("b").asc)))
    val point = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n_obs"), round(avg("value"), 4).as("mean_value"))
    point.crossJoin(broadcast(ranked.agg(
        round(min(when(col("rk") === 2, col("mean_b"))), 4).as("ci_lo"),
        round(min(when(col("rk") === BootB - 1, col("mean_b"))), 4).as("ci_hi"),
        round(stddev_samp(col("mean_b")), 4).as("se_boot"))))
      .select("n_obs", "mean_value", "ci_lo", "ci_hi", "se_boot")
  }

  val bootstrapCiSql: String = {
    val w = PoissonCdf.zipWithIndex
      .foldRight("8") { case ((c, k), e) => s"CASE WHEN u < $c THEN $k ELSE $e END" }
    s"""WITH src AS (
       |  SELECT event_id, value FROM events WHERE event_type = 'purchase'
       |), expanded AS (
       |  SELECT s.value, t.b,
       |    (('0x' || substr(md5(s.event_id || ':' || t.b || ':' || 'boot'), 1, 8))::BIGINT + 0.5)
       |      / 4294967296.0 AS u
       |  FROM src s CROSS JOIN (SELECT unnest(range(1, $BootB + 1)) AS b) t
       |), weighted AS (
       |  SELECT value, b, $w AS w FROM expanded
       |), rep AS (
       |  SELECT b, sum(w * value) / sum(w) AS mean_b FROM weighted GROUP BY b
       |), ranked AS (
       |  SELECT mean_b, row_number() OVER (ORDER BY mean_b ASC, b ASC) AS rk FROM rep
       |), ci AS (
       |  SELECT
       |    round(min(CASE WHEN rk = 2 THEN mean_b END), 4) AS ci_lo,
       |    round(min(CASE WHEN rk = ${BootB - 1} THEN mean_b END), 4) AS ci_hi,
       |    round(stddev_samp(mean_b), 4) AS se_boot
       |  FROM ranked
       |)
       |SELECT (SELECT count(*) FROM src) AS n_obs,
       |  (SELECT round(avg(value), 4) FROM src) AS mean_value,
       |  ci_lo, ci_hi, se_boot
       |FROM ci""".stripMargin
  }

  /** Trailing frame (rows) for the rolling median. */
  val MedianWindow = 7

  /** 7-point rolling EXACT median of the daily value total per event
    * type — the robust-trend smoother (EWMA's outlier-immune
    * companion, see q_ewma_smooth). `percentile(v, 0.5)` over a ROWS
    * frame interpolates exactly like DuckDB's windowed `median`, so
    * the query is fully oracle-backed; daily totals are rounded
    * BEFORE the median so both engines rank identical doubles.
    *
    * Scale: the frame is bounded (7 rows) and the series is bounded
    * by calendar days × event types, so the window state is O(1) per
    * row and the partition count is fixed — a 100 TB corpus changes
    * only the one narrow daily pre-aggregate.
    */
  def rollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 4).as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-(MedianWindow - 1), Window.currentRow)
    daily
      .withColumn("med_7d", round(expr("percentile(v, 0.5)").over(w), 4))
      .withColumn("n_win", count(lit(1)).over(w))
      .select("event_type", "day", "v", "med_7d", "n_win")
      .orderBy("event_type", "day")
  }

  val rollingMedianSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, ts::TIMESTAMP::DATE AS day, round(sum(value), 4) AS v
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_type, day, v,
       |  round(median(v) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN ${MedianWindow - 1} PRECEDING AND CURRENT ROW), 4) AS med_7d,
       |  count(*) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN ${MedianWindow - 1} PRECEDING AND CURRENT ROW) AS n_win
       |FROM daily ORDER BY event_type, day""".stripMargin

  /** Trailing frame (rows = days) for the rolling correlation. */
  val CorrWindow = 14

  /** 14-day rolling Pearson correlation between daily purchase revenue
    * and daily total event activity — the feature-engineering signal
    * behind "is monetization tracking engagement this fortnight?".
    * Emitted only for full frames, and NULL-guarded on zero variance
    * (Spark yields NaN, DuckDB NULL — the guard makes both NULL).
    *
    * Scale: like [[rollingMedian]], everything after the first daily
    * aggregate is calendar-bounded; the global single-partition window
    * holds ≤ days rows regardless of corpus size.
    */
  def rollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4).as("rev"),
        count(lit(1)).cast("double").as("acts"))
    val w = Window.orderBy("day").rowsBetween(-(CorrWindow - 1), Window.currentRow)
    daily
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      .withColumn("sd_r", stddev_samp(col("rev")).over(w))
      .withColumn("sd_a", stddev_samp(col("acts")).over(w))
      .withColumn("corr_14d",
        when(col("sd_r") > 0 && col("sd_a") > 0,
          round(corr(col("rev"), col("acts")).over(w), 4)))
      .where(col("rn") >= CorrWindow)
      .select("day", "rev", "acts", "corr_14d")
      .orderBy("day")
  }

  val rollingCorrSql: String =
    s"""WITH daily AS (
       |  SELECT ts::TIMESTAMP::DATE AS day,
       |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS rev,
       |    count(*)::DOUBLE AS acts
       |  FROM events GROUP BY 1
       |), win AS (
       |  SELECT day, rev, acts,
       |    row_number() OVER (ORDER BY day) AS rn,
       |    stddev_samp(rev) OVER w AS sd_r,
       |    stddev_samp(acts) OVER w AS sd_a,
       |    corr(rev, acts) OVER w AS c
       |  FROM daily
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN ${CorrWindow - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT day, rev, acts,
       |  CASE WHEN sd_r > 0 AND sd_a > 0 THEN round(c, 4) END AS corr_14d
       |FROM win WHERE rn >= $CorrWindow ORDER BY day""".stripMargin

  /** Decile edges for the PSI buckets. */
  val PsiQuantiles: Seq[Double] = (1 to 9).map(_ / 10.0)
  /** Laplace pseudo-count per bucket: shares are (n+α)/(tot+B·α), so an
    * empty bucket contributes its honest ~p·ln(p/p̃) instead of the
    * pathological p·ln(p/ε) a hard epsilon clamp produces (one empty
    * decile under a 1e-6 clamp reads as PSI ≈ 1.1 on its own). */
  val PsiAlpha = 0.5
  /** Bucket count (decile edges + 1). */
  val PsiBuckets: Int = PsiQuantiles.size + 1

  /** Population Stability Index of the `value` distribution per event
    * type, current half of the corpus vs the reference (first) half —
    * the standard production drift monitor for ML feature inputs
    * (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 retrain).
    *
    * Decile breakpoints come from the REFERENCE period only (that is
    * the definition: fixed expected bins), are rounded to 4 decimals
    * on both engines before bucketing, and both halves are bucketed
    * with one `aggregate` HOF pass — a missing bucket on either side
    * shows up as a zero count Laplace-smoothed by [[PsiAlpha]].
    *
    * Scale: one exact percentile per event type over the reference
    * half (at 100 TB this becomes approx_percentile — the mechanism
    * is unchanged), a broadcast of the |types|×9 breakpoint table,
    * then one narrow conditional aggregate. No self-joins.
    */
  def psiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = PsiQuantiles.mkString("array(", ", ", ")")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val bounds = ev.agg(min("day").as("min_d"), max("day").as("max_d"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("is_ref",
        datediff(col("day"), col("min_d")) * 2 < datediff(col("max_d"), col("min_d")))
    val bks = tagged.where(col("is_ref"))
      .groupBy("event_type")
      .agg(expr(s"transform(percentile(value, $qs), b -> round(b, 4))").as("bks"))
    val counted = tagged.join(broadcast(bks), "event_type")
      .withColumn("bucket",
        expr("aggregate(bks, 0, (acc, b) -> acc + IF(value > b, 1, 0))"))
      .groupBy("event_type", "bucket")
      .agg(
        sum(when(col("is_ref"), 1).otherwise(0)).as("ref_n"),
        sum(when(!col("is_ref"), 1).otherwise(0)).as("cur_n"))
    val wT = Window.partitionBy("event_type")
    counted
      .withColumn("ref_tot", sum("ref_n").over(wT))
      .withColumn("cur_tot", sum("cur_n").over(wT))
      .withColumn("pr",
        (col("ref_n") + lit(PsiAlpha)) / (col("ref_tot") + lit(PsiBuckets * PsiAlpha)))
      .withColumn("pc",
        (col("cur_n") + lit(PsiAlpha)) / (col("cur_tot") + lit(PsiBuckets * PsiAlpha)))
      .groupBy("event_type")
      .agg(
        round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 4).as("psi"),
        max("ref_tot").as("n_ref"),
        max("cur_tot").as("n_cur"))
      .orderBy("event_type")
  }

  val psiDriftSql: String = {
    val qs = PsiQuantiles.mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
       |), b AS (
       |  SELECT min(day) AS min_d, max(day) AS max_d FROM ev
       |), tagged AS (
       |  SELECT e.*, (day - min_d) * 2 < (max_d - min_d) AS is_ref
       |  FROM ev e CROSS JOIN b
       |), bks AS (
       |  SELECT event_type,
       |    list_transform(quantile_cont(value, $qs), x -> round(x, 4)) AS bks
       |  FROM tagged WHERE is_ref GROUP BY event_type
       |), counted AS (
       |  SELECT t.event_type,
       |    len(list_filter(k.bks, b -> t.value > b)) AS bucket,
       |    sum(CASE WHEN t.is_ref THEN 1 ELSE 0 END) AS ref_n,
       |    sum(CASE WHEN t.is_ref THEN 0 ELSE 1 END) AS cur_n
       |  FROM tagged t JOIN bks k USING (event_type)
       |  GROUP BY 1, 2
       |), tot AS (
       |  SELECT *,
       |    sum(ref_n) OVER (PARTITION BY event_type) AS ref_tot,
       |    sum(cur_n) OVER (PARTITION BY event_type) AS cur_tot
       |  FROM counted
       |), p AS (
       |  SELECT event_type, ref_tot, cur_tot,
       |    (ref_n + $PsiAlpha) / (ref_tot + ${PsiBuckets * PsiAlpha}) AS pr,
       |    (cur_n + $PsiAlpha) / (cur_tot + ${PsiBuckets * PsiAlpha}) AS pc
       |  FROM tot
       |)
       |SELECT event_type,
       |  round(sum((pc - pr) * ln(pc / pr)), 4) AS psi,
       |  max(ref_tot)::BIGINT AS n_ref, max(cur_tot)::BIGINT AS n_cur
       |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Pseudo-count mass of the global prior (Beta-Binomial m). */
  val SmoothM = 20.0
  /** Ranked output size. */
  val SmoothTopN = 20

  /** Empirical-Bayes smoothed per-user purchase rate: shrink each
    * user's raw purchase share toward the global rate with prior mass
    * [[SmoothM]] — the standard fix for "2/2 events beats 180/200" in
    * CTR/popularity ranking (Beta(m·p₀, m·(1−p₀)) posterior mean).
    * Top [[SmoothTopN]] users by the smoothed rate, rate ties broken
    * by user id so the cut is total-ordered on both engines.
    *
    * Scale: one per-user aggregate, a 1-row global prior broadcast,
    * and a TakeOrderedAndProject head — no shuffle beyond the agg.
    */
  def bayesRate(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases"))
    val prior = per.agg(
      (sum("n_purchases").cast("double") / sum("n_events")).as("p0"))
    per.crossJoin(broadcast(prior))
      .withColumn("raw_rate",
        round(col("n_purchases").cast("double") / col("n_events"), 4))
      .withColumn("smoothed_rate",
        round((col("n_purchases") + lit(SmoothM) * col("p0")) / (col("n_events") + lit(SmoothM)), 4))
      .select("user_id", "n_events", "n_purchases", "raw_rate", "smoothed_rate")
      .orderBy(col("smoothed_rate").desc, col("user_id").asc)
      .limit(SmoothTopN)
  }

  val bayesRateSql: String =
    s"""WITH per AS (
       |  SELECT user_id, count(*) AS n_events,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases
       |  FROM events GROUP BY 1
       |), prior AS (
       |  SELECT sum(n_purchases)::DOUBLE / sum(n_events) AS p0 FROM per
       |)
       |SELECT user_id, n_events, n_purchases,
       |  round(n_purchases::DOUBLE / n_events, 4) AS raw_rate,
       |  round((n_purchases + $SmoothM * p0) / (n_events + $SmoothM), 4) AS smoothed_rate
       |FROM per CROSS JOIN prior
       |ORDER BY smoothed_rate DESC, user_id ASC
       |LIMIT $SmoothTopN""".stripMargin

  /** Benford first-digit audit of order totals — the forensic
    * data-quality screen for fabricated or truncated monetary columns:
    * observed leading-digit shares vs the Benford expectation
    * log₁₀(1+1/d), with each digit's χ² contribution. The digit comes
    * from the floor()ed integer part (never a double→int cast, whose
    * rounding mode differs across engines).
    *
    * Scale: a 9-group aggregate over one projected column; the digit
    * is a codegen scalar expression.
    */
  def benford(spark: SparkSession, sfDir: String): DataFrame = {
    val byDigit = Tables.orders(spark, sfDir)
      .withColumn("digit",
        substring(floor(col("o_totalprice")).cast("string"), 1, 1).cast("int"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = byDigit.agg(sum("n").as("tot"))
    byDigit.crossJoin(broadcast(total))
      .withColumn("p_exp", log10(lit(1.0) + lit(1.0) / col("digit")))
      .withColumn("obs_pct", round(col("n").cast("double") / col("tot"), 4))
      .withColumn("benford_pct", round(col("p_exp"), 4))
      .withColumn("chi2_term",
        round(pow(col("n") - col("tot") * col("p_exp"), 2) / (col("tot") * col("p_exp")), 4))
      .select("digit", "n", "obs_pct", "benford_pct", "chi2_term")
      .orderBy("digit")
  }

  val benfordSql: String =
    """WITH d AS (
      |  SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT AS digit,
      |    count(*) AS n
      |  FROM orders GROUP BY 1
      |), t AS (SELECT sum(n) AS tot FROM d)
      |SELECT digit, n,
      |  round(n::DOUBLE / tot, 4) AS obs_pct,
      |  round(log10(1.0 + 1.0 / digit), 4) AS benford_pct,
      |  round(pow(n - tot * log10(1.0 + 1.0 / digit), 2)
      |        / (tot * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
      |FROM d CROSS JOIN t
      |ORDER BY digit""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_rolling_median" -> (rollingMedian _),
    "q_rolling_corr"   -> (rollingCorr _),
    "q_psi_drift"      -> (psiDrift _),
    "q_bayes_rate"     -> (bayesRate _),
    "q_benford"        -> (benford _),
    "q_bootstrap_ci"   -> (bootstrapCi _),
    "q_pareto_front"   -> (paretoFront _),
    "q_equidepth_hist" -> (equidepthHist _),
    "q_dp_counts"      -> (dpCounts _),
    "q_sliding_dau"    -> (slidingDau _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_rolling_median" -> rollingMedianSql,
    "q_rolling_corr"   -> rollingCorrSql,
    "q_psi_drift"      -> psiDriftSql,
    "q_bayes_rate"     -> bayesRateSql,
    "q_benford"        -> benfordSql,
    "q_bootstrap_ci"   -> bootstrapCiSql,
    "q_pareto_front"   -> paretoFrontSql,
    "q_equidepth_hist" -> equidepthHistSql,
    "q_dp_counts"      -> dpCountsSql,
    "q_sliding_dau"    -> slidingDauSql,
  )
}
