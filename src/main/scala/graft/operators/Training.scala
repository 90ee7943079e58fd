package graft.operators

import graft.{QueryCache, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-training data-prep operators: deterministic k-means over the
  * embedding corpus and hash-based negative sampling for implicit-
  * feedback training sets. Both are standard stages between "clean
  * corpus" and "training run" in a large-scale pipeline.
  *
  * Determinism strategy (the file's theme): every floating-point
  * quantity is quantized to integers up front (k-means) or never
  * exists (negative sampling — pure hashing), so BOTH engines compute
  * bit-identical results regardless of summation order, partitioning,
  * or SIMD width — the same fixed-point idiom as
  * [[GraphRank.itemPagerank]].
  *
  * Scale design:
  *  - k-means: centroids are K·dims rows, broadcast into the
  *    assignment join each round; the corpus-side table never
  *    shuffles (assignment is a map-side broadcast join + one
  *    aggregate keyed by vec_id). One aggregate per round for the
  *    update. This is exactly MLlib's plan shape, minus the
  *    nondeterministic float reductions.
  *  - negative sampling: candidates are generated map-side (explode
  *    of a bounded slot range per user), the item index is a
  *    broadcast dimension, and the positives anti-join shuffles each
  *    candidate once on (user, item) — linear in users·slots, never
  *    users×items.
  */
object Training {

  type Q = (SparkSession, String) => DataFrame

  /** k-means cluster count (init = the K lowest vec_ids). */
  val KClusters = 8
  /** Fixed Lloyd's rounds (unrolled identically in the oracle). */
  val KmRounds = 3
  /** Fixed-point scale: embedding value v → q = round((v+1)·1000).
    * Fixture values lie in (−1, 1), so q is always positive — keeping
    * every integer non-negative sidesteps the floor-vs-truncate
    * divergence of integer division on negatives between engines.
    */
  val KmScale = 1000

  /** Deterministic k-means over `embeddings`: quantize each dimension
    * to integer fixed-point, init centroids from the [[KClusters]]
    * lowest vec_ids, run [[KmRounds]] Lloyd's rounds (assign by exact
    * integer squared distance with (dist, cluster) lexicographic
    * tie-break; update by integer floor-division mean), then report
    * per-cluster size, inertia, and a centroid checksum. All
    * arithmetic is BIGINT ⇒ bit-identical across engines — unlike
    * MLlib KMeans, whose float reductions make cluster boundaries
    * run-order-dependent.
    */
  /** Quantized (vec_id, pos, q) long table — shared input of every
    * k-means stage; memoized per (session, sfDir) because the Lloyd's
    * rounds re-read it KmRounds+1 times and SemDeDup reads it again.
    */
  private[graft] def quantizedOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("q", round((col("v").cast("double") + 1.0d) * KmScale, 0).cast("long"))
      .select("vec_id", "pos", "q")

  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    QueryCache.memo(spark, s"kmeans_e:$sfDir") {
      quantizedOf(Tables.embeddings(spark, sfDir))
    }

  private[graft] def kmeansAssignOf(e: DataFrame, cent: DataFrame): DataFrame =
    assign(e, cent)

  private def assign(e: DataFrame, c: DataFrame): DataFrame =
    e.join(broadcast(c), "pos")
      .groupBy("vec_id", "cluster")
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"), col("m.dist").as("dist"))

  /** Converged centroids (cluster, pos, c) after [[KmRounds]] Lloyd's
    * rounds; memoized — q_kmeans_embed and q_semantic_dedup share one
    * training run per session, the feature-store pattern the other
    * model tables follow.
    */
  private[graft] def centroidsOf(e: DataFrame, k: Int): DataFrame = {
    val initIds = e.select("vec_id").distinct().orderBy("vec_id").limit(k)
      .withColumn("cluster", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")))
    var cent = e.join(broadcast(initIds), "vec_id")
      .select(col("cluster"), col("pos"), col("q").as("c"))
      .localCheckpoint()
    for (_ <- 1 to KmRounds) {
      val asn = assign(e, cent)
      cent = e.join(asn.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "pos")
        .agg(expr("sum(q) div count(1)").as("c"))
        .localCheckpoint() // K·dims rows; keep each round's plan flat
    }
    cent
  }

  private[operators] def kmeansCentroids(spark: SparkSession, sfDir: String): DataFrame =
    QueryCache.memo(spark, s"kmeans_cent:$sfDir") {
      centroidsOf(quantized(spark, sfDir), KClusters)
    }

  /** Final assignment (vec_id, cluster, dist) against the converged
    * centroids; memoized for the same sharing reason.
    */
  private[operators] def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame =
    QueryCache.memo(spark, s"kmeans_fin:$sfDir") {
      assign(quantized(spark, sfDir), kmeansCentroids(spark, sfDir))
    }

  def kmeansEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    val cent = kmeansCentroids(spark, sfDir)
    val fin = kmeansAssign(spark, sfDir)
    val centSum = cent.groupBy("cluster").agg(sum("c").as("centroid_checksum"))
    fin.groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"), sum("dist").as("inertia_units"))
      .join(broadcast(centSum), "cluster")
      .select("cluster", "n_vecs", "inertia_units", "centroid_checksum")
      .orderBy("cluster")
  }

  private val KmFinal = KmRounds + 1

  /** Shared oracle CTE chain: quantize (e), init, [[KmRounds]] unrolled
    * assign/update rounds, and the final assignment a{KmFinal}
    * (vec_id, cluster, dist). Reused verbatim by the k-means report and
    * the SemDeDup oracle so both adjudicate the identical model.
    */
  private[operators] val kmeansCteChain: String = {
    val rounds = (1 to KmRounds).map { k =>
      s"""d$k AS (
         |  SELECT e.vec_id, c.cluster, sum((e.q - c.c) * (e.q - c.c))::BIGINT AS dist
         |  FROM e JOIN c${k - 1} c ON e.pos = c.pos
         |  GROUP BY e.vec_id, c.cluster
         |), m$k AS (
         |  SELECT vec_id, min(dist) AS md FROM d$k GROUP BY vec_id
         |), a$k AS (
         |  SELECT d.vec_id, min(d.cluster) AS cluster
         |  FROM d$k d JOIN m$k m ON d.vec_id = m.vec_id AND d.dist = m.md
         |  GROUP BY d.vec_id
         |), c$k AS (
         |  SELECT a.cluster, e.pos, (sum(e.q) // count(*))::BIGINT AS c
         |  FROM e JOIN a$k a ON e.vec_id = a.vec_id
         |  GROUP BY a.cluster, e.pos
         |)""".stripMargin
    }.mkString(", ")
    s"""e AS (
       |  SELECT vec_id, i AS pos,
       |    round((embedding[i]::DOUBLE + 1.0) * $KmScale)::BIGINT AS q
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range(1, (SELECT max(len(embedding)) + 1 FROM embeddings))) AS i)
       |  WHERE i <= len(embedding)
       |), init AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS cluster
       |  FROM (SELECT DISTINCT vec_id FROM e ORDER BY vec_id LIMIT $KClusters)
       |), c0 AS (
       |  SELECT init.cluster, e.pos, e.q AS c
       |  FROM e JOIN init ON e.vec_id = init.vec_id
       |), $rounds, d$KmFinal AS (
       |  SELECT e.vec_id, c.cluster, sum((e.q - c.c) * (e.q - c.c))::BIGINT AS dist
       |  FROM e JOIN c$KmRounds c ON e.pos = c.pos
       |  GROUP BY e.vec_id, c.cluster
       |), m$KmFinal AS (
       |  SELECT vec_id, min(dist) AS md FROM d$KmFinal GROUP BY vec_id
       |), a$KmFinal AS (
       |  SELECT d.vec_id, min(d.cluster) AS cluster, min(d.dist) AS dist
       |  FROM d$KmFinal d JOIN m$KmFinal m ON d.vec_id = m.vec_id AND d.dist = m.md
       |  GROUP BY d.vec_id
       |)""".stripMargin
  }

  /** Oracle: the identical integer recurrence, rounds unrolled as
    * chained CTEs (assign k / update k), 1-based list subscripts.
    */
  val kmeansEmbedSql: String =
    s"""WITH $kmeansCteChain, cs AS (
       |  SELECT cluster, sum(c)::BIGINT AS centroid_checksum FROM c$KmRounds GROUP BY cluster
       |)
       |SELECT a.cluster, count(*) AS n_vecs, sum(a.dist)::BIGINT AS inertia_units,
       |  max(cs.centroid_checksum) AS centroid_checksum
       |FROM a$KmFinal a JOIN cs ON a.cluster = cs.cluster
       |GROUP BY a.cluster
       |ORDER BY a.cluster""".stripMargin

  /** Squared-distance ceiling (fixed-point units) at or below which a
    * within-cluster pair counts as a semantic duplicate. The fixture
    * embeddings are near-random (min pair distance ≈ 0.97M units², 1st
    * percentile ≈ 1.42M), so the ceiling is calibrated to the tightest
    * ~1% of pairs — enough to exercise non-empty removal sets on every
    * SF while staying far under the ~2M random-pair median.
    */
  val SemThreshold = 1300000L

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication in embedding space — cluster the corpus with
    * k-means, then compare pairs ONLY within a cluster and drop the
    * higher-id member of every pair closer than [[SemThreshold]].
    *
    * Scale design — the whole point of the method is replacing the
    * O(n²) all-pairs scan with Σ c_k² intra-cluster work:
    *  - the k-means model is the memoized [[kmeansAssign]] (shared
    *    with q_kmeans_embed — one training run per session);
    *  - pair generation is an equi-join on `cluster`, so candidates
    *    co-locate in one shuffle and no cross-cluster pair is ever
    *    materialized. At production scale KClusters grows ∝ n to hold
    *    the per-cluster quadratic bounded (the paper's n/√k regime) —
    *    same knob the LSH band count plays in [[Dedup]];
    *  - distance is exact integer squared-distance on the fixed-point
    *    vectors via codegen'd zip_with/aggregate HOFs: the +1 shift of
    *    the quantization cancels in the difference, so the comparison
    *    is shift-invariant and bit-identical cross-engine (on unit-norm
    *    embeddings squared distance orders identically to the paper's
    *    cosine).
    *
    * Output: per-cluster audit — vectors, pairs examined, duplicate
    * pairs, removed, kept.
    */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    semanticDedupFrom(Tables.embeddings(spark, sfDir),
      kmeansAssign(spark, sfDir), SemThreshold)

  /** Frame-parameterized core: `emb` (vec_id, embedding) + a cluster
    * assignment (vec_id, cluster) → the per-cluster dedup audit.
    * Exposed for scale validation on synthesized corpora
    * (SemDedupScaleSpec) with the √N cluster sizing the scaladoc
    * prescribes.
    */
  private[graft] def semanticDedupFrom(emb: DataFrame, assignment: DataFrame,
                                       threshold: Long): DataFrame = {
    val qv = emb
      .select(col("vec_id"), expr(
        s"transform(embedding, v -> cast(round((cast(v AS double) + 1.0d) * $KmScale, 0) AS bigint))")
        .as("qv"))
    val v = assignment.select("vec_id", "cluster").join(qv, "vec_id")
    val pairs = v.select(col("cluster"), col("vec_id").as("a"), col("qv").as("qa"))
      .join(v.select(col("cluster"), col("vec_id").as("b"), col("qv").as("qb")),
            Seq("cluster"))
      .where(col("a") < col("b"))
      .withColumn("d", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"))
      .select("cluster", "a", "b", "d")
    val perPair = pairs.groupBy("cluster")
      .agg(count(lit(1)).as("n_pairs"),
           sum((col("d") <= threshold).cast("long")).as("n_dup_pairs"))
    val removed = pairs.where(col("d") <= threshold)
      .select("cluster", "b").distinct()
      .groupBy("cluster").agg(count(lit(1)).as("n_removed"))
    v.groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
      .join(perPair, Seq("cluster"), "left")
      .join(removed, Seq("cluster"), "left")
      .na.fill(0L, Seq("n_pairs", "n_dup_pairs", "n_removed"))
      .withColumn("n_kept", col("n_vecs") - col("n_removed"))
      .select("cluster", "n_vecs", "n_pairs", "n_dup_pairs", "n_removed", "n_kept")
      .orderBy("cluster")
  }

  val semanticDedupSql: String =
    s"""WITH $kmeansCteChain, v AS (
       |  SELECT vec_id, cluster FROM a$KmFinal
       |), p AS (
       |  SELECT v1.cluster, v1.vec_id AS a, v2.vec_id AS b,
       |    sum((e1.q - e2.q) * (e1.q - e2.q))::BIGINT AS d
       |  FROM v v1 JOIN v v2 ON v1.cluster = v2.cluster AND v1.vec_id < v2.vec_id
       |  JOIN e e1 ON e1.vec_id = v1.vec_id
       |  JOIN e e2 ON e2.vec_id = v2.vec_id AND e2.pos = e1.pos
       |  GROUP BY 1, 2, 3
       |), cl AS (
       |  SELECT cluster, count(*) AS n_vecs FROM v GROUP BY cluster
       |), ps AS (
       |  SELECT cluster, count(*) AS n_pairs,
       |    sum(CASE WHEN d <= $SemThreshold THEN 1 ELSE 0 END)::BIGINT AS n_dup_pairs
       |  FROM p GROUP BY cluster
       |), rm AS (
       |  SELECT cluster, count(DISTINCT b) AS n_removed
       |  FROM p WHERE d <= $SemThreshold GROUP BY cluster
       |)
       |SELECT cl.cluster, cl.n_vecs,
       |  coalesce(ps.n_pairs, 0)::BIGINT AS n_pairs,
       |  coalesce(ps.n_dup_pairs, 0)::BIGINT AS n_dup_pairs,
       |  coalesce(rm.n_removed, 0)::BIGINT AS n_removed,
       |  (cl.n_vecs - coalesce(rm.n_removed, 0))::BIGINT AS n_kept
       |FROM cl LEFT JOIN ps ON cl.cluster = ps.cluster
       |LEFT JOIN rm ON cl.cluster = rm.cluster
       |ORDER BY cl.cluster""".stripMargin

  /** Negatives kept per user. */
  val NegK = 5
  /** Candidate slots drawn per user (> NegK to absorb collisions with
    * positives and duplicate draws).
    */
  val NegSlots = 16

  /** Hash-based negative sampling for implicit-feedback training: per
    * user, [[NegSlots]] pseudo-random item draws via the engine-
    * portable h32(md5(user-slot)) hash mapped into a dense item index,
    * deduplicated (min slot wins), anti-joined against the user's
    * positives, and cut to the first [[NegK]] by slot order. The same
    * (user, slot) always yields the same item on any engine, run, or
    * partitioning — the property that makes training sets reproducible
    * and resumable. Output: per-user negative list + checksum.
    */
  def negativeSample(spark: SparkSession, sfDir: String): DataFrame = {
    val pos = Tables.interactions(spark, sfDir)
      .select("user_id", "item_id").distinct()
    val items = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("item_id"))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("item_id")) - 1)
    val nItems = items.agg(count(lit(1)).as("n_items"))
    val cands = pos.select("user_id").distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(NegSlots - 1))).as("slot"))
      .crossJoin(broadcast(nItems))
      .withColumn("idx", expr(
        "cast(conv(substring(md5(concat_ws('-', cast(user_id AS string), cast(slot AS string), 'neg')), 1, 8), 16, 10) AS bigint)") % col("n_items"))
      .join(broadcast(items), "idx")
      // two draws may map to the same item: keep the earliest slot
      .groupBy("user_id", "item_id").agg(min("slot").as("slot"))
    val negs = cands
      .join(pos, Seq("user_id", "item_id"), "left_anti")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("slot").asc, col("item_id").asc)))
      .where(col("rk") <= NegK)
    negs.groupBy("user_id")
      .agg(count(lit(1)).as("n_neg"),
           sum("item_id").as("neg_checksum"),
           concat_ws(",", expr(
             "transform(array_sort(collect_list(struct(rk, item_id))), x -> cast(x.item_id AS string))"))
             .as("neg_items"))
      .orderBy("user_id")
  }

  val negativeSampleSql: String =
    s"""WITH pos AS (
       |  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |), items AS (
       |  SELECT p_partkey AS item_id,
       |    row_number() OVER (ORDER BY p_partkey) - 1 AS idx
       |  FROM part
       |), n AS (
       |  SELECT count(*) AS n_items FROM items
       |), cands AS (
       |  SELECT u.user_id, i.item_id, min(s.slot) AS slot
       |  FROM (SELECT DISTINCT user_id FROM pos) u
       |  CROSS JOIN (SELECT unnest(range(0, $NegSlots)) AS slot) s
       |  JOIN items i ON i.idx =
       |    ('0x' || substr(md5(u.user_id || '-' || s.slot || '-' || 'neg'), 1, 8))::BIGINT
       |      % (SELECT n_items FROM n)
       |  GROUP BY u.user_id, i.item_id
       |), negs AS (
       |  SELECT user_id, item_id, slot,
       |    row_number() OVER (PARTITION BY user_id ORDER BY slot ASC, item_id ASC) AS rk
       |  FROM cands c
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM pos p WHERE p.user_id = c.user_id AND p.item_id = c.item_id)
       |)
       |SELECT user_id, count(*) AS n_neg,
       |  sum(item_id)::BIGINT AS neg_checksum,
       |  string_agg(item_id::VARCHAR, ',' ORDER BY rk) AS neg_items
       |FROM negs WHERE rk <= $NegK
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** View-count cap for the calibration bins (the long tail collapses
    * into the top bin) and the smoothing constant of the propensity
    * score. */
  val CalibCap = 15L
  val CalibK = 5.0

  /** Calibration audit of a purchase-propensity score: the smoothed
    * monotone score p̂ = views/(views+K) per user, binned BY VALUE
    * (capped view count — no population-wide ntile sort), with the
    * observed purchase rate per bin and the calibration gap. This is
    * the reliability-diagram table every ranking pipeline checks before
    * trusting scores as probabilities — expressed engine-portably so
    * the whole table is oracle-backed (unlike a learned model's).
    *
    * Scale: one user aggregate, one bin aggregate over ≤ cap+1 rows.
    * Value-keyed bins are the deliberate choice: decile binning would
    * need a global sort of the user population; capped-count bins are
    * deterministic, stable across runs, and preserve the monotone
    * score ordering.
    */
  def calibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "view").cast("long")).as("n_views"),
           max((col("event_type") === "purchase").cast("long")).as("purchased"))
      .withColumn("bin", least(col("n_views"), lit(CalibCap)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_users"),
           round(avg(col("n_views") / (col("n_views") + CalibK)), 6).as("pred_rate"),
           round(avg("purchased"), 6).as("obs_rate"))
      .withColumn("gap", round(col("pred_rate") - col("obs_rate"), 6))
      .orderBy("bin")
  }

  val calibrationBinsSql: String =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
       |  FROM events GROUP BY user_id
       |)
       |SELECT least(n_views, $CalibCap)::BIGINT AS bin, count(*) AS n_users,
       |  round(avg(n_views / (n_views + $CalibK)), 6) AS pred_rate,
       |  round(avg(purchased), 6) AS obs_rate,
       |  round(round(avg(n_views / (n_views + $CalibK)), 6)
       |        - round(avg(purchased), 6), 6) AS gap
       |FROM per_user
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_kmeans_embed"     -> (kmeansEmbed _),
    "q_semantic_dedup"   -> (semanticDedup _),
    "q_negative_sample"  -> (negativeSample _),
    "q_calibration_bins" -> (calibrationBins _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_kmeans_embed"     -> kmeansEmbedSql,
    "q_semantic_dedup"   -> semanticDedupSql,
    "q_negative_sample"  -> negativeSampleSql,
    "q_calibration_bins" -> calibrationBinsSql,
  )
}
