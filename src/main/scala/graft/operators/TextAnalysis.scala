package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents corpus (SURVEY.md §2.10
  * L4 + the driver's text-analysis mandate): corpus profiling,
  * heuristic language ID, quality scoring, token counting, and
  * positional document fingerprinting. Everything is per-document map
  * work followed by one aggregate — the embarrassingly-parallel shape
  * that scales linearly with corpus size.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  private val normSpark = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
  private val normDuck = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** English function words used by the n-gram/stopword language
    * heuristic and the quality score. Fixture text is pseudo-English, so
    * the discriminating signal is hit RATE, not identity.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with", "by", "at")

  private def stopArraySpark = Stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
  private def stopListDuck = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Corpus profile per (lang, source): doc counts, token/char moments.
    * The canonical "know your training data" rollup.
    */
  def textProfile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(expr(normSpark), " "))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(size(col("toks"))), 4).as("avg_tokens"),
           round(avg(length(col("text"))), 4).as("avg_chars"),
           max(size(col("toks"))).as("max_tokens"),
           min(size(col("toks"))).as("min_tokens"))
      .orderBy("lang", "source")

  val textProfileSql: String =
    s"""SELECT lang, source, count(*) AS n_docs,
       |  round(avg(len(string_split($normDuck, ' '))), 4) AS avg_tokens,
       |  round(avg(length(text)), 4) AS avg_chars,
       |  max(len(string_split($normDuck, ' '))) AS max_tokens,
       |  min(len(string_split($normDuck, ' '))) AS min_tokens
       |FROM documents
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  /** Heuristic language ID: distinct-stopword hit rate ≥ threshold ⇒
    * 'en-like', else 'other'; confusion matrix against the labeled lang
    * column. (On pseudo-English fixture text every lang bucket scores
    * en-like — the matrix SHOWS that rather than assuming it.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(expr(normSpark), " "))
      .withColumn("hits", size(array_intersect(col("toks"), expr(stopArraySpark))))
      .withColumn("predicted",
        when(col("hits") >= 3, lit("en-like")).otherwise(lit("other")))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("hits")), 4).as("avg_stopword_hits"))
      .orderBy("lang", "predicted")

  val langIdSql: String =
    s"""WITH d AS (
       |  SELECT lang,
       |    len(list_intersect(string_split($normDuck, ' '), $stopListDuck)) AS hits
       |  FROM documents
       |)
       |SELECT lang,
       |  CASE WHEN hits >= 3 THEN 'en-like' ELSE 'other' END AS predicted,
       |  count(*) AS n_docs,
       |  round(avg(hits), 4) AS avg_stopword_hits
       |FROM d
       |GROUP BY 1, 2
       |ORDER BY lang, predicted""".stripMargin

  /** Quality score in [0,1]: 0.4·length component (tokens/200 capped)
    * + 0.3·stopword occurrence rate (capped at 3× an 8% target)
    * + 0.3·mean-word-length closeness to 5 chars. Emitted as a decile
    * histogram with component means — the shape a filtering pipeline
    * thresholds on.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .withColumn("toks", split(expr(normSpark), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("sw_rate",
        expr(s"size(filter(toks, t -> array_contains($stopArraySpark, t))) / cast(n_toks AS double)"))
      .withColumn("awl", expr("length(concat_ws('', toks)) / cast(n_toks AS double)"))
      .withColumn("score", round(
        lit(0.4) * least(col("n_toks") / lit(200.0), lit(1.0)) +
        lit(0.3) * least(col("sw_rate") / lit(0.08), lit(1.0)) +
        lit(0.3) * greatest(lit(0.0), lit(1.0) - abs(col("awl") - lit(5.0)) / lit(5.0)), 6))
    d.withColumn("decile", least(floor(col("score") * 10), lit(9L)))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("score"), 6).as("avg_score"),
           round(avg("sw_rate"), 6).as("avg_sw_rate"),
           round(avg("awl"), 6).as("avg_word_len"))
      .orderBy("decile")
  }

  val qualityScoreSql: String =
    s"""WITH d AS (
       |  SELECT string_split($normDuck, ' ') AS toks FROM documents
       |), m AS (
       |  SELECT len(toks) AS n_toks,
       |    len(list_filter(toks, t -> list_contains($stopListDuck, t))) / len(toks)::DOUBLE AS sw_rate,
       |    length(array_to_string(toks, '')) / len(toks)::DOUBLE AS awl
       |  FROM d
       |), s AS (
       |  SELECT n_toks, sw_rate, awl,
       |    round(0.4 * least(n_toks / 200.0, 1.0)
       |        + 0.3 * least(sw_rate / 0.08, 1.0)
       |        + 0.3 * greatest(0.0, 1.0 - abs(awl - 5.0) / 5.0), 6) AS score
       |  FROM m
       |)
       |SELECT least(floor(score * 10)::BIGINT, 9) AS decile,
       |  count(*) AS n_docs,
       |  round(avg(score), 6) AS avg_score,
       |  round(avg(sw_rate), 6) AS avg_sw_rate,
       |  round(avg(awl), 6) AS avg_word_len
       |FROM s
       |GROUP BY 1
       |ORDER BY decile""".stripMargin

  /** Token counting two ways: whitespace tokens and a BPE-ish subword
    * count (≤4-char greedy chunks via regex — a deterministic stand-in
    * for a real tokenizer's token count). Per-source aggregate.
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_ws", size(split(expr(normSpark), " ")))
      .withColumn("n_bpe", size(expr(s"regexp_extract_all($normSpark, '[a-z0-9]{1,4}', 0)")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_ws").as("total_ws_tokens"),
           sum("n_bpe").as("total_bpe_tokens"),
           round(avg(col("n_bpe") / col("n_ws")), 4).as("bpe_per_word"))
      .orderBy("source")

  val tokenStatsSql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    len(string_split($normDuck, ' ')) AS n_ws,
       |    len(regexp_extract_all($normDuck, '[a-z0-9]{1,4}')) AS n_bpe
       |  FROM documents
       |)
       |SELECT source, count(*) AS n_docs,
       |  sum(n_ws)::BIGINT AS total_ws_tokens,
       |  sum(n_bpe)::BIGINT AS total_bpe_tokens,
       |  round(avg(n_bpe / n_ws::DOUBLE), 4) AS bpe_per_word
       |FROM d
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Fingerprint modulus (2^31 − 1). */
  val FpMod = 2147483647L

  /** Positional document fingerprint: Σ position·h32(token) mod
    * (2^31−1) — an order-sensitive rolling-hash analogue in pure SQL
    * (re-ordered tokens change the fingerprint; bag-of-words does not
    * distinguish them). Also reports per-source fingerprint collisions.
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
              posexplode(split(expr(normSpark), " ")).as(Seq("pos", "tok")))
      .withColumn("h", expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) AS bigint)"))
    val fps = toks.groupBy("doc_id", "source")
      .agg((sum((col("pos") + 1) * col("h")) % FpMod).as("fingerprint"))
    fps.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fingerprint")).as("n_distinct_fp"),
           min("fingerprint").as("min_fp"),
           max("fingerprint").as("max_fp"))
      .orderBy("source")
  }

  val docFingerprintSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    generate_subscripts(string_split($normDuck, ' '), 1) AS pos,
       |    unnest(string_split($normDuck, ' ')) AS tok
       |  FROM documents
       |), fps AS (
       |  SELECT doc_id, source,
       |    (sum(pos * (('0x' || substr(md5(tok), 1, 8))::BIGINT)) % $FpMod)::BIGINT AS fingerprint
       |  FROM toks
       |  GROUP BY doc_id, source
       |)
       |SELECT source, count(*) AS n_docs,
       |  count(DISTINCT fingerprint) AS n_distinct_fp,
       |  min(fingerprint) AS min_fp,
       |  max(fingerprint) AS max_fp
       |FROM fps
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_text_profile"   -> (textProfile _),
    "q_lang_id"        -> (langId _),
    "q_quality_score"  -> (qualityScore _),
    "q_token_stats"    -> (tokenStats _),
    "q_doc_fingerprint" -> (docFingerprint _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_profile"   -> textProfileSql,
    "q_lang_id"        -> langIdSql,
    "q_quality_score"  -> qualityScoreSql,
    "q_token_stats"    -> tokenStatsSql,
    "q_doc_fingerprint" -> docFingerprintSql,
  )
}
