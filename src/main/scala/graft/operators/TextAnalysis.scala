package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Email/phone patterns for the PII scrub. `[.]` character classes
    * instead of `\.` keep the pattern byte-identical across the Java
    * (Spark) and RE2 (DuckDB) regex dialects with zero escaping.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhonePat = "[0-9]{2}-[0-9]{4}-[0-9]{4}"

  /** PII redaction — the compliance pass every training-data pipeline
    * runs before text leaves the ingest zone. The fixture corpus
    * carries no PII, so the query first builds a deterministic customer
    * profile string (name + synthesized e-mail + synthesized phone,
    * all derived from fixture columns) and then runs the actual
    * operator under test: global regex redaction of e-mail and phone
    * spans, with per-segment redaction counts and an exact checksum of
    * the scrubbed text proving byte-identical output cross-engine.
    * Pure per-row map work + one aggregate — linear at any scale.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .withColumn("profile", concat(
        col("c_name"), lit(" <"),
        lower(regexp_replace(col("c_name"), "#", "")), lit("@example.com> tel "),
        lpad(col("c_nationkey").cast("string"), 2, "0"), lit("-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"), lit("-"),
        lpad((col("c_custkey") % 997).cast("string"), 4, "0"),
        lit(" segment "), col("c_mktsegment")))
      .withColumn("n_email", regexp_count(col("profile"), lit(EmailPat)))
      .withColumn("n_phone", regexp_count(col("profile"), lit(PhonePat)))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("profile"), EmailPat, "[EMAIL]"), PhonePat, "[PHONE]"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           sum("n_email").as("emails_redacted"),
           sum("n_phone").as("phones_redacted"),
           sum(length(col("profile")) - length(col("scrubbed"))).as("bytes_removed"),
           sum(expr("cast(conv(substring(md5(scrubbed), 1, 8), 16, 10) AS bigint)"))
             .as("scrub_checksum"))
      .orderBy("c_mktsegment")

  val piiScrubSql: String =
    s"""WITH p AS (
       |  SELECT c_mktsegment,
       |    c_name || ' <' || lower(regexp_replace(c_name, '#', '', 'g')) || '@example.com> tel '
       |      || lpad(c_nationkey::VARCHAR, 2, '0') || '-'
       |      || lpad((c_custkey % 10000)::VARCHAR, 4, '0') || '-'
       |      || lpad((c_custkey % 997)::VARCHAR, 4, '0')
       |      || ' segment ' || c_mktsegment AS profile
       |  FROM customer
       |), s AS (
       |  SELECT c_mktsegment, profile,
       |    len(regexp_extract_all(profile, '$EmailPat')) AS n_email,
       |    len(regexp_extract_all(profile, '$PhonePat')) AS n_phone,
       |    regexp_replace(regexp_replace(profile, '$EmailPat', '[EMAIL]', 'g'),
       |                   '$PhonePat', '[PHONE]', 'g') AS scrubbed
       |  FROM p
       |)
       |SELECT c_mktsegment, count(*) AS n_customers,
       |  sum(n_email)::BIGINT AS emails_redacted,
       |  sum(n_phone)::BIGINT AS phones_redacted,
       |  sum(len(profile) - len(scrubbed))::BIGINT AS bytes_removed,
       |  sum(('0x' || substr(md5(scrubbed), 1, 8))::BIGINT)::BIGINT AS scrub_checksum
       |FROM s
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  /** Bigram language-model quality score (the CCNet idea: score text by
    * a corpus LM; low log-likelihood = out-of-distribution text). The
    * corpus itself is the training set: P(w2|w1) = c(w1,w2)/c(w1,·) by
    * MLE, each document scored by its mean bigram log-likelihood, then
    * rolled up per source with the perplexity of the (rounded) mean.
    * Counts are exact integers; ln/exp are applied once per value, so
    * 6 dp rounding is engine-stable. The bigram model join broadcasts
    * here (bounded vocab); an open-vocab corpus would hash-join on w1
    * and the plan shape is otherwise unchanged.
    */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    val bi = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), split(expr(normSpark), " ").as("ts"))
      // single-token docs have no bigrams: Spark's sequence(1, 0) would
      // throw where DuckDB's range(1, 1) is just empty — filter first
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr("transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairC = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val headC = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = broadcast(pairC.join(headC, "w1")
      .select(col("w1"), col("w2"), col("c12"), col("c1")))
    val docLl = bi.join(model, Seq("w1", "w2"))
      .groupBy("doc_id", "source")
      .agg(avg(log(col("c12") / col("c1"))).as("ll"), count(lit(1)).as("n_bi"))
    docLl.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_bi").as("n_bigrams"),
           round(avg("ll"), 6).as("avg_ll"))
      .withColumn("perplexity", round(exp(-col("avg_ll")), 4))
      .orderBy("source")
  }

  val bigramLmSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split($normDuck, ' ') AS ts FROM documents
       |), bi AS (
       |  SELECT doc_id, source, ts[i] AS w1, ts[i + 1] AS w2
       |  FROM d, unnest(range(1, len(ts))) AS t(i)
       |), pair_c AS (
       |  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
       |), head_c AS (
       |  SELECT w1, count(*) AS c1 FROM bi GROUP BY w1
       |), doc_ll AS (
       |  SELECT doc_id, source, avg(ln(c12 / c1::DOUBLE)) AS ll, count(*) AS n_bi
       |  FROM bi JOIN pair_c USING (w1, w2) JOIN head_c USING (w1)
       |  GROUP BY doc_id, source
       |)
       |SELECT source, count(*) AS n_docs,
       |  sum(n_bi)::BIGINT AS n_bigrams,
       |  round(avg(ll), 6) AS avg_ll,
       |  round(exp(-round(avg(ll), 6)), 4) AS perplexity
       |FROM doc_ll
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Word-trigram builder, shared by the repetition and contamination
    * queries: the codegen [[graft.functions.Shingles]] pass (byte-identical
    * to the HOF `transform(sequence, i -> concat_ws(' ', toks[i..i+2]))`
    * formulation, which it replaces: predicate pushdown inlines the
    * filter/Generate guards through the projections, and the inlined HOF
    * re-evaluated `split(regexp_replace(text))` PER TOKEN ACCESS —
    * O(len²) interpreted regex work per row, 12 s at sf0.1 for the
    * contamination scan alone; the single-pass expression makes each
    * inlined copy one O(len) eval). The DuckDB twin is 1-based; both
    * emit exactly len−2 trigrams per document.
    */
  private def trigrams(toks: Column): Column = graft.functions.Shingles.shingles(toks, 3)
  private val trigramsDuck =
    "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"

  /** A doc whose duplicate-trigram fraction exceeds this is flagged
    * repetitive (Gopher uses per-n-gram thresholds of this magnitude).
    */
  val RepThreshold = 0.2

  /** Within-document repetition signals (the Gopher/MassiveText quality
    * gate): duplicate-token fraction (1 − distinct/total tokens) and
    * duplicate-trigram fraction per document, rolled up per source with
    * a count of docs over [[RepThreshold]]. Pure per-row map work + one
    * aggregate — linear at any corpus scale, no shuffle before the
    * final per-source rollup. The fractions are single divisions of
    * exact integers, so the threshold comparison is engine-stable.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(expr(normSpark), " "))
      .where(size(col("toks")) >= 3)
      .withColumn("dup_tok_frac",
        lit(1.0) - size(array_distinct(col("toks"))) / size(col("toks")).cast("double"))
      .withColumn("tris", trigrams(col("toks")))
      .withColumn("dup_tri_frac",
        lit(1.0) - size(array_distinct(col("tris"))) / size(col("tris")).cast("double"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("dup_tok_frac"), 6).as("avg_dup_tok_frac"),
           round(avg("dup_tri_frac"), 6).as("avg_dup_tri_frac"),
           round(max("dup_tri_frac"), 6).as("max_dup_tri_frac"),
           sum(when(col("dup_tri_frac") > RepThreshold, 1L).otherwise(0L)).as("n_repetitive"))
      .orderBy("source")

  val repetitionSql: String =
    s"""WITH d AS (
       |  SELECT source, string_split($normDuck, ' ') AS toks FROM documents
       |), m AS (
       |  SELECT source,
       |    1.0 - len(list_distinct(toks)) / len(toks)::DOUBLE AS dup_tok_frac,
       |    1.0 - len(list_distinct($trigramsDuck)) / (len(toks) - 2)::DOUBLE AS dup_tri_frac
       |  FROM d WHERE len(toks) >= 3
       |)
       |SELECT source, count(*) AS n_docs,
       |  round(avg(dup_tok_frac), 6) AS avg_dup_tok_frac,
       |  round(avg(dup_tri_frac), 6) AS avg_dup_tri_frac,
       |  round(max(dup_tri_frac), 6) AS max_dup_tri_frac,
       |  sum(CASE WHEN dup_tri_frac > $RepThreshold THEN 1 ELSE 0 END)::BIGINT AS n_repetitive
       |FROM m
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Every EvalMod-th doc_id forms the synthetic held-out benchmark. */
  val EvalMod = 19
  /** A train doc with ≥ this fraction of its trigrams in the eval set
    * is flagged contaminated.
    */
  val ContamThreshold = 0.05

  /** Benchmark-contamination check (the decontamination pass every
    * training corpus runs before release): a deterministic ~5% of docs
    * (doc_id % [[EvalMod]] = 0) plays the role of the eval benchmark;
    * for every remaining train doc, the fraction of its DISTINCT word
    * trigrams that appear anywhere in the eval set, rolled up per
    * source with a flag count. Scale shape: the eval n-gram set is
    * benchmark-sized (small) and BROADCASTS to the linear scan of the
    * corpus — the 100 TB side is never shuffled, and the per-doc
    * aggregate rides the explode's existing partitioning.
    */
  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    // no size(toks) >= 3 guard: shingles emits an empty array for short
    // docs and the explode drops them — same rows out, one less
    // inlined split+regex eval in the pushed-down scan filter
    val docs = Tables.documents(spark, sfDir)
      .withColumn("toks", split(expr(normSpark), " "))
      .withColumn("grams", array_distinct(trigrams(col("toks"))))
    val evalGrams = docs.where(col("doc_id") % EvalMod === 0)
      .select(explode(col("grams")).as("gram")).distinct()
      .withColumn("hit", lit(1L))
    val perDoc = docs.where(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"), col("source"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("frac", col("n_hit") / col("n_grams").cast("double"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("frac"), 6).as("avg_contamination"),
           round(max("frac"), 6).as("max_contamination"),
           sum(when(col("frac") >= ContamThreshold, 1L).otherwise(0L)).as("n_contaminated"))
      .orderBy("source")
  }

  val contaminationSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split($normDuck, ' ') AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, source, list_distinct($trigramsDuck) AS grams
       |  FROM d WHERE len(toks) >= 3
       |), eval_grams AS (
       |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0
       |), train AS (
       |  SELECT doc_id, source, unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod <> 0
       |), per_doc AS (
       |  SELECT t.doc_id, t.source,
       |    count(*) AS n_grams,
       |    sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |  FROM train t LEFT JOIN eval_grams e ON t.gram = e.gram
       |  GROUP BY t.doc_id, t.source
       |)
       |SELECT source, count(*) AS n_docs,
       |  round(avg(n_hit / n_grams::DOUBLE), 6) AS avg_contamination,
       |  round(max(n_hit / n_grams::DOUBLE), 6) AS max_contamination,
       |  sum(CASE WHEN n_hit / n_grams::DOUBLE >= $ContamThreshold THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
       |FROM per_doc
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_text_profile"   -> (textProfile _),
    "q_lang_id"        -> (langId _),
    "q_quality_score"  -> (qualityScore _),
    "q_token_stats"    -> (tokenStats _),
    "q_doc_fingerprint" -> (docFingerprint _),
    "q_pii_scrub"      -> (piiScrub _),
    "q_bigram_lm"      -> (bigramLm _),
    "q_repetition"     -> (repetition _),
    "q_contamination"  -> (contamination _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_profile"   -> textProfileSql,
    "q_lang_id"        -> langIdSql,
    "q_quality_score"  -> qualityScoreSql,
    "q_token_stats"    -> tokenStatsSql,
    "q_doc_fingerprint" -> docFingerprintSql,
    "q_pii_scrub"      -> piiScrubSql,
    "q_bigram_lm"      -> bigramLmSql,
    "q_repetition"     -> repetitionSql,
    "q_contamination"  -> contaminationSql,
  )
}
