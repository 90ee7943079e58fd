package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for PipelineOps: connected-components dedup clustering,
  * deterministic hash sampling, embedding centroids.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkFixture {

  test("dedup clusters partition the edge vertex set; labels are cluster minima") {
    val edges = operators.Dedup.simhashPairs(spark, sfTest)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val clusters = operators.PipelineOps.dedupClusters(spark, sfTest).collect()
    val members = clusters.map(r => r.getAs[String]("members").split(",").map(_.toLong).toSet)
    // every vertex in exactly one cluster
    assert(members.map(_.size).sum === verts.size)
    assert(members.flatten.toSet === verts)
    clusters.zip(members).foreach { case (r, m) =>
      assert(r.getAs[Long]("cluster_id") === m.min, "cluster id must be the member minimum")
      assert(r.getAs[Long]("n_docs") === m.size)
      assert(m.size >= 2, "edge-derived vertices always have a >=2 cluster")
    }
    // every edge is intra-cluster (endpoints share a cluster)
    val byVert = members.flatMap(m => m.map(_ -> m)).toMap
    edges.foreach { case (a, b) => assert(byVert(a) eq byVert(b), s"edge ($a,$b) split across clusters") }
  }

  test("canonical corpus: kept + removed = total; removals equal cluster non-minima") {
    val canon = operators.PipelineOps.canonicalCorpus(spark, sfTest).collect()
    val total = Tables.documents(spark, sfTest).count()
    assert(canon.map(_.getAs[Long]("n_docs")).sum === total)
    canon.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") === r.getAs[Long]("n_docs"))
    }
    // cross-check against the cluster report: removals = Σ (cluster size - 1)
    val clusters = operators.PipelineOps.dedupClusters(spark, sfTest).collect()
    val expectedRemoved = clusters.map(_.getAs[Long]("n_docs") - 1).sum
    assert(canon.map(_.getAs[Long]("n_removed")).sum === expectedRemoved)
  }

  test("embed health: one row per dimension, min<=mean<=max, std non-negative") {
    val h = operators.PipelineOps.embedHealth(spark, sfTest).collect()
    val dims = Tables.embeddings(spark, sfTest)
      .select(size(col("embedding"))).head.getInt(0)
    assert(h.length === dims)
    assert(h.map(_.getAs[Int]("dim")).toSeq === (0 until dims))
    h.foreach { r =>
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("mean") + 1e-6)
      assert(r.getAs[Double]("mean") <= r.getAs[Double]("vmax") + 1e-6)
      assert(r.getAs[Double]("std") >= 0.0)
    }
  }

  test("hash sample is deterministic and a genuine subset") {
    val s1 = operators.PipelineOps.hashSample(spark, sfTest).collect()
    val s2 = operators.PipelineOps.hashSample(spark, sfTest).collect()
    assert(s1.toSeq === s2.toSeq, "same key set must sample identically")
    val sampled = s1.map(_.getAs[Long]("n_rows")).sum
    val total = Tables.lineitem(spark, sfTest).count()
    assert(sampled > 0 && sampled < total)
    // 5% target, wide tolerance (hash noise at sf0.001's ~6k rows)
    val frac = sampled.toDouble / total
    assert(frac > 0.02 && frac < 0.09, s"sample fraction $frac far from 5%")
  }

  test("stratified sample keeps exactly K rows per stratum, deterministically") {
    val out = operators.PipelineOps.stratifiedSample(spark, sfTest).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_rows") == operators.PipelineOps.StratumK),
      "every stratum at fixture scale has >= K rows, so all must be exactly K")
    val again = operators.PipelineOps.stratifiedSample(spark, sfTest).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("pii scrub leaves no residual email/phone spans and counts every customer") {
    val seg = operators.TextAnalysis.piiScrub(spark, sfTest).collect()
    val total = seg.map(_.getAs[Long]("n_customers")).sum
    assert(total == Tables.customer(spark, sfTest).count())
    // one synthesized email + one synthesized phone per profile
    assert(seg.forall(r => r.getAs[Long]("emails_redacted") == r.getAs[Long]("n_customers")))
    assert(seg.forall(r => r.getAs[Long]("phones_redacted") == r.getAs[Long]("n_customers")))
    assert(seg.forall(_.getAs[Long]("bytes_removed") > 0))
  }

  test("bigram LM: log-likelihoods are non-positive, perplexity >= 1") {
    val out = operators.TextAnalysis.bigramLm(spark, sfTest).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("avg_ll") <= 0.0))
    assert(out.forall(_.getAs[Double]("perplexity") >= 1.0))
    val nBi = out.map(_.getAs[Long]("n_bigrams")).sum
    assert(nBi > 0)
  }

  test("connected components on synthetic graphs: empty, chain, two components") {
    val session = spark
    import session.implicits._
    def cc(pairs: (Long, Long)*) = operators.PipelineOps.connectedComponents(
      pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"), r.getAs[String]("members")))

    assert(cc() === Array.empty, "empty edge set must give empty output, not crash")
    // a 5-vertex chain collapses to one cluster labeled by its min
    assert(cc((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ===
      Array((1L, 5L, "1,2,3,4,5")))
    // two components + an isolated pair keep separate labels
    assert(cc((10L, 11L), (20L, 21L), (21L, 22L)) ===
      Array((10L, 2L, "10,11"), (20L, 3L, "20,21,22")))
  }

  test("incremental dedup: batch-vs-corpus only, matches the full pair tier") {
    val rows = operators.Dedup.incrementalDedup(spark, sfTest).collect()
    val full = operators.Dedup.ngramJaccard(spark, sfTest)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val newId = r.getAs[Long]("new_id"); val oldId = r.getAs[Long]("dup_of")
      assert(newId >= operators.Dedup.IncrementalFrom && oldId < operators.Dedup.IncrementalFrom)
      assert(r.getAs[Double]("jaccard") >= operators.Dedup.JaccardThreshold)
      assert(full.contains((oldId, newId)),
        s"incremental match ($oldId,$newId) missing from the full jaccard tier")
    }
    // one best match per new doc
    val ids = rows.map(_.getAs[Long]("new_id"))
    assert(ids.distinct.length === ids.length)
  }

  test("embedding quantization: full coverage, bounded error, <=256 codes") {
    val rows = operators.PipelineOps.embeddingQuantize(spark, sfTest).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === Tables.embeddings(spark, sfTest).count(),
      "constant vectors (mx==mn) would drop out — fixture has none")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_mae") >= 0.0)
      assert(r.getAs[Double]("max_mae") < 0.01, "255-level quantization error should be tiny")
      assert(r.getAs[Double]("avg_codes") <= operators.PipelineOps.QLevels + 1)
    }
  }

  test("weighted sample: rarer sources keep proportionally more, books consistent") {
    val rows = operators.PipelineOps.weightedSample(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      assert(kept >= 0 && kept <= n)
      val thr = r.getAs[Long]("keep_threshold")
      assert(thr >= 1L && thr <= 1000000L)
    }
    // temperature sampling: keep-threshold is monotone nonincreasing in
    // source size (1/sqrt(n) ordering)
    val bySize = rows.sortBy(_.getAs[Long]("n_docs"))
    bySize.sliding(2).foreach {
      case Array(small, big) =>
        assert(small.getAs[Long]("keep_threshold") >= big.getAs[Long]("keep_threshold"))
      case _ =>
    }
  }

  test("weighted reservoir: exact E-S top-K replay, size-biased toward heavy docs") {
    import org.apache.spark.sql.functions._
    val P = operators.PipelineOps
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables.documents(spark, sfTest)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val keyed = docs.map { case (id, src, w) =>
      (id, src, w, r9(math.log((h60(s"$id-esr") + 1).toDouble / P.EsScale) / w))
    }
    val sel = keyed.sortBy { case (id, _, _, es) => (-es, id) }.take(P.EsK)
    val bySrc = sel.groupBy(_._2)
    val got = P.weightedReservoir(spark, sfTest).collect()
    assert(got.map(_.getAs[Long]("n_sel")).sum === P.EsK.toLong)
    got.foreach { r =>
      val src = r.getString(0)
      val exp = bySrc.getOrElse(src, Array.empty[(Long, String, Long, Double)])
      assert(r.getAs[Long]("n_sel") === exp.length.toLong, s"n_sel of $src")
      assert(r.getAs[Long]("sel_checksum") === exp.map(_._1).sum, s"checksum of $src")
      assert(r.getAs[Long]("sel_chars") === exp.map(_._3).sum, s"chars of $src")
    }
    // inclusion ∝ n_chars ⇒ the sample is size-biased: its mean doc
    // length exceeds the corpus mean
    val meanSel = sel.map(_._3.toDouble).sum / sel.length
    val meanAll = docs.map(_._3.toDouble).sum / docs.length
    assert(meanSel > meanAll,
      f"weighted WOR sample must skew long ($meanSel%.1f vs corpus $meanAll%.1f)")
  }

  test("seq pack: chunks contiguous per source, token totals preserved") {
    val rows = operators.PipelineOps.seqPack(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head === 0L)
      assert(ids === (0L until ids.length.toLong).toArray) // contiguous chunk ids
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("n_spanning") <= r.getAs[Long]("n_docs"))
    }
    // every token lands in exactly one chunk: totals match the corpus
    val totTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val want = Tables.documents(spark, sfTest)
      .select(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(totTokens === want)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === Tables.documents(spark, sfTest).count())
  }

  test("embedding centroids: one row per label, distances non-negative, avg<=max") {
    val rows = operators.PipelineOps.embeddingCentroids(spark, sfTest).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("label")).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0)
      assert(r.getAs[Double]("centroid_norm") >= 0.0)
      val avg = r.getAs[Double]("avg_dist"); val max = r.getAs[Double]("max_dist")
      assert(avg >= 0.0 && max >= avg)
    }
    val nVecs = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(nVecs === Tables.embeddings(spark, sfTest).count())
  }

  test("train shuffle: batches cover the corpus, mixing stats are bounded and reproducible") {
    import operators.PipelineOps
    val rows = PipelineOps.trainShuffle(spark, sfTest).collect()
    assert(rows.nonEmpty && rows.length <= PipelineOps.ShuffleBatches)
    // batch ids live in [0, B); every doc lands in exactly one batch
    assert(rows.forall { r =>
      val b = r.getAs[Long]("batch_id"); b >= 0 && b < PipelineOps.ShuffleBatches })
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sfTest).count())
    rows.foreach { r =>
      val h = r.getAs[Double]("source_entropy")
      val ev = r.getAs[Double]("evenness")
      val ms = r.getAs[Double]("max_share")
      assert(h >= 0.0 && h <= math.log(r.getAs[Long]("n_sources").toDouble) + 1e-9)
      assert(ev >= 0.0 && ev <= 1.0 + 1e-9)
      assert(ms > 0.0 && ms <= 1.0)
    }
    // seed-determinism: a fresh session reproduces the epoch audit exactly
    val again = PipelineOps.trainShuffle(spark.newSession(), sfTest)
      .collect().map(_.toSeq).toSeq
    assert(again === rows.map(_.toSeq).toSeq)
  }

  test("train shuffle: a single-source corpus is trivially even (guard, not NaN)") {
    import spark.implicits._
    val docs = (1L to 64L).map(i => (i, "only_source")).toDF("doc_id", "source")
    val rows = operators.PipelineOps.epochMixAudit(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sources") === 1L)
      assert(r.getAs[Double]("source_entropy") === 0.0)
      assert(r.getAs[Double]("evenness") === 1.0)
      assert(r.getAs[Double]("max_share") === 1.0)
    }
  }

  test("mix plan: probabilities bounded, achieved shares sum to 1, repeats only when short") {
    import operators.PipelineOps
    val rows = PipelineOps.mixPlan(spark, sfTest).collect()
    val nSources = Tables.documents(spark, sfTest)
      .select("source").distinct().count()
    assert(rows.length === nSources)
    rows.foreach { r =>
      val kp = r.getAs[Double]("keep_prob")
      val rf = r.getAs[Double]("repeat_factor")
      assert(kp > 0.0 && kp <= 1.0)
      assert(rf >= 1.0)
      // a source is either downsampled or repeated, never both
      assert(kp >= 1.0 - 1e-9 || rf <= 1.0 + 1e-9)
    }
    assert(math.abs(rows.map(_.getAs[Double]("achieved_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("doc chunks: full coverage, fixed stride, tail never dropped, interior chunks full-width") {
    import operators.PipelineOps.{ChunkTokens, ChunkStride}
    val nTokens = spark.read.parquet(s"$sfTest/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = operators.PipelineOps.docChunks(spark, sfTest).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_chunk_tokens")))
      .groupBy(_._1)
    assert(chunks.keySet === nTokens.keySet, "every doc must be chunked")
    for ((doc, cs) <- chunks) {
      val n = nTokens(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq, "chunk indices dense from 0")
      val last = sorted.last
      // the final chunk ends exactly at the last token: nothing dropped
      assert(last._2 * ChunkStride + last._3 === n, s"doc $doc tail truncated")
      // all interior chunks are full width, so overlap is exactly width-stride
      sorted.init.foreach { c => assert(c._3 === ChunkTokens.toLong, s"doc $doc interior chunk short") }
      // no chunk is contained in its predecessor (each adds >=1 new token)
      assert(last._3 > 0 && (sorted.length == 1 || last._2 * ChunkStride + last._3 >
        (last._2 - 1) * ChunkStride + ChunkTokens - ChunkStride))
      val expected = if (n <= ChunkTokens) 1L else (n - ChunkTokens + ChunkStride - 1) / ChunkStride + 1
      assert(sorted.length.toLong === expected, s"doc $doc chunk count")
    }
  }

  test("group split: splits partition users and events exactly; row-level split leaks users") {
    val rows = operators.PipelineOps.groupSplit(spark, sfTest).collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq === Seq("test", "train", "val"))
    val ev = spark.read.parquet(s"$sfTest/events.parquet")
    val nUsers = ev.select("user_id").distinct.count()
    val nEvents = ev.count()
    // grouped split is a PARTITION: per-split user counts sum to the
    // distinct total (disjoint by construction — split is a function of
    // the user), events are fully covered
    assert(rows.map(_.getAs[Long]("n_users")).sum === nUsers)
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    // the row-level contrast overcounts users — that excess IS the
    // train/test leakage a per-row split would cause
    assert(rows.map(_.getAs[Long]("n_users_row_level")).sum > nUsers)
    val byName = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_events")).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("split leakage: classes partition the near-dup pair set, splits recomputed locally") {
    val P = operators.PipelineOps
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(doc: Long): String = {
      val h = java.lang.Long.parseLong(md5hex(s"${P.DocSplitSeed}:$doc").take(8), 16)
      val m = h % 10
      if (m < 8) "train" else if (m == 8) "val" else "test"
    }
    // the pair universe IS q_dedup_ngram_jaccard's output (already
    // locally verified elsewhere); here we re-class every pair with a
    // driver-side md5 and demand the audit's rollup matches exactly
    val pairs = operators.Dedup.ngramJaccard(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.nonEmpty)
    val expected = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum / g.length) }
    val got = P.splitLeakage(spark, sfTest).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expected.keySet)
    got.foreach { r =>
      val (n, avg) = expected((r.getString(0), r.getString(1)))
      assert(r.getAs[Long]("n_pairs") === n)
      assert(math.abs(r.getAs[Double]("avg_jaccard") - avg) < 1e-6)
      assert(r.getAs[Int]("is_leak") === (if (r.getString(0) == r.getString(1)) 0 else 1))
    }
    assert(got.map(_.getAs[Long]("n_pairs")).sum === pairs.length.toLong)
  }

  test("merge upsert: action counts reconcile exactly with the synthesized batch rules") {
    val rows = operators.PipelineOps.mergeUpsert(spark, sfTest).collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val ids = spark.read.parquet(s"$sfTest/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    assert(byAction("insert") === ids.count(_ % 7 == 0).toLong, "every 7th doc spawns an insert")
    assert(byAction("update") === ids.count(_ % 6 == 0).toLong, "every 6th doc revises text")
    assert(byAction("keep") === ids.count(i => i % 3 == 0 && i % 6 != 0).toLong,
      "re-crawled-unchanged docs classify as keep")
    assert(byAction("carry") === n - ids.count(_ % 3 == 0).toLong,
      "docs outside the batch carry forward")
    // merged corpus size = base + inserts (updates/keeps/carries replace in place)
    assert(byAction.values.sum === n + byAction("insert"))
    // inserts all land under the synthetic recrawl source
    val insertSources = rows.filter(_.getAs[String]("action") == "insert")
      .map(_.getAs[String]("source")).distinct.toSeq
    assert(insertSources === Seq("recrawl"))
  }

  test("k-anonymity: audit reconciles per nation and coarsening reduces risk") {
    val rows = operators.PipelineOps.kAnonymity(spark, sfTest).collect()
    val byLevel = rows.groupBy(_.getAs[String]("level"))
    assert(byLevel.keySet === Set("1_fine", "2_coarse"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risky_combos") <= r.getAs[Long]("n_combos"))
      assert(r.getAs[Long]("n_risky_customers") <= r.getAs[Long]("n_customers"))
      val share = r.getAs[Double]("risk_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    val total = Tables.customer(spark, sfTest).count()
    byLevel.values.foreach { lv =>
      assert(lv.map(_.getAs[Long]("n_customers")).sum === total, "audit covers every customer")
    }
    def risky(l: String) = byLevel(l).map(_.getAs[Long]("n_risky_customers")).sum
    def combos(l: String) = byLevel(l).map(_.getAs[Long]("n_combos")).sum
    assert(combos("2_coarse") < combos("1_fine"), "generalization merges combos")
    // merging combos never lowers a combo's count, so the risky set is
    // monotone non-increasing under generalization; at this tiny SF
    // (150 customers over 125 QI cells) both levels stay fully risky,
    // so equality is legitimate here — sf0.01 shows the strict drop
    // (1447 → 743), verified by the oracle gate
    assert(risky("2_coarse") <= risky("1_fine"),
      "the coarser release must never grow the re-identifiable set")
  }

  test("l-diversity: matches a local per-group distinct-sensitive recompute") {
    val P = operators.PipelineOps
    val cust = Tables.customer(spark, sfTest)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2), math.floor(r.getDouble(3) / P.AnonCoarseWidth).toLong))
      .toMap
    val recs = Tables.orders(spark, sfTest)
      .select("o_custkey", "o_orderpriority").collect()
      .flatMap { r =>
        cust.get(r.getLong(0)).map { case (nk, seg, bb) => ((nk, seg, bb), r.getString(1)) }
      }
    val groups = recs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).distinct.length.toLong)
    }.toMap
    val byNation = groups.groupBy(_._1._1)
    val out = P.lDiversity(spark, sfTest).collect()
    assert(out.map(_.getInt(0)).toSet == byNation.keySet)
    out.foreach { r =>
      val gs = byNation(r.getInt(0)).values
      assert(r.getAs[Long]("n_records") == gs.map(_._1).sum)
      assert(r.getAs[Long]("n_groups") == gs.size)
      assert(r.getAs[Long]("n_weak_groups") == gs.count(_._2 < P.DiversityL))
      assert(r.getAs[Long]("n_exposed_records") ==
        gs.filter(_._2 < P.DiversityL).map(_._1).sum)
      assert(r.getAs[Long]("min_l") == gs.map(_._2).min)
    }
  }

  test("zorder layout: time probe prunes z-ordered files, never the user-linear ones") {
    val r = operators.PipelineOps.zorderLayout(spark, sfTest).collect()
      .map(row => row.getAs[String]("layout") -> row).toMap
    assert(r.keySet === Set("linear", "zorder"))
    val total = spark.read.parquet(s"$sfTest/events.parquet").count()
    r.values.foreach { row =>
      assert(row.getAs[Long]("n_rows") === total, "every layout covers the corpus")
      assert(row.getAs[Long]("n_files") <= operators.PipelineOps.ZFiles)
    }
    // the operator's reason to exist: interleaving buys time-locality
    // that single-key clustering cannot have
    assert(r("zorder").getAs[Double]("avg_tx_span") < r("linear").getAs[Double]("avg_tx_span"))
    assert(r("zorder").getAs[Double]("prune_share") > r("linear").getAs[Double]("prune_share"))
    assert(r("zorder").getAs[Double]("prune_share") > 0.5,
      "a point probe must skip most z-ordered files")
  }

  test("time split: slices cover the corpus and the purge gap separates train from test") {
    import operators.PipelineOps.{SplitT1, SplitT2}
    val rows = operators.PipelineOps.timeSplit(spark, sfTest).collect()
      .map(r => r.getAs[String]("slice") ->
        (r.getAs[Long]("n_events"), r.getAs[String]("min_ts"), r.getAs[String]("max_ts"))).toMap
    assert(rows.keySet === Set("1_train", "2_purge", "3_test"))
    val total = spark.read.parquet(s"$sfTest/events.parquet").count()
    assert(rows.values.map(_._1).sum === total, "slices must partition the corpus")
    // boundary discipline: string compare works on yyyy-MM-dd HH:mm:ss
    assert(rows("1_train")._3 < s"$SplitT1 00:00:00")
    assert(rows("2_purge")._2 >= s"$SplitT1 00:00:00" && rows("2_purge")._3 < s"$SplitT2 00:00:00")
    assert(rows("3_test")._2 >= s"$SplitT2 00:00:00")
  }

  test("t-closeness: ordinal EMD, weak verdicts and rollups match a local recompute") {
    val ops = operators.PipelineOps
    val cust = Tables.customer(spark, sfTest)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => r.getAs[Number](0).longValue -> (r.getAs[Number](1).longValue,
        r.getString(2), math.floor(r.getDouble(3) / ops.AnonCoarseWidth).toLong))
      .toMap
    val recs = Tables.orders(spark, sfTest)
      .select("o_custkey", "o_orderpriority").collect()
      .flatMap { r =>
        cust.get(r.getAs[Number](0).longValue).map { case (nat, seg, bb) =>
          ((nat, seg, bb), r.getString(1).substring(0, 1).toInt)
        }
      }
    val nn = recs.length.toLong
    val cp = (1 to 4).map(i => recs.count(_._2 <= i).toLong)
    val groups = recs.groupBy(_._1)
    case class G(nat: Long, nG: Long, tNum: Long, weak: Boolean)
    val gs = groups.map { case ((nat, _, _), rows) =>
      val nG = rows.length.toLong
      val cq = (1 to 4).map(i => rows.count(_._2 <= i).toLong)
      val tNum = (0 until 4).map(i => math.abs(cq(i) * nn - cp(i) * nG)).sum
      G(nat, nG, tNum, tNum * ops.TclDen > 4L * ops.TclNum * nG * nn)
    }
    val byNat = gs.groupBy(_.nat)
    val out = operators.PipelineOps.tCloseness(spark, sfTest).collect()
    assert(out.length == byNat.size)
    for (r <- out) {
      val nat = r.getAs[Number]("c_nationkey").longValue
      val g = byNat(nat)
      assert(r.getAs[Long]("n_records") == g.map(_.nG).sum)
      assert(r.getAs[Long]("n_groups") == g.size)
      assert(r.getAs[Long]("n_weak_groups") == g.count(_.weak))
      assert(r.getAs[Long]("n_exposed_records") == g.filter(_.weak).map(_.nG).sum)
      val maxT = g.map(x => x.tNum.toDouble / (4.0 * x.nG * nn)).max
      assert(math.abs(r.getAs[Double]("max_t") - maxT) < 1e-5)
    }
    // the triad must order: a perfectly corpus-distributed group has t = 0
    // and can never be weak; verify no group with t_num == 0 is weak
    assert(gs.filter(_.tNum == 0L).forall(!_.weak))
  }
}
