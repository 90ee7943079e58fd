package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingSpec extends AnyFunSuite with SparkFixture {

  test("every training query runs non-empty on sf0.001") {
    operators.Training.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfTest).count() > 0, s"$name returned 0 rows")
    }
  }

  test("span corruption: per-source audit matches an exact local interval-union replay") {
    import operators.Training
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val docs = Tables.documents(spark, sfTest)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 >= Training.SpanMinChars)
    val perDoc = docs.map { case (doc, src, n) =>
      val nSpans = math.min(Training.MaxSpans,
        math.max(1L, n * Training.MaskPct / (100 * Training.SpanLen)))
      val spans = (0L until nSpans).map { k =>
        val st = h32(s"${Training.SpanSeed}:$doc-$k") % (n - Training.SpanLen + 1)
        (st, st + Training.SpanLen)
      }.sorted
      // interval union: touching/overlapping spans merge into islands
      var islands = 0L; var masked = 0L
      var curSt = -1L; var curEn = -1L
      for ((st, en) <- spans) {
        if (st > curEn || islands == 0L) {
          if (islands > 0L) masked += curEn - curSt
          islands += 1; curSt = st; curEn = en
        } else if (en > curEn) curEn = en
      }
      if (islands > 0L) masked += curEn - curSt
      (src, nSpans, islands, masked, n)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      src -> ((rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
               rows.map(_._4).sum, rows.map(_._4).sum * 10000 / rows.map(_._5).sum))
    }
    val got = Training.spanCorruption(spark, sfTest).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nd, ts, ti, tm, bp) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("total_spans") === ts)
      assert(r.getAs[Long]("total_islands") === ti)
      assert(r.getAs[Long]("total_masked_chars") === tm)
      assert(r.getAs[Long]("mask_rate_bp") === bp)
      // overlap can only LOWER the realized rate below the target
      assert(r.getAs[Long]("mask_rate_bp") <= Training.MaskPct * 100)
    }
  }

  test("kmeans: every vector assigned exactly once, clusters bounded by K") {
    val r = operators.Training.kmeansEmbed(spark, sfTest).collect()
    assert(r.length <= operators.Training.KClusters)
    val nTotal = r.map(_.getAs[Long]("n_vecs")).sum
    val nVecs = Tables.embeddings(spark, sfTest).count()
    assert(nTotal === nVecs, "assignment must partition the corpus")
    r.foreach { row =>
      assert(row.getAs[Long]("n_vecs") > 0)
      assert(row.getAs[Long]("inertia_units") >= 0)
    }
  }

  test("kmeans is deterministic across invocations") {
    val a = operators.Training.kmeansEmbed(spark, sfTest).collect().toSeq
    val b = operators.Training.kmeansEmbed(spark, sfTest).collect().toSeq
    assert(a === b)
  }

  test("cluster purity: purity/MI/NMI match a local recompute from the raw assignment") {
    val out = operators.Training.clusterPurity(spark, sfTest).collect()
    val e = operators.Training.quantizedOf(Tables.embeddings(spark, sfTest))
    val cent = operators.Training.centroidsOf(e, operators.Training.KClusters)
    val asn = operators.Training.kmeansAssignOf(e, cent)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lab = Tables.embeddings(spark, sfTest).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asn.keySet === lab.keySet, "assignment covers exactly the corpus")
    val contingency = asn.toSeq
      .map { case (v, c) => (c, lab(v)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val n = lab.size.toDouble
    val cTot = contingency.groupBy(_._1._1).map { case (c, g) => c -> g.values.sum }
    val lTot = contingency.groupBy(_._1._2).map { case (l, g) => l -> g.values.sum }
    val purity = cTot.keys.toSeq.map { c =>
      contingency.collect { case ((`c`, _), cnt) => cnt }.max.toDouble
    }.sum / n
    val mi = contingency.map { case ((c, l), cnt) =>
      cnt / n * math.log(cnt * n / (cTot(c).toDouble * lTot(l)))
    }.sum
    def h(tot: Iterable[Long]) = tot.map(x => -x / n * math.log(x / n)).sum
    val nmi = mi / math.sqrt(h(cTot.values) * h(lTot.values))
    assert(math.abs(out.head.getAs[Double]("purity") - purity) < 2e-6)
    assert(math.abs(out.head.getAs[Double]("mi") - mi) < 2e-6)
    assert(math.abs(out.head.getAs[Double]("nmi") - nmi) < 2e-6)
    assert(out.map(_.getAs[Long]("n_vecs")).sum === lab.size.toLong)
    out.foreach { row =>
      val c = row.getAs[Int]("cluster")
      assert(cTot(c) === row.getAs[Long]("n_vecs"))
      // dominant label with smaller-label tie-break
      val cells = contingency.collect { case ((`c`, l), cnt) => (l, cnt) }
      val best = cells.minBy { case (l, cnt) => (-cnt, l) }
      assert(row.getAs[Int]("top_label") === best._1)
      assert(row.getAs[Long]("top_label_n") === best._2)
      assert(row.getAs[Double]("nmi") >= -1e-9 && row.getAs[Double]("nmi") <= 1.0 + 1e-9)
    }
  }

  test("cluster validity: silhouette and DB index match a local recompute from raw distances") {
    val out = operators.Training.clusterValidity(spark, sfTest).collect()
    val e = operators.Training.quantizedOf(Tables.embeddings(spark, sfTest))
    val cent = operators.Training.centroidsOf(e, operators.Training.KClusters)
    val vecs = e.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val cents = cent.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def d2(v: Map[Int, Long], c: Map[Int, Long]): Long =
      v.keysIterator.map { p => val d = v(p) - c(p); d * d }.sum
    val rows = vecs.toSeq.map { case (vid, v) =>
      val ds = cents.view.mapValues(c => d2(v, c)).toMap
      val (own, a) = ds.toSeq.minBy { case (c, d) => (d, c) }
      val b = ds.collect { case (c, d) if c != own => d }.min
      val s = if (math.max(a, b) == 0L) 0.0
              else (b - a).toDouble / math.max(a, b).toDouble
      (vid, own, a, s)
    }
    val silAll = rows.map(_._4).sum / rows.size
    val perC = rows.groupBy(_._2)
    val scatter = perC.view.mapValues(g => g.map(_._3).sum.toDouble / g.size).toMap
    def m2(i: Int, j: Int): Long = d2(
      cents(i).map { case (p, v) => p -> v }, cents(j))
    val dbR = cents.keys.map { i =>
      i -> cents.keys.filter(_ != i)
        .map(j => (scatter(i) + scatter(j)) / m2(i, j).toDouble -> j)
        .minBy { case (r, j) => (-r, j) }
    }.toMap
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dbIndex = dbR.values.map(v => rnd6(v._1)).sum / dbR.size
    assert(out.length === cents.size)
    out.foreach { r =>
      val c = r.getAs[Int]("cluster")
      val g = perC(c)
      assert(r.getAs[Long]("n_vecs") === g.size.toLong)
      assert(r.getAs[Long]("intra_units") === g.map(_._3).sum)
      assert(math.abs(r.getAs[Double]("s_mean") - g.map(_._4).sum / g.size) < 2e-6)
      assert(r.getAs[Int]("db_peer") === dbR(c)._2)
      assert(math.abs(r.getAs[Double]("db_ratio") - dbR(c)._1) < 2e-6)
      assert(math.abs(r.getAs[Double]("silhouette") - silAll) < 2e-6)
      assert(math.abs(r.getAs[Double]("db_index") - dbIndex) < 2e-6)
      // simplified silhouette is bounded like the true one
      assert(r.getAs[Double]("s_mean") >= -1.0 - 1e-9 &&
        r.getAs[Double]("s_mean") <= 1.0 + 1e-9)
    }
  }

  test("semantic dedup: cluster audit reconciles and pair space stays intra-cluster") {
    val r = operators.Training.semanticDedup(spark, sfTest).collect()
    val n = Tables.embeddings(spark, sfTest).count()
    assert(r.map(_.getAs[Long]("n_vecs")).sum === n, "clusters partition the corpus")
    r.foreach { row =>
      val (v, p, dp, rm, k) = (row.getAs[Long]("n_vecs"), row.getAs[Long]("n_pairs"),
        row.getAs[Long]("n_dup_pairs"), row.getAs[Long]("n_removed"), row.getAs[Long]("n_kept"))
      assert(p === v * (v - 1) / 2, "pairs examined = intra-cluster pair count exactly")
      assert(dp >= rm, "a removed vec needs at least one dup pair")
      assert(rm + k === v, "keep/remove partitions the cluster")
      assert(k >= 1, "lowest-id member of any pair survives, so a cluster never empties")
    }
    // the method's point: Σ c² intra-cluster pairs ≪ the all-pairs scan
    assert(r.map(_.getAs[Long]("n_pairs")).sum < n * (n - 1) / 4,
      "clustered pair space must be well under half the all-pairs space")
  }

  test("negative samples never collide with positives and respect K") {
    val negs = operators.Training.negativeSample(spark, sfTest)
      .select(col("user_id"), explode(split(col("neg_items"), ",")).as("item"))
      .select(col("user_id"), col("item").cast("long").as("item_id"))
    val pos = Tables.interactions(spark, sfTest).select("user_id", "item_id")
    assert(negs.join(pos, Seq("user_id", "item_id"), "left_semi").count() === 0,
      "a sampled negative appears in the user's positives")
    val perUser = operators.Training.negativeSample(spark, sfTest)
      .select("n_neg").agg(max("n_neg")).collect().head.getLong(0)
    assert(perUser <= operators.Training.NegK)
  }

  test("pop-weighted negatives: exact md5 inverse-CDF replay, no positive collisions") {
    import operators.Training
    val pos = Tables.interactions(spark, sfTest)
      .select("user_id", "item_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // local cumulative-mass table in item_id order, same fixed point
    val counts = pos.groupBy(_._2).view.mapValues(_.length).toMap
    val items = counts.keys.toArray.sorted
    val mass = items.map { it =>
      val c = counts(it).toDouble
      math.round(math.sqrt(c * math.sqrt(c)) * Training.PopMassScale)
    }
    val cumLo = mass.scanLeft(0L)(_ + _)
    val tot = cumLo.last
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // inverse CDF: the item whose [cum_lo, cum_lo+mass) covers u
    def itemAt(u: Long): Long = {
      var lo = 0; var hi = items.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (cumLo(mid) <= u) lo = mid else hi = mid - 1
      }
      items(lo)
    }
    val posByUser = pos.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = posByUser.keys.toSeq.sorted.map { u =>
      val draws = (0 until Training.NegSlots).map { slot =>
        (itemAt(h60(s"$u-$slot-negpop") % tot), slot)
      }
      val dedup = draws.groupBy(_._1).map { case (it, xs) => (it, xs.map(_._2).min) }
      val negs = dedup.toSeq
        .filterNot { case (it, _) => posByUser(u).contains(it) }
        .sortBy { case (it, slot) => (slot, it) }
        .take(Training.NegK).map(_._1)
      (u, negs.length.toLong, negs.sum, negs.mkString(","))
    }
    val got = Training.negativeSamplePop(spark, sfTest).orderBy("user_id").collect()
    assert(got.length === expected.length)
    expected.zip(got).foreach { case ((u, nNeg, ck, csv), row) =>
      assert(row.getLong(0) === u)
      assert(row.getLong(1) === nNeg, s"n_neg of user $u")
      assert(row.getLong(2) === ck, s"neg_checksum of user $u")
      assert(row.getString(3) === csv, s"neg_items of user $u")
    }
    // the tier's reason to exist: sampled negatives skew popular —
    // their mean interaction count must exceed the catalog mean
    val sampled = got.flatMap(_.getString(3).split(",").filter(_.nonEmpty).map(_.toLong))
    val meanSampled = sampled.map(counts(_).toDouble).sum / sampled.length
    val meanCatalog = counts.values.map(_.toDouble).sum / counts.size
    assert(meanSampled > meanCatalog,
      f"popularity weighting must pull the sample toward hot items " +
        f"(sampled mean cnt $meanSampled%.2f vs catalog $meanCatalog%.2f)")
  }

  test("gap fill: spine is dense per type and zero-gap days carry the last average") {
    val r = operators.Analytics.gapFillDaily(spark, sfTest)
    val spans = r.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (datediff(max("day"), min("day")) + 1).as("span"))
      .collect()
    spans.foreach(row =>
      assert(row.getAs[Long]("n") === row.getAs[Int]("span").toLong,
        s"spine has holes for ${row.getAs[String]("event_type")}"))
    // forward-filled value must be non-null once any prior day had data
    val bad = r.where(col("ff_avg").isNull && col("n_events") > 0).count()
    assert(bad === 0)
  }

  test("c4 filter: rule counts bounded by doc counts and kept <= n_docs") {
    operators.TextAnalysis.c4Filter(spark, sfTest).collect().foreach { row =>
      val n = row.getAs[Long]("n_docs")
      Seq("n_short", "n_repeat", "n_nostop", "n_longword", "n_kept").foreach { c =>
        assert(row.getAs[Long](c) >= 0 && row.getAs[Long](c) <= n, s"$c out of range")
      }
    }
  }

  test("skew profile: shares are a valid distribution prefix") {
    val r = operators.Advanced.skewProfile(spark, sfTest).collect()
    assert(r.nonEmpty && r.length <= operators.Advanced.SkewTop)
    var prev = 0.0
    r.foreach { row =>
      val cum = row.getAs[Double]("cum_share")
      assert(cum >= prev && cum <= 1.0 + 1e-9)
      assert(row.getAs[Double]("share") > 0.0)
      prev = cum
    }
  }

  test("incremental merge equals the from-scratch aggregate") {
    import org.apache.spark.sql.functions._
    val merged = operators.Advanced.incrementalAgg(spark, sfTest)
    val scratch = Tables.lineitem(spark, sfTest)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 4).as("sum_qty"))
    val joined = merged.select(col("l_returnflag"), col("n_rows").as("na"), col("sum_qty").as("sa"),
        col("n_base"), col("n_delta"))
      .join(scratch.select(col("l_returnflag"), col("n_rows").as("nb"), col("sum_qty").as("sb")),
        "l_returnflag")
    joined.collect().foreach { row =>
      assert(row.getAs[Long]("na") === row.getAs[Long]("nb"))
      assert(row.getAs[Double]("sa") === row.getAs[Double]("sb"))
      assert(row.getAs[Long]("n_base") + row.getAs[Long]("n_delta") === row.getAs[Long]("na"))
    }
  }

  test("fuzzy names: distances within bounds, pairs canonical") {
    val r = operators.Dedup.fuzzyNames(spark, sfTest).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = row.getAs[Int]("dist")
      assert(d >= 1 && d <= operators.Dedup.FuzzyMaxEdit)
      assert(row.getAs[String]("name_a") < row.getAs[String]("name_b"))
    }
  }

  test("hyperplane LSH: structure valid and deterministic across runs") {
    val a = operators.Similarity.lshHyperplane(spark, sfTest).collect().toSeq
    assert(a.nonEmpty)
    a.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      assert(rows.length <= operators.Similarity.K)
      assert(rows.map(_.getAs[Int]("rk")).sorted === (1 to rows.length))
      rows.foreach(r => assert(r.getAs[Long]("neighbor_id") !== qid))
    }
    val b = operators.Similarity.lshHyperplane(spark, sfTest).collect().toSeq
    assert(a === b)
  }

  test("readability: shares in range, fog positive") {
    operators.TextAnalysis.readability(spark, sfTest).collect().foreach { row =>
      val cs = row.getAs[Double]("complex_share")
      assert(cs >= 0.0 && cs <= 1.0)
      assert(row.getAs[Double]("fog") > 0.0)
      assert(row.getAs[Double]("syll_per_word") > 0.0)
    }
  }

  test("data quality: fixtures are healthy (all violations zero)") {
    val m = operators.Relational.dataQuality(spark, sfTest).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("value")).toMap
    assert(m("rows_lineitem") > 0 && m("rows_orders") > 0)
    Seq("dup_orders_pk", "orphan_lineitems", "orphan_orders",
        "null_quantity", "discount_out_of_range", "nonpositive_quantity").foreach { c =>
      assert(m(c) === 0L, s"$c expected 0, got ${m(c)}")
    }
    // the synthetic fixture's line numbering is NOT unique per order —
    // a genuine data finding the audit is supposed to surface; pin it
    // against an independent recount
    import org.apache.spark.sql.functions._
    val dup = Tables.lineitem(spark, sfTest)
      .groupBy("l_orderkey", "l_linenumber").count().where(col("count") > 1).count()
    assert(m("dup_lineitem_pk") === dup)
  }

  test("calibration bins: monotone predicted rate, populations partition users") {
    import org.apache.spark.sql.functions._
    val rows = operators.Training.calibrationBins(spark, sfTest).collect()
    assert(rows.nonEmpty)
    // value-keyed bins make the smoothed score strictly monotone in bin
    val preds = rows.sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("pred_rate"))
    preds.sliding(2).foreach {
      case Array(a, b) => assert(b > a, "capped-count bins must order the score")
      case _ =>
    }
    rows.foreach { r =>
      val (p, o) = (r.getAs[Double]("pred_rate"), r.getAs[Double]("obs_rate"))
      assert(p >= 0 && p < 1 && o >= 0 && o <= 1)
      assert(math.abs(r.getAs[Double]("gap") - (BigDecimal(p) - BigDecimal(o)).toDouble) < 1e-9)
    }
    val nUsers = Tables.events(spark, sfTest).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers, "bins must partition the user base")
  }

  test("feature hash: dims bounded, signed values bounded by token counts, deterministic") {
    val rows = operators.Training.featureHash(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dim = r.getAs[Int]("dim")
      assert(dim >= 0 && dim < operators.Training.FhDims)
      assert(r.getAs[Long]("doc_id") < operators.Training.FhDocs)
      assert(r.getAs[Long]("val") != 0L, "zero entries must be pruned from the sparse vectors")
    }
    // |signed sum| per doc can never exceed the doc's token count
    val tokCounts = Tables.documents(spark, sfTest)
      .where(col("doc_id") < operators.Training.FhDocs)
      .select(col("doc_id"),
        size(split(expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')"), " ")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      assert(rs.map(r => math.abs(r.getAs[Long]("val"))).sum <= tokCounts(doc))
    }
    val again = operators.Training.featureHash(spark, sfTest).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("target encode: LOO values bracket correctly and exclude own label") {
    val rows = operators.Training.targetEncode(spark, sfTest).collect()
    assert(rows.nonEmpty)
    val p0 = rows.map(_.getAs[Long]("n_pos")).sum.toDouble / rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val (n, np) = (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))
      val (lp, ln) = (r.getAs[Double]("loo_pos"), r.getAs[Double]("loo_neg"))
      // removing a positive lowers the rate; removing a negative raises it
      assert(lp <= ln + 1e-9, s"loo_pos $lp must not exceed loo_neg $ln")
      // closed forms match a direct recompute
      val m = operators.Training.TeM
      val wantLp = math.rint((np - 1 + m * p0) / (n - 1 + m) * 1e6) / 1e6
      val wantLn = math.rint((np + m * p0) / (n - 1 + m) * 1e6) / 1e6
      assert(math.abs(lp - wantLp) < 1e-9 && math.abs(ln - wantLn) < 1e-9)
      // smoothing keeps encodings strictly inside (0, 1)
      assert(r.getAs[Double]("enc_rate") > 0 && r.getAs[Double]("enc_rate") < 1)
    }
  }

  test("quantile norm: reference source maps onto itself; normalized range stays in ref range") {
    val rows = operators.Training.quantileNorm(spark, sfTest).collect()
    assert(rows.nonEmpty)
    val refRow = rows.find(_.getAs[String]("source") == operators.Training.QnRef).get
    // the reference mapped through its own quantile function is (near-)identity
    assert(math.abs(refRow.getAs[Double]("mean_raw") - refRow.getAs[Double]("mean_norm")) < 1e-6,
      "reference source must map onto itself")
    val refStats = Tables.documents(spark, sfTest)
      .where(col("source") === operators.Training.QnRef)
      .agg(min("n_chars"), max("n_chars")).head
    val (rMin, rMax) = (refStats.getLong(0).toDouble, refStats.getLong(1).toDouble)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_norm") >= rMin - 1e-9 &&
             r.getAs[Double]("max_norm") <= rMax + 1e-9,
        s"normalized values must live inside the reference range for ${r.getString(0)}")
    }
  }

  test("embed pc1 matches a local integer power-iteration replay; isotropic share is low") {
    val T = operators.Training
    val vecs = Tables.embeddings(spark, sfTest)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("q", round((col("v").cast("double") + 1.0d) * T.KmScale, 0).cast("long"))
      .select("vec_id", "pos", "q").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getLong(2))).toMap
    val dims = vecs.values.head.length
    val n = vecs.size
    val mean = Array.tabulate(dims)(j => {
      val s = vecs.values.map(_(j)).sum
      Math.floorDiv(s, n.toLong)
    })
    val centered = vecs.values.map(v => Array.tabulate(dims)(j => v(j) - mean(j))).toSeq
    val cov = Array.tabulate(dims, dims)((i, j) => centered.map(c => c(i) * c(j)).sum)
    var vv = Array.fill(dims)(T.Pc1Scale)
    for (_ <- 1 to T.Pc1Rounds) {
      val w = Array.tabulate(dims)(i => (0 until dims).map(j => cov(i)(j) * vv(j)).sum)
      val mx = w.map(math.abs).max
      vv = w.map(x => math.signum(x) * (math.abs(x) * T.Pc1Scale / mx))
    }
    val trace = (0 until dims).map(i => cov(i)(i)).sum
    val num = (for (i <- 0 until dims; j <- 0 until dims)
      yield cov(i)(j).toDouble * vv(i) * vv(j)).sum
    val n2 = vv.map(x => x * x).sum
    val share = num / (n2.toDouble * trace)
    val r = T.embedPc1(spark, sfTest).head
    assert(r.getAs[Long]("v_checksum") == vv.sum, "integer iterate must replay exactly")
    assert(r.getAs[Int]("top_dim") ==
      vv.zipWithIndex.maxBy { case (x, i) => (math.abs(x), -i) }._2)
    assert(math.abs(r.getAs[Double]("pc1_var_share") - share) < 1e-4)
    // the fixture embeddings are near-isotropic: no dominant axis
    assert(r.getAs[Double]("pc1_var_share") > 0 &&
           r.getAs[Double]("pc1_var_share") < 0.2,
      s"isotropic corpus must not show a dominant PC1: ${r.getAs[Double]("pc1_var_share")}")
  }

  test("kcenter coreset matches a local greedy replay; radius curve is non-increasing") {
    val T = operators.Training
    val vecs = Tables.embeddings(spark, sfTest)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("q", round((col("v").cast("double") + 1.0d) * T.KmScale, 0).cast("long"))
      .select("vec_id", "pos", "q").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getLong(2))).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vecs.keys.min
    var dist = vecs.keys.map(v => v -> d2(vecs(v), vecs(seed))).toMap
    var expected = List((1, seed, 0L))
    for (k <- 2 to T.KcK) {
      val (pid, pd) = dist.toSeq.minBy { case (v, d) => (-d, v) }
      expected = (k, pid, pd) :: expected
      dist = dist.map { case (v, d) => v -> math.min(d, d2(vecs(v), vecs(pid))) }
    }
    val got = operators.Training.kcenterCoreset(spark, sfTest).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toList == expected.reverse, "greedy replay mismatch")
    // farthest-first: each later pick can never be farther than an earlier one
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coverage radii must be non-increasing: ${radii.mkString(",")}")
    assert(got.map(_._2).distinct.length == T.KcK, "selected centers are distinct")
  }

  test("pq adc: recall vs exact brute force, and codes cover every vector fully") {
    val T = operators.Training
    // exact integer top-K per query from the same quantized vectors
    val qv = Tables.embeddings(spark, sfTest)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("q", round((col("v").cast("double") + 1.0d) * T.KmScale, 0).cast("long"))
      .select("vec_id", "pos", "q").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getLong(2))).toMap
    val qIds = qv.keys.toSeq.sorted.take(T.PqNQueries)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = qIds.map { qid =>
      qid -> qv.keys.filter(_ != qid).toSeq
        .map(v => (d2(qv(qid), qv(v)), v)).sorted.take(T.PqTopK).map(_._2).toSet
    }.toMap
    val adc = T.pqAdc(spark, sfTest).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(adc.keySet == qIds.toSet)
    val recalls = qIds.map(qid =>
      (exact(qid) & adc(qid)).size.toDouble / T.PqTopK)
    val mean = recalls.sum / recalls.size
    info(f"PQ ADC mean recall@${T.PqTopK} = $mean%.2f (per query: ${recalls.map(r => f"$r%.1f").mkString(",")})")
    assert(mean >= 0.5, f"mean ADC recall $mean%.2f below floor")
    // every vector carries exactly dims/PqSubDim codes, every code a live codeword
    val dims = qv.values.head.length
    val codes = T.pqAdc(spark, sfTest) // force model; then count codes directly
    val nCodes = T.pqCodebooks(spark, sfTest)
      .select("sub", "cluster").distinct().count()
    assert(nCodes <= (dims / T.PqSubDim).toLong * T.PqK)
    assert(codes.count() == T.PqNQueries.toLong * T.PqTopK)
  }

  test("dpo pairs: candidate caps, strict preference and margins match a local replay") {
    val inter = Tables.interactions(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2))))
    val byUser = inter.groupBy(_._1)
    val pairs = byUser.toSeq.flatMap { case (u, rows) =>
      val top = rows.toSeq.sortBy(r => (-r._3, r._2)).take(operators.Training.DpoCandC)
      val bot = rows.toSeq.sortBy(r => (r._3, -r._2)).take(operators.Training.DpoCandC)
      for {
        c <- top; rj <- bot
        if c._2 != rj._2 && c._3 > rj._3
      } yield (u, c._2, rj._2, c._3 - rj._3)
    }
    val expected = pairs.sortBy { case (u, c, rj, m) => (-m, u, c, rj) }
      .take(operators.Training.DpoTop)
    val got = operators.Training.dpoPairs(spark, sfTest).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("chosen_item"),
        r.getAs[Long]("rejected_item"), r.getAs[Long]("margin")))
    assert(got.toSeq == expected, "dpo pair replay mismatch")
    // every emitted pair is a strict preference between distinct items
    assert(got.forall(p => p._2 != p._3 && p._4 > 0))
    // per-user pair count is bounded by the C*C cap
    val cap = operators.Training.DpoCandC * operators.Training.DpoCandC
    assert(got.groupBy(_._1).values.forall(_.length <= cap))
  }

  test("embed mmd: kernel block sums match a local fixed-point replay; identical samples give mmd2 ~ 0") {
    val T = operators.Training
    val rows = Tables.embeddings(spark, sfTest)
      .where(org.apache.spark.sql.functions.col("label").isin(0, 1))
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val x = rows.filter(_._2 == 0).sortBy(_._1).take(T.MmdN).map(_._3)
    val y = rows.filter(_._2 == 1).sortBy(_._1).take(T.MmdN).map(_._3)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def k(a: Array[Float], b: Array[Float]): Long =
      math.round(math.exp((2.0 * dot(a, b) - dot(a, a) - dot(b, b)) / 64.0) * T.MmdScale)
    def blockSame(v: Array[Array[Float]]): (Long, Long) = {
      var s = 0L; var n = 0L
      for (i <- v.indices; j <- i + 1 until v.length) { s += k(v(i), v(j)); n += 1 }
      (s, n)
    }
    var sxy = 0L; var nxy = 0L
    for (a <- x; b <- y) { sxy += k(a, b); nxy += 1 }
    val (sxx, nxx) = blockSame(x); val (syy, nyy) = blockSame(y)
    val mmd2 = (sxx.toDouble / nxx + syy.toDouble / nyy - 2.0 * sxy / nxy) / T.MmdScale
    val r = T.embedMmd(spark, sfTest).head
    assert(r.getAs[Long]("n_x") == x.length && r.getAs[Long]("n_y") == y.length)
    assert(math.abs(r.getAs[Double]("mean_kxx") - sxx.toDouble / nxx / T.MmdScale) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_kyy") - syy.toDouble / nyy / T.MmdScale) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_kxy") - sxy.toDouble / nxy / T.MmdScale) < 1e-5)
    assert(math.abs(r.getAs[Double]("mmd2") - mmd2) < 1e-5)
    // sanity: MMD2 of a sample against ITSELF is the unbiased-estimator
    // identity mean_kxx + mean_kxx - 2*mean_kxx = 0 exactly
    val (sxx2, nxx2) = blockSame(x)
    assert(sxx2 == sxx && nxx2 == nxx)
    // and the two-sample statistic is bounded: kernels live in [0, 1]
    assert(r.getAs[Double]("mmd2") >= -1.0 - 1e-9 && r.getAs[Double]("mmd2") <= 2.0 + 1e-9)
  }
}
