package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite with SparkFixture {

  test("every analytics query runs non-empty on sf0.001") {
    operators.Analytics.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfTest).count() > 0, s"$name returned 0 rows")
    }
  }

  test("funnel stages are ordered: viewers >= clickers >= purchasers") {
    val r = operators.Analytics.sessionFunnel(spark, sfTest).collect().head
    val (nv, nc, np) =
      (r.getAs[Long]("n_viewers"), r.getAs[Long]("n_clickers"), r.getAs[Long]("n_purchasers"))
    assert(nv >= nc && nc >= np)
    assert(r.getAs[Double]("overall") <= r.getAs[Double]("view_to_click"))
  }

  test("ordered funnel requires strictly-later events (literal frame)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // u1 converts fully in order; u2 purchased BEFORE clicking (no
    // purchase conversion); u3 only views.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      (2L, "view", ts("2024-01-01 09:00:00")), (2L, "purchase", ts("2024-01-01 09:30:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "event_type", "ts")
    import org.apache.spark.sql.functions._
    val tv = ev.where($"event_type" === "view").groupBy("user_id").agg(min("ts").as("tv"))
    val tc = ev.where($"event_type" === "click").join(tv, "user_id")
      .where($"ts" > $"tv").groupBy("user_id").agg(min("ts").as("tc"))
    val tp = ev.where($"event_type" === "purchase").join(tc, "user_id")
      .where($"ts" > $"tc").groupBy("user_id").agg(min("ts").as("tp"))
    assert(tv.count() === 3 && tc.count() === 2 && tp.count() === 1)
    assert(tp.select("user_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("retention matrix: offset-0 retention is 1.0 and offsets are non-negative") {
    val rows = operators.Analytics.retentionCohorts(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Int]("week_offset")
      assert(off >= 0)
      if (off == 0)
        assert(r.getAs[Double]("retention") === 1.0,
          s"cohort ${r.get(0)}: every cohort member is active in their first week")
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cohort_size"))
    }
  }

  test("anomaly gate flags exactly the planted outlier (literal frame)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 values at 10.0 +- 1 and one wild outlier
    val vals = (Seq.fill(10)(9.0) ++ Seq.fill(10)(11.0) :+ 1000.0)
      .map(v => ("click", v)).toDF("event_type", "value")
    val stats = vals.groupBy("event_type")
      .agg(round(avg("value"), 6).as("mean_v"), round(stddev_pop($"value"), 6).as("sd_v"))
    val flagged = vals.join(broadcast(stats), "event_type")
      .where(abs($"value" - $"mean_v") > lit(operators.Analytics.ZThreshold) * $"sd_v")
      .collect()
    assert(flagged.length === 1 && flagged.head.getAs[Double]("value") === 1000.0)
  }

  test("ewma: seeds at the first observation and stays within the count envelope") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.ewmaSmooth(spark, sfTest)
    val firsts = r.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy("day")))
      .where(col("rn") === 1)
    assert(firsts.where(col("ewma") =!= col("n_events").cast("double")).count() === 0)
    val env = r.groupBy("event_type")
      .agg(min("n_events").as("mn"), max("n_events").as("mx"),
           min("ewma").as("emn"), max("ewma").as("emx"))
    env.collect().foreach { row =>
      assert(row.getAs[Double]("emn") >= row.getAs[Long]("mn").toDouble - 1e-9)
      assert(row.getAs[Double]("emx") <= row.getAs[Long]("mx").toDouble + 1e-9)
    }
  }

  test("session paths: counts positive, paths are 3-step chains of known types") {
    val types = Set("view", "click", "purchase", "signup", "error")
    val r = operators.Analytics.sessionPaths(spark, sfTest).collect()
    assert(r.nonEmpty && r.length <= operators.Analytics.PathTop)
    r.foreach { row =>
      val steps = row.getAs[String]("path").split(">")
      assert(steps.length === operators.Analytics.PathLen)
      steps.foreach(t => assert(types.contains(t), s"unknown type $t"))
      assert(row.getAs[Long]("n") > 0)
    }
  }

  test("mad outliers: robust gate flags no more than the z-score variance bound") {
    val r = operators.Analytics.madOutliers(spark, sfTest).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("mad") >= 0.0)
      assert(row.getAs[Long]("n_outliers") >= 0L)
      assert(row.getAs[Long]("n_outliers") < row.getAs[Long]("n_events"))
    }
  }

  test("latest snapshot: user counts partition the user base") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.latestSnapshot(spark, sfTest)
    val total = r.agg(sum("n_users")).head.getLong(0)
    val users = Tables.events(spark, sfTest).select("user_id").distinct().count()
    assert(total === users, "every user has exactly one latest event")
  }

  test("histogram: bin counts sum to the non-null event count, bounds consistent") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.valueHistogram(spark, sfTest).cache()
    val total = r.agg(sum("n")).head.getLong(0)
    val evs = Tables.events(spark, sfTest)
      .where(col("value").isNotNull && !isnan(col("value"))).count()
    assert(total === evs)
    assert(r.where(col("hi") - col("lo") =!= operators.Analytics.HistBinWidth).count() === 0)
  }

  test("churn labels: both classes present, populations partition users") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.churnLabels(spark, sfTest).collect()
    assert(r.length === 2, "churn horizon must discriminate on this fixture")
    val total = r.map(_.getAs[Long]("n_users")).sum
    assert(total === Tables.events(spark, sfTest).select("user_id").distinct().count())
  }

  test("ab test: hash arms partition users; A/A z-stat is small") {
    val r = operators.Analytics.abTest(spark, sfTest).collect()
    assert(r.length === 2)
    val z = r.head.getAs[Double]("z_stat")
    assert(math.abs(z) < 3.0, s"A/A split should not be significant, z=$z")
    r.foreach { row =>
      val rate = row.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("late shipments: late counts bounded by order counts") {
    operators.Relational.lateShipments(spark, sfTest).collect().foreach { row =>
      assert(row.getAs[Long]("n_late") <= row.getAs[Long]("n_orders"))
      val s = row.getAs[Double]("late_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("supplier share: shares within a part sum to at most 1") {
    import org.apache.spark.sql.functions._
    val sums = operators.Relational.supplierShare(spark, sfTest)
      .groupBy("l_partkey").agg(sum("share").as("s")).collect()
    sums.foreach(row => assert(row.getAs[Double]("s") <= 1.0 + 1e-6))
  }

  test("new vs returning: day-1 users are all new; daily actives partition") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.newVsReturning(spark, sfTest).orderBy("day").collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[Long]("returning_users") === 0L, "first day has no history")
    r.foreach(row => assert(row.getAs[Long]("n_events") > 0))
  }

  test("conversion lag: buckets cover converting users exactly once") {
    import org.apache.spark.sql.functions._
    val r = operators.Analytics.conversionLag(spark, sfTest).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("min_h") <= row.getAs[Long]("max_h"))
      assert(row.getAs[Long]("n_users") > 0)
    }
  }

  test("brand affinity: unordered distinct-brand pairs, canonical order") {
    val r = operators.Recsys.brandAffinity(spark, sfTest).collect()
    assert(r.nonEmpty && r.length <= operators.Recsys.AffinityTop)
    r.foreach { row =>
      assert(row.getAs[String]("brand_a") < row.getAs[String]("brand_b"))
      assert(row.getAs[Long]("co_total") >= row.getAs[Long]("n_item_pairs"))
    }
  }

  test("stickiness: WAU <= MAU, ratio in (0, 1]") {
    operators.Analytics.stickiness(spark, sfTest).collect().foreach { row =>
      assert(row.getAs[Long]("wau") <= row.getAs[Long]("mau"))
      val st = row.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("dead stock: dead parts bounded by catalog, disjoint from sold") {
    import org.apache.spark.sql.functions._
    val r = operators.Relational.deadStock(spark, sfTest).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_dead") <= row.getAs[Long]("n_catalog"))
    }
    val totalDead = r.map(_.getAs[Long]("n_dead")).sum
    val sold = Tables.lineitem(spark, sfTest).select("l_partkey").distinct().count()
    val catalog = Tables.part(spark, sfTest).count()
    assert(totalDead === catalog - sold)
  }

  test("seasonal-naive backtest is day-keyed: a series gap cannot misalign predictions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 days of a single type with day 5 missing; lag(7)-by-rows would
    // pair day 12 with day 4 — the day-keyed join must pair 12 with 5
    // (absent -> dropped) and 11 with 4 etc.
    val days = Seq(1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 12)
    val daily = days.map(d => ("view", java.sql.Date.valueOf(f"2024-01-$d%02d"), d.toDouble))
      .toDF("event_type", "day", "v")
    val pred = daily.select(col("event_type"), date_add(col("day"), 7).as("day"),
      col("v").as("pred"))
    val joined = daily.join(pred, Seq("event_type", "day"))
      .select(col("day"), col("v"), col("pred")).collect()
      .map(r => (r.getDate(0).getDate, r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    // day d must predict from exactly day d-7; day 12 (would-be pred day 5) absent
    assert(joined.map(_._1).toSeq == Seq(8, 9, 10, 11))
    joined.foreach { case (d, v, p) => assert(v - p == 7.0, s"day $d paired wrong") }
    val out = operators.Analytics.forecastNaive(spark, sfTest).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("mape") >= 0 && !r.getAs[Double]("mape").isNaN)
      assert(r.getAs[Double]("mae") >= 0)
    }
  }

  test("cohort LTV: per-user curve is non-decreasing within every cohort") {
    val rows = operators.Analytics.cohortLtv(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("cohort")).foreach { case (c, rs) =>
      val curve = rs.sortBy(_.getAs[Int]("week_offset")).map(_.getAs[Double]("ltv_per_user"))
      curve.sliding(2).foreach {
        case Array(a, b) => assert(b >= a, s"cohort $c LTV decreased: $a -> $b")
        case _ =>
      }
      rs.foreach(r => assert(r.getAs[Double]("rev") > 0))
    }
  }

  test("windowed funnel: bounded by the unbounded funnel; horizon excludes late steps") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = operators.Analytics.windowFunnel(spark, sfTest).collect().head
    val u = operators.Analytics.sessionFunnel(spark, sfTest).collect().head
    assert(w.getAs[Long]("n_depth1") == u.getAs[Long]("n_viewers"))
    assert(w.getAs[Long]("n_depth2") <= u.getAs[Long]("n_clickers"))
    assert(w.getAs[Long]("n_depth3") <= u.getAs[Long]("n_purchasers"))
    assert(w.getAs[Long]("n_depth1") >= w.getAs[Long]("n_depth2"))
    assert(w.getAs[Long]("n_depth2") >= w.getAs[Long]("n_depth3"))
    // literal: u1 clicks inside the 7-day horizon, u2 clicks on day 9
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")), (1L, "click", ts("2024-01-03 00:00:00")),
      (2L, "view", ts("2024-01-01 00:00:00")), (2L, "click", ts("2024-01-10 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val horizonUs = operators.Analytics.FunnelWindowDays * 86400L * 1000000L
    val e2 = ev.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val tv = e2.where(col("event_type") === "view").groupBy("user_id").agg(min("us").as("tv"))
    val tc = e2.where(col("event_type") === "click").join(tv, "user_id")
      .where(col("us") > col("tv") && col("us") <= col("tv") + horizonUs)
    assert(tc.select("user_id").collect().map(_.getLong(0)).toSet == Set(1L),
      "day-9 click must fall outside the 7-day horizon")
  }

  test("seasonal decomposition: components reassemble the series; seasonal sums to ~0") {
    val rows = operators.Analytics.seasonalDecompose(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, t, se, res) = (r.getAs[Double]("v"), r.getAs[Double]("trend"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))
      assert(math.abs(v - (t + se + res)) < 1e-4,
        s"components must reassemble v on ${r.getAs[java.sql.Date]("day")}")
      val idx = r.getAs[Int]("season_idx")
      assert(idx >= 0 && idx <= 6)
    }
    // the seasonal component averages to ~0 across the series by construction
    val meanSeasonal = rows.map(_.getAs[Double]("seasonal")).sum / rows.length
    val meanAbsV = rows.map(r => math.abs(r.getAs[Double]("v"))).sum / rows.length
    assert(math.abs(meanSeasonal) < 0.2 * meanAbsV)
    // season index is stable per weekday: 7 distinct values at most
    assert(rows.map(_.getAs[Int]("season_idx")).distinct.length <= 7)
  }

  test("cuped: adjustment is mean-preserving overall and never inflates variance") {
    val rows = operators.Analytics.cuped(spark, sfTest).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      // pooled reduction = in-sample rho^2: theta is the pooled OLS
      // minimizer, so it is non-negative by construction
      assert(vr >= -1e-9 && vr < 1.0, s"pooled var reduction $vr out of range")
    }
    // adjustment subtracts theta*(pre - E[pre]): zero-mean over the
    // pooled users, so the user-weighted means agree before/after
    val (n0, n1) = (rows(0).getAs[Long]("n_users"), rows(1).getAs[Long]("n_users"))
    val pooledPost = (rows(0).getAs[Double]("mean_post") * n0 +
      rows(1).getAs[Double]("mean_post") * n1) / (n0 + n1)
    val pooledAdj = (rows(0).getAs[Double]("mean_adj") * n0 +
      rows(1).getAs[Double]("mean_adj") * n1) / (n0 + n1)
    assert(math.abs(pooledPost - pooledAdj) < 0.01,
      s"CUPED must be mean-preserving: $pooledPost vs $pooledAdj")
  }

  test("diff-in-diff: estimate equals the cell-mean identity; arms partition users") {
    val r = operators.Analytics.diffInDiff(spark, sfTest).collect().head
    val nUsers = Tables.events(spark, sfTest).select("user_id").distinct().count()
    assert(r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl") == nUsers)
    val identity = (r.getAs[Double]("post_treat") - r.getAs[Double]("pre_treat")) -
      (r.getAs[Double]("post_ctrl") - r.getAs[Double]("pre_ctrl"))
    assert(math.abs(r.getAs[Double]("did") - identity) < 1e-3,
      s"DiD ${r.getAs[Double]("did")} vs cell identity $identity")
  }

  test("ab power: MDE matches the closed form and shrinks with sample size") {
    val r = operators.Analytics.abPower(spark, sfTest).collect().head
    val (na, nb, p) = (r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Double]("pooled_rate"))
    assert(na > 0 && nb > 0 && p > 0 && p < 1)
    def mde(a: Long, b: Long, pr: Double): Double =
      (operators.Analytics.PowerZa + operators.Analytics.PowerZb) *
        math.sqrt(pr * (1 - pr) * (1.0 / a + 1.0 / b))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde(na, nb, p)) < 1e-3)
    assert(mde(na * 4, nb * 4, p) < mde(na, nb, p) / 1.9, "4x users ~ halves the MDE")
  }

  test("load heatmap: cells partition events, lift matches the marginal product") {
    val rows = operators.Analytics.loadHeatmap(spark, sfTest).collect()
    val total = Tables.events(spark, sfTest).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total, "cells must partition the stream")
    val nd = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    val nh = rows.groupBy(_.getInt(1)).view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    rows.foreach { r =>
      val exp = nd(r.getInt(0)).toDouble * nh(r.getInt(1)) / total
      assert(math.abs(r.getAs[Double]("expected") - math.rint(exp * 1e4) / 1e4) < 1e-9)
      assert(math.abs(r.getAs[Double]("lift") -
        math.rint(r.getAs[Long]("n_events") / exp * 1e4) / 1e4) < 1e-3)
    }
    // lift averages to ~1 when weighted by expectation
    val wsum = rows.map(r => r.getAs[Double]("expected") * r.getAs[Double]("lift")).sum
    assert(math.abs(wsum / total - 1.0) < 1e-3)
  }

  test("ab srm: arm counts partition users, chi2 matches a local recompute, no alarm on a clean split") {
    val rows = operators.Analytics.abSrm(spark, sfTest).collect()
    assert(rows.map(_.getAs[Int]("arm")).toSeq == Seq(0, 1, 2))
    val n = Tables.events(spark, sfTest).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == n, "arms must partition the users")
    val chi2 = rows.map { r =>
      val exp = if (r.getAs[Int]("arm") == 0) n * 0.5 else n * 0.25
      math.pow(r.getAs[Long]("n_users") - exp, 2) / exp
    }.sum
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("chi2_total") - math.rint(chi2 * 1e4) / 1e4) < 1e-9)
      assert(r.getAs[Int]("srm_alarm") == (if (chi2 > operators.Analytics.SrmChi2Crit) 1 else 0))
    }
    // a healthy hash split over the fixture population must not alarm
    assert(rows.head.getAs[Int]("srm_alarm") == 0, s"clean split alarmed, chi2=$chi2")
  }

  test("ab srm: a fully empty arm still contributes its expected count to chi2") {
    import spark.implicits._
    // 100 users in arm 0, 100 in arm 1, arm 2 logs NOTHING — the broken
    // assignment the guardrail exists for. Without the literal 3-arm
    // right join the empty arm dropped out and chi2 was understated by
    // exactly the expected count (50).
    val perUser = (1 to 200).map(i => (i.toLong, if (i <= 100) 0 else 1))
      .toDF("user_id", "arm")
    val rows = operators.Analytics.abSrmOf(spark, perUser).collect()
    assert(rows.map(_.getAs[Int]("arm")).toSeq == Seq(0, 1, 2), "all 3 arms must emit")
    val empty = rows.find(_.getAs[Int]("arm") == 2).get
    assert(empty.getAs[Long]("n_users") == 0L)
    assert(empty.getAs[Double]("expected") == 50.0)
    assert(empty.getAs[Double]("chi2_contrib") == 50.0) // (0-50)^2/50
    // chi2 = (100-100)^2/100 + (100-50)^2/50 + (0-50)^2/50 = 100
    assert(rows.head.getAs[Double]("chi2_total") == 100.0)
    assert(rows.head.getAs[Int]("srm_alarm") == 1, "a dead arm must alarm")
  }

  test("burst detect matches a local Poisson-surprise recompute") {
    val rows = Tables.events(spark, sfTest)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val span = rows.map(_._2).max - rows.map(_._2).min + 1
    val hourly = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def llr(n: Long, mu: Double): Double =
      if (n > mu) n * math.log(n / mu) - (n - mu) else 0.0
    val expected = hourly.toSeq.map { case ((t, h), n) =>
      (math.rint(llr(n, totals(t).toDouble / span) * 1e4) / 1e4, t, h, n)
    }.sortBy { case (l, t, h, _) => (-l, t, h) }.take(operators.Analytics.BurstTop)
    val got = operators.Analytics.burstDetect(spark, sfTest).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (l, t, h, n)) =>
      assert(r.getString(1) == t && r.getAs[Long]("n") == n)
      assert(r.getTimestamp(2).getTime / 1000 / 3600 == h, "hour bucket must match")
      assert(math.abs(r.getAs[Double]("llr") - l) < 1e-3)
    }
    assert(got.head.getAs[Double]("llr") > 0, "the fixture stream must show some burst")
  }

  test("session entropy matches a local recompute; bounds hold") {
    val rows = Tables.events(spark, sfTest)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = rows.groupBy(_._1).view.mapValues { es =>
      val counts = es.groupBy(_._2).view.mapValues(_.length).values.toSeq
      val n = counts.sum.toDouble
      val h = -counts.map(c => c / n * math.log(c / n)).sum
      (es.length.toLong, counts.length.toLong, h)
    }.toMap
    val expectedTop = per.toSeq
      .map { case (u, (_, _, h)) => (-math.rint(h * 1e6) / 1e6, u) }.sorted
      .take(operators.Analytics.EntropyTop).map(_._2)
    val got = operators.Analytics.sessionEntropy(spark, sfTest).collect()
    assert(got.map(_.getAs[Long]("user_id")).toSeq == expectedTop)
    got.foreach { r =>
      val (n, k, h) = per(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("n_types") == k)
      assert(math.abs(r.getAs[Double]("entropy_nats") - h) < 1e-4)
      val ev = r.getAs[Double]("evenness")
      assert(ev >= 0 && ev <= 1 + 1e-9, s"evenness $ev out of bounds")
    }
  }

  test("concurrency peak matches a local global sweep over the session intervals") {
    // recompute sessions locally with the same 30-min gap rule
    val ev = Tables.events(spark, sfTest)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val sessions = ev.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((_, ts, _) <- sorted) {
        if (out.isEmpty || ts - out.last._2 > 1800L * 1000000L) out += ((ts, ts))
        else out(out.length - 1) = (out.last._1, ts)
      }
      out
    }.toSeq
    // global sweep: +1 at start, -1 at end; starts first at equal instants
    val points = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy { case (t, d) => (t, -d) }
    var conc = 0
    val perDay = scala.collection.mutable.Map.empty[java.time.LocalDate, Int]
    val endConc = scala.collection.mutable.Map.empty[java.time.LocalDate, Int]
    for ((t, d) <- points) {
      conc += d
      val day = java.time.Instant.ofEpochSecond(t / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      perDay(day) = math.max(perDay.getOrElse(day, Int.MinValue), conc)
      endConc(day) = conc
    }
    // calendar fill: a point-free day peaks at the concurrency carried in
    val d0 = perDay.keys.min
    val d1 = perDay.keys.max
    var carry = 0
    val expected = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).map { day =>
      val peak = perDay.getOrElse(day, carry)
      if (perDay.contains(day)) carry = endConc(day)
      (day, peak)
    }.toMap
    val got = operators.Analytics.concurrencyPeak(spark, sfTest).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getAs[Long]("peak_concurrency"))).toMap
    assert(got.keySet == expected.keySet)
    for ((day, peak) <- expected)
      assert(got(day) == peak.toLong, s"day $day: got ${got(day)}, sweep says $peak")
    // sanity: some day holds >1 concurrent session on the fixture
    assert(perDay.values.max > 1)
  }

  test("markov attribution: removal effects match an exact local fixed-point replay") {
    import org.apache.spark.sql.functions._
    val out = operators.Analytics.markovAttribution(spark, sfTest).collect()
    assert(out.map(_.getAs[String]("channel")).toSeq ===
      operators.Analytics.MkAttrChannels)
    // local replay: journeys -> transition counts
    val ev = Tables.events(spark, sfTest)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2)).map(_._4).toSeq).toMap
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    def add(s: String, d: String): Unit = cnt((s, d)) = cnt.getOrElse((s, d), 0L) + 1
    ev.values.foreach { seq =>
      seq.zipWithIndex.foreach { case (t, i) =>
        val prev = if (i == 0) None else Some(seq(i - 1))
        if (prev.isEmpty || prev.contains("purchase"))
          add("START", if (t == "purchase") "CONV" else t)
        if (t != "purchase") {
          val next = if (i == seq.length - 1) None else Some(seq(i + 1))
          add(t, next match {
            case None => "NULL"; case Some("purchase") => "CONV"; case Some(x) => x
          })
        }
      }
    }
    val u = operators.Analytics.MkAttrU
    def walk(removed: Option[String]): Long = {
      val vtc = scala.collection.mutable.Map.empty[(String, String), Long]
      cnt.foreach { case ((s, d), c) =>
        if (!removed.contains(s)) {
          val d2 = if (removed.contains(d)) "NULL" else d
          vtc((s, d2)) = vtc.getOrElse((s, d2), 0L) + c
        }
      }
      val tot = vtc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      var m = vtc.map { case ((s, d), c) => (s, d) -> c * u / tot(s) }.toMap ++
        Map(("CONV", "CONV") -> u, ("NULL", "NULL") -> u)
      for (_ <- 1 to operators.Analytics.MkAttrSq) {
        val next = scala.collection.mutable.Map.empty[(String, String), Long]
        for (((s, k), p1) <- m; ((k2, d), p2) <- m if k2 == k)
          next((s, d)) = next.getOrElse((s, d), 0L) + p1 * p2
        m = next.view.mapValues(_ / u).toMap
      }
      m.getOrElse(("START", "CONV"), 0L)
    }
    val pFull = walk(None)
    val removals = operators.Analytics.MkAttrChannels
      .map(c => c -> (pFull - walk(Some(c)))).toMap
    val rmTot = removals.values.sum
    out.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("p_conv") - pFull.toDouble / u) < 2e-6)
      assert(math.abs(r.getAs[Double]("p_removed") - (pFull - removals(c)).toDouble / u) < 2e-6)
      assert(math.abs(r.getAs[Double]("removal_effect") - removals(c).toDouble / pFull) < 2e-6)
      assert(math.abs(r.getAs[Double]("share") - removals(c).toDouble / rmTot) < 2e-6)
    }
    // shares partition the credit
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("rdd effect: side fits match a local closed-form OLS; jump is intercept diff") {
    import org.apache.spark.sql.functions._
    val out = operators.Analytics.rddEffect(spark, sfTest).collect()
    assert(out.map(_.getAs[String]("side")).toSeq === Seq("1_left", "2_right"))
    val spend = Tables.orders(spark, sfTest)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cC = math.round(operators.Analytics.RddCutoff * 100)
    val hC = math.round(operators.Analytics.RddBandwidth * 100)
    val pts = Tables.customer(spark, sfTest)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (math.round(r.getDouble(1) * 100) - cC,
        spend.getOrElse(r.getLong(0), 0L)))
      .filter { case (dx, _) => dx >= -hC && dx <= hC }
    def fit(side: Seq[(Long, Long)]): (Long, Double, Double) = {
      val n = side.size.toLong
      val sx = side.map(_._1).sum; val sy = side.map(_._2).sum
      val sxx = side.map(p => p._1 * p._1).sum
      val sxy = side.map(p => p._1 * p._2).sum
      val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val a = (sy.toDouble - b * sx.toDouble) / n
      (n, a, b)
    }
    val (nl, al, bl) = fit(pts.filter(_._1 < 0).toSeq)
    val (nr, ar, br) = fit(pts.filter(_._1 >= 0).toSeq)
    val byside = out.map(r => r.getAs[String]("side") -> r).toMap
    assert(byside("1_left").getAs[Long]("n") === nl)
    assert(byside("2_right").getAs[Long]("n") === nr)
    assert(math.abs(byside("1_left").getAs[Double]("intercept") - al / 100.0) < 2e-4)
    assert(math.abs(byside("2_right").getAs[Double]("intercept") - ar / 100.0) < 2e-4)
    assert(math.abs(byside("1_left").getAs[Double]("slope_per_dollar") - bl * 100.0) < 2e-6)
    assert(math.abs(byside("2_right").getAs[Double]("slope_per_dollar") - br * 100.0) < 2e-6)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("effect_at_cutoff") - (ar - al) / 100.0) < 2e-4)
    }
  }

  test("msprt: mixture LR matches a local replay; always-valid p is monotone") {
    import org.apache.spark.sql.functions._
    val out = operators.Analytics.msprt(spark, sfTest).collect()
    assert(out.nonEmpty)
    // the always-valid envelope never rises and never exceeds 1
    val ps = out.map(_.getAs[Double]("p_always"))
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 })
    // local replay from the raw purchase log
    val ev = Tables.events(spark, sfTest)
      .where(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        expr("cast(conv(substring(md5(concat_ws('-', cast(user_id AS string), 'ab')), 1, 8), 16, 10) AS bigint) % 2").as("arm"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val days = ev.map(_._1).distinct.sorted
    var (nt, nc, st, sc, sst, ssc) = (0L, 0L, 0L, 0L, 0L, 0L)
    var pMin = 1.0
    val tau = operators.Analytics.MsprtTau
    val expected = days.flatMap { d =>
      ev.filter(_._1 == d).foreach { case (_, arm, cents) =>
        if (arm == 1) { nt += 1; st += cents; sst += cents * cents }
        else { nc += 1; sc += cents; ssc += cents * cents }
      }
      if (nt >= 2 && nc >= 2) {
        val vt = (sst / 10000.0 - (st / 100.0) * (st / 100.0) / nt) / (nt - 1)
        val vc = (ssc / 10000.0 - (sc / 100.0) * (sc / 100.0) / nc) / (nc - 1)
        val vn = vt / nt + vc / nc
        val zn = st / 100.0 / nt - sc / 100.0 / nc
        if (vn > 0) {
          val lam = math.sqrt(vn / (vn + tau)) *
            math.exp(zn * zn * tau / (2.0 * vn * (vn + tau)))
          pMin = math.min(pMin, math.min(1.0, 1.0 / lam))
          Some((d, nt, nc, zn, vn, lam, pMin))
        } else None
      } else None
    }
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (d, ent, enc, zn, vn, lam, p)) =>
      assert(r.getDate(0).toLocalDate === d)
      assert(r.getAs[Long]("nt") === ent && r.getAs[Long]("nc") === enc)
      assert(math.abs(r.getAs[Double]("mean_diff") - zn) < 2e-4)
      assert(math.abs(r.getAs[Double]("v_n") - vn) < 2e-6)
      assert(math.abs(r.getAs[Double]("lambda") - lam) < 2e-4)
      assert(math.abs(r.getAs[Double]("p_always") - p) < 2e-6)
    }
  }

  test("position bias: curve and IPS weights match a local recompute; identities hold") {
    import org.apache.spark.sql.functions._
    val out = operators.Analytics.positionBias(spark, sfTest).collect()
    val ev = Tables.events(spark, sfTest)
      .where(col("event_type").isin("view", "click"))
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1) % operators.Analytics.PbPositions))
    val views = ev.filter(_._1 == "view").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val clicks = ev.filter(_._1 == "click").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val p0 = out.map(_.getAs[Long]("pos")).min
    val (v1, c1) = (views(p0), clicks(p0))
    assert(out.length === views.keySet.union(clicks.keySet).size)
    out.foreach { r =>
      val p = r.getAs[Long]("pos")
      assert(r.getAs[Long]("n_views") === views.getOrElse(p, 0L))
      assert(r.getAs[Long]("n_clicks") === clicks.getOrElse(p, 0L))
      val ctr = clicks(p).toDouble / views(p)
      assert(math.abs(r.getAs[Double]("ctr") - ctr) < 2e-6)
      val bias = (clicks(p) * v1).toDouble / (views(p) * c1)
      assert(math.abs(r.getAs[Double]("exam_bias") - bias) < 2e-6)
      // bias and weight are reciprocal by construction
      assert(math.abs(r.getAs[Double]("exam_bias") * r.getAs[Double]("ips_weight") - 1.0) < 1e-4)
    }
    // the reference slot's bias is exactly 1 and its IPS weight 1
    val refRow = out.find(_.getAs[Long]("pos") == p0).get
    assert(refRow.getAs[Double]("exam_bias") === 1.0)
    assert(refRow.getAs[Double]("ips_weight") === 1.0)
    // mean positions: exact integer dot products
    val mv = views.map { case (p, n) => p * n }.sum.toDouble / views.values.sum
    val mc = clicks.map { case (p, n) => p * n }.sum.toDouble / clicks.values.sum
    assert(math.abs(refRow.getAs[Double]("mean_view_pos") - mv) < 2e-6)
    assert(math.abs(refRow.getAs[Double]("mean_click_pos") - mc) < 2e-6)
  }

  test("cem uplift: cell moments and ATT match a local matched-cell recompute") {
    import org.apache.spark.sql.functions._
    val out = operators.Analytics.cemUplift(spark, sfTest).collect()
    val spend = Tables.orders(spark, sfTest)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val cells = Tables.customer(spark, sfTest)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment")).collect()
      .map { r =>
        val (y, nOrd) = spend.getOrElse(r.getLong(0), (0L, 0L))
        val key = (r.getInt(1), math.floor(r.getDouble(2) / 2000.0).toInt,
          math.min(nOrd, 3L).toInt)
        val t = if (r.getString(3) == "BUILDING") 1 else 0
        (key, t, y)
      }
      .groupBy(_._1).view.mapValues { g =>
        val nt = g.count(_._2 == 1).toLong
        val nc = g.count(_._2 == 0).toLong
        val syt = g.collect { case (_, 1, y) => y }.sum
        val syc = g.collect { case (_, 0, y) => y }.sum
        (nt, nc, syt, syc)
      }.toMap.filter { case (_, (nt, nc, _, _)) => nt > 0 && nc > 0 }
    val att = (cells.values.map(_._3.toDouble).sum -
      cells.values.map { case (nt, nc, _, syc) => nt * (syc.toDouble / nc) }.sum) /
      cells.values.map(_._1).sum / 100.0
    assert(out.nonEmpty && out.length <= operators.Analytics.CemTop)
    out.foreach { r =>
      val key = (r.getAs[Int]("nation"), r.getAs[Int]("bband"), r.getAs[Int]("oband"))
      val (nt, nc, syt, syc) = cells(key)
      assert(r.getAs[Long]("n_treated") === nt)
      assert(r.getAs[Long]("n_control") === nc)
      assert(math.abs(r.getAs[Double]("att_cell") -
        (syt.toDouble / nt - syc.toDouble / nc) / 100.0) < 2e-4)
      assert(r.getAs[Long]("n_matched_cells") === cells.size.toLong)
      assert(r.getAs[Long]("treated_matched") === cells.values.map(_._1).sum)
      assert(math.abs(r.getAs[Double]("att") - att) < 2e-4)
    }
    // the head really is the treated-count-ordered top of the matched grid
    val expectedHead = cells.toSeq
      .sortBy { case ((n, b, o), (nt, _, _, _)) => (-nt, n, b, o) }
      .take(out.length).map(_._1)
    assert(out.map(r => (r.getAs[Int]("nation"), r.getAs[Int]("bband"),
      r.getAs[Int]("oband"))).toSeq === expectedHead)
  }

  test("cmh: stratum cells, pooled OR and continuity-corrected chi2 match a local recompute") {
    val urgent = Tables.orders(spark, sfTest)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getAs[Number](0).longValue).toSet
    val rows = Tables.customer(spark, sfTest)
      .select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getAs[Number](1).longValue, r.getString(2) == "BUILDING",
        urgent(r.getAs[Number](0).longValue)))
    val cells = rows.groupBy(_._1).view.mapValues { g =>
      val a = g.count(x => x._2 && x._3).toLong
      val b = g.count(x => x._2 && !x._3).toLong
      val c = g.count(x => !x._2 && x._3).toLong
      val d = g.count(x => !x._2 && !x._3).toLong
      (a, b, c, d)
    }.toMap.filter { case (_, (a, b, c, d)) => a + b + c + d > 1 }
    def n(t: (Long, Long, Long, Long)) = t._1 + t._2 + t._3 + t._4
    val sad = cells.values.map(t => t._1.toDouble * t._4 / n(t)).sum
    val sbc = cells.values.map(t => t._2.toDouble * t._3 / n(t)).sum
    val sa = cells.values.map(_._1.toDouble).sum
    val se = cells.values.map(t => (t._1 + t._2).toDouble * (t._1 + t._3) / n(t)).sum
    val sv = cells.values.map { t =>
      (t._1 + t._2).toDouble * (t._3 + t._4) * (t._1 + t._3) * (t._2 + t._4) /
        (n(t).toDouble * n(t) * (n(t) - 1.0))
    }.sum
    val out = operators.Analytics.cmhTest(spark, sfTest).collect()
    assert(out.length == cells.size)
    for (r <- out) {
      val st = r.getAs[Number]("stratum").longValue
      val (a, b, c, d) = cells(st)
      assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
        r.getAs[Long]("d")) == ((a, b, c, d)))
      assert(math.abs(r.getAs[Double]("cmh_or") - sad / sbc) < 1e-3)
      assert(math.abs(r.getAs[Double]("cmh_chi2") -
        math.pow(math.abs(sa - se) - 0.5, 2) / sv) < 1e-3)
      if (b * c > 0)
        assert(math.abs(r.getAs[Double]("stratum_or") - a.toDouble * d / (b * c)) < 1e-3)
    }
  }

  test("mcnemar: planted one-sided flips yield 'shifted'; fixture cells replay") {
    val session = spark
    import session.implicits._
    import graft.operators.Analytics
    // 30 users heavy in H1 only (b = 30), none the other way (c = 0):
    // chi2 = (|30-0|-1)^2/30 = 28.03 >> 3.84
    val h1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val h2 = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val rows = (1 to 30).flatMap { u =>
      (1 to Analytics.McnemarMin).map(i =>
        (u.toLong * 100 + i, u.toLong, "purchase", 1.0, h1)) :+
        ((u.toLong * 100 + 99, u.toLong, "view", 1.0, h2))
    }
    val dir = java.nio.file.Files.createTempDirectory("mcnemar").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.mcnemar(session, dir).collect().head
    assert(r.getAs[Long]("n_h1_only") == 30 && r.getAs[Long]("n_h2_only") == 0)
    assert(math.abs(r.getAs[Double]("chi2") - 29.0 * 29.0 / 30.0) < 1e-6)
    assert(r.getAs[String]("verdict") == "shifted")
    // fixture: cells partition the user set and chi2 replays
    val f = Analytics.mcnemar(session, sfTest).collect().head
    val (np, b2, c2) = (f.getAs[Long]("n_pairs"),
      f.getAs[Long]("n_h1_only"), f.getAs[Long]("n_h2_only"))
    assert(f.getAs[Long]("n_both") + b2 + c2 + f.getAs[Long]("n_neither") == np)
    if (b2 + c2 > 0) {
      val num = math.max(math.abs(b2 - c2) - 1, 0L) // Edwards clamp at zero
      val want = (num * num).toDouble / (b2 + c2)
      assert(math.abs(f.getAs[Double]("chi2") - want) < 1e-6)
    }
  }

  test("paired t: planted uniform uplift yields 'shifted'; moments replay locally") {
    val session = spark
    import session.implicits._
    import graft.operators.Analytics
    val h1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val h2 = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    // every user spends 10.00 in H1 and 15.00 + small user jitter in H2
    val rows = (1 to 40).flatMap { u =>
      Seq((u.toLong * 10 + 1, u.toLong, "purchase", 10.0, h1),
          (u.toLong * 10 + 2, u.toLong, "purchase", 15.0 + (u % 3) * 0.5, h2))
    }
    val dir = java.nio.file.Files.createTempDirectory("pairedt").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.pairedT(session, dir).collect().head
    val ds = (1 to 40).map(u => (1500 + (u % 3) * 50 - 1000).toLong)
    val n = ds.size
    val mean = ds.sum.toDouble / n
    val varD = (ds.map(d => d.toDouble * d).sum - ds.sum.toDouble * ds.sum / n) / (n - 1)
    val t = mean / math.sqrt(varD / n)
    assert(r.getAs[Long]("n_pairs") == n && r.getAs[Long]("sum_d") == ds.sum)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3, s"$r vs $t")
    assert(r.getAs[String]("verdict") == "shifted")
    // zero-variance degenerate case → undefined, never a crash
    val flat = (1 to 5).flatMap { u =>
      Seq((u.toLong * 10 + 1, u.toLong, "purchase", 10.0, h1),
          (u.toLong * 10 + 2, u.toLong, "purchase", 10.0, h2))
    }
    val dir2 = java.nio.file.Files.createTempDirectory("pairedt0").toString
    flat.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val r2 = Analytics.pairedT(session, dir2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("t_stat")))
    assert(r2.getAs[String]("verdict") == "undefined")
  }
}
