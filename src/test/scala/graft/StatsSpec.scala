package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkFixture {

  test("every stats query runs non-empty on sf0.001") {
    operators.Stats.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfTest).count() > 0, s"$name returned 0 rows")
    }
  }

  test("pareto front: survivors are mutually non-dominated and every dropped point is dominated") {
    val pts = Tables.part(spark, sfTest)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
    val sky = operators.Stats.paretoFront(spark, sfTest).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSet
    def dominates(a: (Double, Int, Long), b: (Double, Int, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    // no survivor dominated by any point
    for (s <- sky; p <- pts) assert(!dominates(p, s), s"$p dominates survivor $s")
    // every dropped point dominated by some survivor
    for (p <- pts if !sky.contains(p))
      assert(sky.exists(s => dominates(s, p)), s"dropped $p has no dominator")
    // counts carried through intact
    for (s <- sky) assert(pts.contains(s))
  }

  test("equi-depth histogram: ntile sizes, ordered non-overlapping buckets, exact total") {
    val n = Tables.lineitem(spark, sfTest).count()
    val b = operators.Stats.HistBuckets
    val rows = operators.Stats.equidepthHist(spark, sfTest).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to b))
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.sum == n)
    // SQL ntile: first n%B buckets take the extra row
    val (q, rem) = (n / b, (n % b).toInt)
    assert(sizes.toSeq == (1 to b).map(i => if (i <= rem) q + 1 else q))
    // depth boundaries are value-ordered: bucket i's max <= bucket i+1's min
    val mins = rows.map(_.getAs[Double]("min_v"))
    val maxs = rows.map(_.getAs[Double]("max_v"))
    for (i <- 0 until b - 1) assert(maxs(i) <= mins(i + 1))
    for (i <- 0 until b) assert(mins(i) <= maxs(i))
  }

  test("equi-depth bucket of every value agrees with a literal global sort") {
    import spark.implicits._
    // small literal frame with heavy ties straddling bucket boundaries
    val vals = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0, 4.0, 5.0)
    val df = vals.toDF("l_extendedprice")
      .withColumn("l_orderkey", monotonically_increasing_id())
    df.createOrReplaceTempView("li_tmp")
    // expected from Spark's own ntile over a global sort
    val expected = spark.sql(
      s"""SELECT bucket, count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v
         |FROM (SELECT l_extendedprice AS v,
         |        ntile(${operators.Stats.HistBuckets}) OVER (ORDER BY l_extendedprice) AS bucket
         |      FROM li_tmp)
         |GROUP BY bucket ORDER BY bucket""".stripMargin).collect()
    // the operator's closed-form math on the same data, via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("statspec").toString
    df.select("l_extendedprice", "l_orderkey").write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = operators.Stats.equidepthHist(spark, dir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getAs[Long]("bucket") == e.getAs[Int]("bucket").toLong)
      assert(g.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"))
      assert(g.getAs[Double]("min_v") == e.getAs[Double]("min_v"))
      assert(g.getAs[Double]("max_v") == e.getAs[Double]("max_v"))
    }
  }

  test("dp counts: noise is finite, deterministic, and mean-centered") {
    val r1 = operators.Stats.dpCounts(spark, sfTest).collect()
    val r2 = operators.Stats.dpCounts(spark, sfTest).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq, "DP release must be replayable")
    val errs = r1.map(r => r.getAs[Double]("noisy_n") - r.getAs[Long]("n_events"))
    assert(errs.forall(e => !e.isNaN && !e.isInfinite))
    // Laplace(1) abs error: median ~ln(2); sanity-bound the spread
    assert(errs.map(math.abs).max < 25.0)
    assert(math.abs(errs.sum / errs.length) < 2.0)
  }

  test("sliding DAU matches the naive range-join on sf0.001") {
    import spark.implicits._
    val ud = Tables.events(spark, sfTest)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    ud.createOrReplaceTempView("ud_tmp")
    val naive = spark.sql(
      s"""SELECT w.day, count(DISTINCT u.user_id) AS users_7d
         |FROM (SELECT DISTINCT d AS day FROM ud_tmp) w
         |JOIN ud_tmp u ON u.d BETWEEN date_sub(w.day, ${operators.Stats.DauWindowDays - 1}) AND w.day
         |GROUP BY w.day ORDER BY w.day""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val got = operators.Stats.slidingDau(spark, sfTest).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // explode version also emits trailing days with no same-day events;
    // on every day both computed, the counts agree
    naive.foreach { case (day, n) =>
      assert(got.contains(day) && got(day) == n, s"mismatch on $day")
    }
  }

  test("skyline scale: 300k synthetic points match a local sweep; pruning bounds phase 2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random points: price from a hash, size in 1..40
    // => the true skyline has at most 40 points (one per size level)
    val n = 300000
    val pts = spark.range(n.toLong)
      .withColumn("h", expr("cast(conv(substring(md5(cast(id AS string)), 1, 8), 16, 10) AS bigint)"))
      .select((col("h") % 1000000 / 100.0).as("p_retailprice"),
              (col("h") % 41 + 1).cast("int").as("p_size"))
    val dir = java.nio.file.Files.createTempDirectory("skyscale").toString
    pts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val t0 = System.nanoTime()
    val got = operators.Stats.paretoFront(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    // local reference: sweep distinct points by (price asc, size desc)
    val distinctPts = pts.distinct().collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val sorted = distinctPts.sortBy { case (p, sz) => (p, -sz) }
    var best = Int.MinValue
    val ref = scala.collection.mutable.Set.empty[(Double, Int)]
    sorted.foreach { case (p, sz) => if (sz > best) { ref += ((p, sz)); best = sz } }
    assert(got == ref.toSet, s"skyline mismatch: got ${got.size}, ref ${ref.size}")
    assert(got.size <= 41, "skyline bounded by the size-level count")
    assert(secs < 30.0, f"two-phase skyline took $secs%.1f s on 300k points")
  }

  test("bootstrap CI: brackets the point estimate, replayable, Poisson weights mean ~1") {
    import org.apache.spark.sql.functions._
    val r1 = operators.Stats.bootstrapCi(spark, sfTest).collect().head
    val r2 = operators.Stats.bootstrapCi(spark, sfTest).collect().head
    assert(r1.toSeq == r2.toSeq, "hash-driven bootstrap must be replayable")
    val (lo, hi, mean) = (r1.getAs[Double]("ci_lo"), r1.getAs[Double]("ci_hi"),
      r1.getAs[Double]("mean_value"))
    assert(lo < hi)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket the point estimate $mean")
    assert(r1.getAs[Double]("se_boot") > 0)
    // the Poisson(1) weights should resample ~n rows per replica
    val cdf = operators.Stats.PoissonCdf
    val wExpr = cdf.zipWithIndex
      .foldRight("8") { case ((c, k), e) => s"CASE WHEN u < $c THEN $k ELSE $e END" }
    val meanW = Tables.events(spark, sfTest)
      .where(col("event_type") === "purchase")
      .select(col("event_id"))
      .withColumn("b", explode(expr(s"sequence(1, ${operators.Stats.BootB})")))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat_ws(':', cast(event_id AS string), cast(b AS string), 'boot')), 1, 8), 16, 10) AS bigint)"))
      .withColumn("u", (col("h") + 0.5) / 4294967296.0)
      .withColumn("w", expr(wExpr))
      .agg(avg("w")).head.getDouble(0)
    assert(math.abs(meanW - 1.0) < 0.05, s"Poisson(1) weight mean was $meanW")
  }
}
