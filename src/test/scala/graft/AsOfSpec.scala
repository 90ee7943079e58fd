package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the composed as-of join (union + window): exact
  * matches on hand-computed fixtures, inclusive-boundary semantics,
  * left rows with no match, and the tolerance (max age) variant.
  */
class AsOfSpec extends AnyFunSuite with SparkFixture {

  private def fixtures = {
    val session = spark
    import session.implicits._
    val left = Seq(
      (1L, 100L, 10L), // key 1, t=100
      (1L, 205L, 11L),
      (1L, 300L, 12L),
      (2L, 50L, 20L),  // key 2 has no right row before t=50
      (2L, 400L, 21L),
      (3L, 999L, 30L)  // key 3 has no right rows at all
    ).toDF("k", "t", "left_id")
    val right = Seq(
      (1L, 100L, 900L), // equal timestamp: must match (inclusive)
      (1L, 200L, 901L),
      (1L, 250L, 902L),
      (2L, 60L, 903L),
      (2L, 399L, 904L)
    ).toDF("k", "rt", "version")
    (left, right)
  }

  test("as-of picks the latest right row at or before each left time") {
    val (left, right) = fixtures
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "rt")
      .select("left_id", "version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      10L -> 900L, // t=100 matches rt=100 (inclusive boundary)
      11L -> 901L, // t=205 -> rt=200 (not 250)
      12L -> 902L, // t=300 -> rt=250
      20L -> -1L,  // t=50 precedes every right row for key 2
      21L -> 904L, // t=400 -> rt=399
      30L -> -1L   // key without right rows
    ))
  }

  test("tolerance nulls out matches older than the horizon") {
    val (left, right) = fixtures
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "rt", toleranceUs = Some(10L))
      .select("left_id", "version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // only matches within 10 ticks survive: 100-100=0, 205-200=5, 400-399=1
    assert(out == Map(10L -> 900L, 11L -> 901L, 12L -> -1L,
                      20L -> -1L, 21L -> 904L, 30L -> -1L))
  }

  test("as-of output keeps exactly the left row count") {
    val (left, right) = fixtures
    assert(AsOf.asofJoin(left, right, "k", "k", "t", "rt").count() == left.count())
  }

  test("flagship asof query matches the window-based reference on sf0.001") {
    val out = AsOf.asofEventOrder(spark, sfTest).cache()
    assert(out.count() > 0)
    // reference: per event, the max (o_us, orderkey) at or before e_us,
    // computed the quadratic way on the small fixture
    val e = Tables.events(spark, sfTest).where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("e_us"))
    val o = Tables.orders(spark, sfTest)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
    val ref = e.join(o, e("user_id") === o("o_custkey") && o("o_us") <= e("e_us"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("o_us").desc_nulls_last, col("o_orderkey").desc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey").as("ref_orderkey"))
    val diff = out.join(ref, "event_id")
      .where(coalesce(col("o_orderkey"), lit(-1L)) =!= coalesce(col("ref_orderkey"), lit(-1L)))
      .count()
    assert(diff == 0)
  }

  test("SCD2 history: gapless intervals, one current version, no no-op versions, one shuffle") {
    val hist = operators.AsOf.scd2History(spark, sfTest)
    // all three window steps must ride ONE custkey shuffle: a single
    // Exchange in the whole plan (plus the presentation sort's)
    val plan = hist.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"SCD2 must reuse one custkey partitioning, saw $exchanges:\n${plan.take(800)}")
    val rows = hist.collect().map(r => (r.getAs[Long]("custkey"), r.getAs[Int]("version"),
      r.getAs[String]("priority"), r.getAs[String]("valid_from"),
      r.getAs[String]("valid_to"), r.getAs[Long]("is_current")))
    rows.groupBy(_._1).foreach { case (ck, vs) =>
      val s = vs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length), s"cust $ck versions not dense")
      // intervals chain: valid_to of k == valid_from of k+1; only the last is open
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"cust $ck gap between v${a._2} and v${b._2}")
          assert(a._3 != b._3, s"cust $ck no-op version survived compression")
        case _ =>
      }
      assert(s.count(_._6 == 1L) == 1 && s.last._6 == 1L && s.last._5 == null,
        s"cust $ck must have exactly one open current version")
    }
  }

  test("forward as-of: literal frame picks the earliest future row, inclusive, with tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 10L, "at"), (100L, 20L, "next"), (100L, 5L, "past"),
                    (200L, 40L, "earlier"))
      .toDF("rk", "rt", "v")
    val fwd = operators.AsOf.asofJoin(left, right, "k", "rk", "t", "rt",
        direction = "forward")
      .select(col("id"), col("v")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1: equal-time row matches (inclusive); id 2: t=25 has no future row -> null
    // id 3: t=50, only right row is at 40 (past) -> null
    assert(fwd(1L) == "at")
    assert(fwd(2L) == null)
    assert(fwd(3L) == null)
    // tolerance: id 1 matched at distance 0; widen left times to check nulling
    val tol = operators.AsOf.asofJoin(
        Seq((9L, 100L, 1L)).toDF("id", "k", "t"), right, "k", "rk", "t", "rt",
        toleranceUs = Some(3L), direction = "forward")
      .select(col("id"), col("v")).collect()
    assert(tol.head.getString(1) == null, "nearest future row at distance 4 must fall outside tolerance 3")
  }
}
