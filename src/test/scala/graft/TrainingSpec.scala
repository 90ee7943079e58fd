package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingSpec extends AnyFunSuite with SparkFixture {

  test("every training query runs non-empty on sf0.001") {
    operators.Training.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfTest).count() > 0, s"$name returned 0 rows")
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
}
