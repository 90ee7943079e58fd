package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics coverage for the TextRank keyword tier beyond the oracle
  * hash-match: graph boundedness and the centrality property on a
  * planted corpus (a hub word co-occurring with everything must
  * out-rank peripheral words that only the hub touches).
  */
class TextRankSpec extends AnyFunSuite with SparkFixture {

  test("word graph is vocabulary-bounded") {
    val ew = TextAnalysis.textrankEw(spark, sfTest)
    val nodes = ew.select("src").distinct().count()
    assert(nodes > 0 && nodes <= TextAnalysis.TrVocab)
    // mirrored edges: every (src,dst) has its (dst,src) twin with equal weight
    val asym = ew.select("src", "dst", "w").as("f")
      .join(ew.select(col("dst").as("src"), col("src").as("dst"), col("w").as("w2")).as("r"),
        Seq("src", "dst"), "left")
      .where(col("w2").isNull || col("w") =!= col("w2"))
      .count()
    assert(asym == 0)
  }

  test("fixture keywords are deterministic, distinct, rank-ordered") {
    val rows = TextAnalysis.textrankKeywords(spark, sfTest).collect()
    assert(rows.length == TextAnalysis.TrTop)
    assert(rows.map(_.getAs[String]("word")).distinct.length == rows.length)
    val units = rows.map(_.getAs[Long]("rank_units"))
    assert(units.zip(units.tail).forall { case (a, b) => a >= b })
    // stopwords and short tokens can never be keywords
    val words = rows.map(_.getAs[String]("word"))
    assert(words.forall(w => w.length >= TextAnalysis.TrMinLen))
    assert(words.forall(w => !TextAnalysis.Stopwords.contains(w)))
  }

  test("planted hub word out-ranks peripheral words") {
    val session = spark
    import session.implicits._
    // every sentence pairs the hub with one distinct peripheral word:
    // hub degree = n, peripheral degree = 1
    val docs = (1 to 12).map(i => (i.toLong, s"central word$i"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("trank").toString
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    graft.QueryCache.invalidate(session) // planted dir, not the memoized fixture
    val ranked = TextAnalysis.textrankKeywords(session, out)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("rank_units"))
    graft.QueryCache.invalidate(session)
    val hub = ranked.find(_._1 == "central").map(_._2)
    assert(hub.isDefined, s"hub missing from $ranked")
    val peripherals = ranked.filter(_._1 != "central").map(_._2)
    assert(peripherals.nonEmpty && peripherals.forall(_ < hub.get), s"$ranked")
  }
}
