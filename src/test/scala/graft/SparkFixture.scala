package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for ScalaTest suites — mirrors the
  * Verify/Bench harness configs (UTC, nanos-as-long, small shuffle).
  */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkFixture.session

  val sfTest = "/root/testdata/sf0.001"

  override def afterAll(): Unit = super.afterAll()
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the broadcast policy (SCALING.md) leans on AQE picking up
      // unhinted small sides from runtime stats: pin it on explicitly
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // keep TypedImperativeAggregates hash-based (see Verify.scala)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // Hive-backed catalog (SURVEY §2.1 S4): embedded Derby metastore
      // + warehouse under target/ so persistent-table semantics (the
      // reference family's Hive warehouse source/sink) run in tests.
      // Catalog choice is a static conf, so it lives on the ONE shared
      // session; temp-view-based suites are unaffected.
      .config("spark.sql.warehouse.dir", "target/hive-warehouse")
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=target/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
