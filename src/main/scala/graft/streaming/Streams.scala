package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

object Streams {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracleSql: Map[String, String] = Map()
}
