package graft

import org.apache.spark.sql.SparkSession

/** Standard session settings for the engine. Mirrors what a cluster
  * deployment would set via spark-defaults; local[N] here stands in for
  * N executor cores.
  */
object GraftSession {
  def builder(cores: Int = 32, shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores INT64 TIMESTAMP(NANOS); Spark reads it as
      // Long only with this flag (Tables.events normalizes back).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
