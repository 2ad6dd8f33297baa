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
      // hdr_sketch/hdr_merge run as ObjectHashAggregate; the default
      // 128-group fallback to sort-based aggregation cripples the
      // rollup cascade (one sketch per metric×bucket = many small
      // groups, each buffer only a few hundred bytes)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // cached tier frames carry binary sketch blobs; trying column
      // compression schemes on them dominates cache build time
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
