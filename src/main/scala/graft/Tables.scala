package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and filter pushdown; callers should select/filter as early as
  * possible and let the scan prune.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  /** events.parquet has carried three physical ts encodings across
    * driver generations — INT64 TIMESTAMP(NANOS) (readable only with
    * spark.sql.legacy.parquet.nanosAsLong=true, set in all our session
    * builders), tz-adjusted TIMESTAMP(MICROS), and tz-NAIVE
    * TIMESTAMP(MICROS) (which Spark 4 infers as TIMESTAMP_NTZ). All
    * three normalize to the same two columns:
    *   ts    — TimestampType (microsecond; ns floor-truncated; naive
    *           values pinned to the session's UTC zone, which is how
    *           every tz-adjusted generation read back anyway)
    *   ts_ms — epoch millis Long (the engine's native time unit,
    *           matching the reference's epoch-ms model)
    * Integer `DIV` keeps the arithmetic exact (double math would lose
    * precision on ~1.7e18 nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw0 = load(spark, dir, "events")
    val raw =
      if (raw0.schema("ts").dataType == TimestampNTZType)
        raw0.withColumn("ts", col("ts").cast(TimestampType))
      else raw0
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts_ms", expr("ts DIV 1000000"))
         .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else
      raw.withColumn("ts_ms", expr("CAST(unix_micros(ts) DIV 1000 AS LONG)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
