package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark only
    * reads with spark.sql.legacy.parquet.nanosAsLong=true (set in all
    * our session builders). Normalizes to:
    *   ts    — TimestampType (microsecond, ns floor-truncated)
    *   ts_ms — epoch millis Long (the engine's native time unit,
    *           matching the reference's epoch-ms model)
    * Integer `DIV` keeps the arithmetic exact (double math would lose
    * precision on ~1.7e18 nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts_ms", expr("ts DIV 1000000"))
         .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else
      raw.withColumn("ts_ms", expr("CAST(unix_micros(ts) DIV 1000 AS LONG)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
