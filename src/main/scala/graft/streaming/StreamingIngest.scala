package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{ensureRegistered, hdr_merge, hdr_sketch}
import graft.ingest.MetricBatchIngest
import graft.rollup.Rollup

/** Streaming ingest + incremental rollup cascade on Structured
  * Streaming, mirroring the reference's tick pipeline (SURVEY §2.9):
  *
  *  - tick cadence   ≙ trigger interval (default 30 s)
  *  - tick-delay ×30s late-data grace ≙ `withWatermark(ts, 30 s)`
  *  - 5 s raw pre-aggregation groups ≙ streaming window("5 seconds")
  *    with the hdr_sketch aggregate (reference:
  *    store/MetricMeasurementStore.scala:24-25)
  *  - higher tiers: incremental batch jobs over the raw tier with a
  *    per-tier closed-bucket cursor (reference cursor semantics:
  *    model/TimeWindow.scala:40-65) — chaining streaming aggs directly
  *    is restricted in Spark, and the cursor design is what the
  *    reference does anyway.
  *
  * Known delta vs the reference (documented in SURVEY §7.4): rows later
  * than the watermark are dropped; the reference silently stores them
  * in the raw tier but never rolls them up. Observable summaries match.
  */
class StreamingIngest(spark: SparkSession, baseDir: String,
                      watermark: String = "30 seconds") {

  ensureRegistered(spark)

  def rawTierPath = s"$baseDir/tier_raw"
  def tierPath(d: Long) = s"$baseDir/tier_$d"
  private def cursorPath(d: Long) = s"$baseDir/cursor_$d"

  /** JSON-lines file stream → parsed measurements stream. */
  def readJsonStream(inputDir: String,
                     defaultTs: () => Long = () => System.currentTimeMillis()): DataFrame = {
    val lines = spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", "64")
      .load(inputDir)
    MetricBatchIngest.parse(lines, "value", defaultTs)
  }

  /** Measurements stream → watermarked 5 s sketch aggregation → raw
    * tier appends. Append output mode: a 5 s bucket is emitted exactly
    * once, when the watermark passes it — the reference's
    * "bucket closed" condition. */
  def startRawTier(measurements: DataFrame,
                   trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val withTs = measurements
      .where(col("mtype") === "timer" || col("mtype") === "gauge")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
    val agg = withTs
      .groupBy(col("metric"), window(col("ts"), "5 seconds"))
      .agg(hdr_sketch(col("value")).as("sketch"))
      .select(col("metric"),
        unix_millis(col("window.start")).as("bucket_start"), col("sketch"))
    agg.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$baseDir/_checkpoint_raw")
      .format("parquet")
      .option("path", rawTierPath)
      .start()
  }

  /** Counter path: counts per 5 s bucket (reference:
    * model/CounterBucket.scala — the measured value IS the increment). */
  def startCounterTier(measurements: DataFrame,
                       trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val withTs = measurements
      .where(col("mtype") === "counter")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
    val agg = withTs
      .groupBy(col("metric"), window(col("ts"), "5 seconds"))
      .agg(sum(col("value")).as("count"))
      .select(col("metric"),
        unix_millis(col("window.start")).as("bucket_start"), col("count"))
    agg.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$baseDir/_checkpoint_counter_raw")
      .format("parquet")
      .option("path", counterRawTierPath)
      .start()
  }

  def counterRawTierPath = s"$baseDir/counter_tier_raw"
  def counterTierPath(d: Long) = s"$baseDir/counter_tier_$d"

  /** Counter cascade increment: counts just add. */
  def runCounterCascadeIncrement(tiers: Seq[Long] = Rollup.StandardTiers): Unit = {
    var sourcePath = counterRawTierPath
    tiers.foreach { d =>
      val cursorKey = d + 1 // distinct cursor namespace from histogram tiers
      val cursor = readCursor(cursorKey)
      val source = spark.read.parquet(sourcePath)
      val maxSource = source.agg(max(col("bucket_start"))).collect()(0)
      if (!maxSource.isNullAt(0)) {
        val closedUpTo = (maxSource.getLong(0) / d) * d - 1
        if (closedUpTo > cursor) {
          source.where(col("bucket_start") > cursor && col("bucket_start") <= closedUpTo)
            .groupBy(col("metric"), Rollup.bucketOf(col("bucket_start"), d).as("bucket_start"))
            .agg(sum(col("count")).as("count"))
            .write.mode("append").parquet(counterTierPath(d))
          writeCursor(cursorKey, closedUpTo)
        }
      }
      sourcePath = counterTierPath(d)
    }
  }

  /** One incremental cascade pass: for each tier (smallest→largest),
    * roll fully-closed source buckets past the tier's cursor into the
    * tier table, then advance the cursor — the reference's
    * TimeWindowChain, as idempotent batch increments over parquet. */
  def runCascadeIncrement(tiers: Seq[Long] = Rollup.StandardTiers): Unit = {
    var sourcePath = rawTierPath
    tiers.foreach { d =>
      val cursor = readCursor(d)
      val source = spark.read.parquet(sourcePath)
      // a bucket of duration d is closed once the source tier holds
      // nothing before its end; process (cursor, maxClosed]
      val maxSource = source.agg(max(col("bucket_start"))).collect()(0)
      if (!maxSource.isNullAt(0)) {
        val closedUpTo = (maxSource.getLong(0) / d) * d - 1 // last fully closed bucket end
        if (closedUpTo > cursor) {
          val increment = source
            .where(col("bucket_start") > cursor && col("bucket_start") <= closedUpTo)
            .groupBy(col("metric"),
              Rollup.bucketOf(col("bucket_start"), d).as("bucket_start"))
            .agg(hdr_merge(col("sketch")).as("sketch"))
          increment.write.mode("append").parquet(tierPath(d))
          writeCursor(d, closedUpTo)
        }
      }
      sourcePath = tierPath(d)
    }
  }

  def tier(d: Long): DataFrame = spark.read.parquet(tierPath(d))

  private def readCursor(d: Long): Long = {
    val p = java.nio.file.Paths.get(cursorPath(d))
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p)).trim.toLong
    else Long.MinValue
  }

  private def writeCursor(d: Long, v: Long): Unit = {
    val p = java.nio.file.Paths.get(cursorPath(d))
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, v.toString.getBytes)
  }
}
