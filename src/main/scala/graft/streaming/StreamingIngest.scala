package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{ensureRegistered, hdr_merge, hdr_sketch}
import graft.ingest.MetricBatchIngest
import graft.rollup.Rollup
import graft.sources.TierStore

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
  * All sinks — the streaming raw tiers and the cascade tier tables —
  * are `bucket_date`-partitioned parquet (the raw sinks via
  * `DataStreamWriter.partitionBy`, the cascade via [[TierStore]]), so
  * on a long-running deployment queries prune by date at the file
  * listing and retention ([[TierStore.enforceRetention]]) drops whole
  * day partitions, matching the reference's per-resolution range reads
  * with TTL'd storage (store/SummaryStore.scala:108-117,
  * reference.conf:22-47).
  *
  * Known delta vs the reference (documented in SURVEY §7.4): rows later
  * than the watermark are dropped; the reference silently stores them
  * in the raw tier but never rolls them up. Observable summaries match.
  */
class StreamingIngest(spark: SparkSession, baseDir: String,
                      watermark: String = "30 seconds") {

  ensureRegistered(spark)

  /** Cascade tier tables live in the [[TierStore]] layout:
    * `TierStore.path("tier", d)` == the historical `tier_<d>` dirs. */
  val store = new TierStore(spark, baseDir)

  def rawTierPath = s"$baseDir/tier_raw"
  def tierPath(d: Long) = store.path(StreamingIngest.HistKind, d)
  import StreamingIngest.{CounterKind, HistKind}
  private def cursorPath(kind: String, d: Long) = s"$baseDir/cursor_${kind}_$d"

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
    startTierSink(agg, trigger, s"$baseDir/_checkpoint_raw", rawTierPath)
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
    startTierSink(agg, trigger, s"$baseDir/_checkpoint_counter_raw", counterRawTierPath)
  }

  /** Date-partitioned streaming parquet sink (same layout TierStore
    * writes, so retention and pruned reads apply to live sinks too). */
  private def startTierSink(agg: DataFrame, trigger: Trigger,
                            checkpoint: String, path: String): StreamingQuery = {
    requirePartitionedLayout(path)
    agg
      .withColumn("bucket_date", TierStore.utcDate(col("bucket_start")))
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)
      .partitionBy("bucket_date")
      .start()
  }

  /** A raw sink dir written by a pre-partitioning version holds flat
    * parquet files tracked by the sink's `_spark_metadata` log; resuming
    * a partitioned writer on it would mix layouts in one log and break
    * every subsequent read (partition discovery sees conflicting
    * structures; old rows lack `bucket_date`). A streaming sink can't be
    * rewritten in place without checkpoint surgery, so refuse loudly. */
  private[graft] def requirePartitionedLayout(path: String): Unit = {
    val files = Option(new java.io.File(path).listFiles()).map(_.toSeq).getOrElse(Nil)
    val flat = files.exists(f => f.isFile && f.getName.endsWith(".parquet"))
    if (flat) throw new IllegalStateException(
      s"$path contains flat (unpartitioned) streaming sink output from an older " +
        "version; starting a date-partitioned writer on it would corrupt the sink. " +
        "Re-ingest into a fresh dir (with its checkpoint) or roll the old raw tier " +
        "forward with the cascade and retire the dir.")
  }

  def counterRawTierPath = s"$baseDir/counter_tier_raw"
  def counterTierPath(d: Long) = store.path(CounterKind, d)

  /** Counter cascade increment: counts just add. */
  def runCounterCascadeIncrement(tiers: Seq[Long] = Rollup.StandardTiers): Unit =
    cascade(CounterKind, counterRawTierPath, counterTierPath, tiers) { slice =>
      slice.agg(sum(col("count")).as("count"))
    }

  /** One incremental cascade pass: for each tier (smallest→largest),
    * roll fully-closed source buckets past the tier's cursor into the
    * tier table, then advance the cursor — the reference's
    * TimeWindowChain, as idempotent batch increments over parquet. */
  def runCascadeIncrement(tiers: Seq[Long] = Rollup.StandardTiers): Unit =
    cascade(HistKind, rawTierPath, tierPath, tiers) { slice =>
      slice.agg(hdr_merge(col("sketch")).as("sketch"))
    }

  private def cascade(kind: String, rawPath: String, tierOf: Long => String,
                      tiers: Seq[Long])
                     (agg: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): Unit = {
    var sourcePath = rawPath
    tiers.foreach { d =>
      val cursor = readCursor(kind, d)
      spark.catalog.refreshByPath(sourcePath)
      // a bucket of duration d is closed once the source tier holds
      // nothing before its end; process (cursor, maxClosed]
      val maxSource = spark.read.parquet(sourcePath)
        .agg(max(col("bucket_start"))).collect()(0)
      if (!maxSource.isNullAt(0)) {
        val closedUpTo = (maxSource.getLong(0) / d) * d - 1 // last fully closed bucket end
        if (closedUpTo > cursor) {
          val increment = agg(
            readSlice(sourcePath, cursor, closedUpTo)
              .groupBy(col("metric"),
                Rollup.bucketOf(col("bucket_start"), d).as("bucket_start")))
          store.append(kind, d, increment)
          writeCursor(kind, d, closedUpTo)
        }
      }
      sourcePath = tierOf(d)
    }
  }

  /** Incremental slice (fromExclusive, toInclusive] with the date
    * partition filter derived from the bounds, so a cascade pass over a
    * long-lived tier lists only the partitions near its cursor instead
    * of every file ever written. */
  private def readSlice(path: String, fromExclusive: Long, toInclusive: Long): DataFrame = {
    val upTo = spark.read.parquet(path)
      .where(col("bucket_date") <= lit(TierStore.utcDateOf(toInclusive)))
    // the first pass has cursor = Long.MinValue — no finite lower date
    val pruned =
      if (fromExclusive >= 0L)
        upTo.where(col("bucket_date") >= lit(TierStore.utcDateOf(fromExclusive)))
      else upTo
    pruned.where(col("bucket_start") > fromExclusive && col("bucket_start") <= toInclusive)
      .drop("bucket_date")
  }

  def tier(d: Long): DataFrame = store.readAll(HistKind, d)

  /** Pre-kind-namespace cursor files: histogram tiers wrote `cursor_$d`,
    * counter tiers disambiguated as `cursor_${d+1}` (tier durations are
    * round seconds, so d+1 never collides with another tier). */
  private def legacyCursorPath(kind: String, d: Long): String =
    if (kind == CounterKind) s"$baseDir/cursor_${d + 1}" else s"$baseDir/cursor_$d"

  /** Read the tier cursor; falls back to the legacy (un-namespaced) file
    * so an upgraded deployment resumes where it left off instead of
    * re-rolling the whole raw tier into existing tier tables (which
    * would silently double counts and sketches). The next write lands on
    * the new path; the legacy file is left behind, inert. */
  private[graft] def readCursor(kind: String, d: Long): Long = {
    def read(path: String): Option[Long] = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        Some(new String(java.nio.file.Files.readAllBytes(p)).trim.toLong)
      else None
    }
    read(cursorPath(kind, d))
      .orElse(read(legacyCursorPath(kind, d)))
      .getOrElse(Long.MinValue)
  }

  private def writeCursor(kind: String, d: Long, v: Long): Unit = {
    val p = java.nio.file.Paths.get(cursorPath(kind, d))
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, v.toString.getBytes)
  }
}

object StreamingIngest {
  /** TierStore `kind` names for the streaming cascade's tier tables
    * (chosen to match the pre-TierStore directory names, so existing
    * deployments keep their paths; cursors additionally fall back to
    * the legacy un-namespaced files — see `readCursor`). */
  val HistKind = "tier"
  val CounterKind = "counter_tier"
}
