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
  import StreamingIngest.{CounterKind, HistKind, SchemaSidecar}
  private def cursorPath(kind: String, d: Long) = s"$baseDir/cursor_${kind}_$d"

  /** JSON-lines file stream → parsed measurements stream.
    *
    * Admission is BYTES-based by default (r14, the §H burst fix): a
    * static `maxFilesPerTrigger` gates a many-small-files burst by
    * FILE COUNT — §H measured an instantaneous 800-file burst paying
    * ⌈800/64⌉ = 13 triggers of admission alone (92.4 s freshness
    * against a 30 s-class envelope) even though the files held only a
    * few MB. Bytes admission sizes each micro-batch by the work it
    * actually carries: a burst of small files lands in one trigger, a
    * flood of big ones is still bounded at `maxBytesPerTrigger` per
    * batch — which is also the right knob at 100 TB, where file sizes
    * vary by orders of magnitude across producers. Pass
    * `maxFilesPerTrigger = Some(n)` to restore count-based admission
    * (the two knobs are mutually exclusive in the Spark file source,
    * so setting both refuses loudly). */
  def readJsonStream(inputDir: String,
                     defaultTs: () => Long = () => System.currentTimeMillis(),
                     maxBytesPerTrigger: Option[Long] = Some(64L << 20),
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    require(maxBytesPerTrigger.isEmpty || maxFilesPerTrigger.isEmpty,
      "maxBytesPerTrigger and maxFilesPerTrigger are mutually exclusive " +
        "(Spark file-source admission takes one limit)")
    val reader = spark.readStream.format("text")
    maxBytesPerTrigger.foreach(b => reader.option("maxBytesPerTrigger", b.toString))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    MetricBatchIngest.parse(reader.load(inputDir), "value", defaultTs)
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
    val partitioned = agg
      .withColumn("bucket_date", TierStore.utcDate(col("bucket_start")))
    writeSchemaSidecar(path, partitioned.schema)
    partitioned
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
      // nothing before its end; process (cursor, maxClosed]. The probe
      // is cursor-date-pruned like the increment read: on a long-lived
      // tier it lists only partitions near the cursor, and partitions
      // older than the cursor day may legitimately no longer exist
      // (enforceRawRetention)
      val maxSource = readSliceFrom(sourcePath, cursor)
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
  private def readSlice(path: String, fromExclusive: Long, toInclusive: Long): DataFrame =
    readSliceFrom(path, fromExclusive)
      .where(col("bucket_date") <= lit(TierStore.utcDateOf(toInclusive)))
      .where(col("bucket_start") <= toInclusive)
      .drop("bucket_date")

  /** Lower-bounded slice, `bucket_date` retained for further pruning.
    * The first pass has cursor = Long.MinValue — no finite lower date. */
  private def readSliceFrom(path: String, fromExclusive: Long): DataFrame = {
    val all = readWithSidecarSchema(path)
    val pruned =
      if (fromExclusive >= 0L)
        all.where(col("bucket_date") >= lit(TierStore.utcDateOf(fromExclusive)))
      else all
    pruned.where(col("bucket_start") > fromExclusive)
  }

  /** A streaming sink's file listing comes from its `_spark_metadata`
    * log, which keeps naming partitions that [[enforceRawRetention]]
    * has dropped. Date pruning excludes those paths from the scan, but
    * parquet SCHEMA INFERENCE runs before any filter and may open a
    * deleted file — so every sink records its schema in a sidecar at
    * start, and reads supply it explicitly, skipping inference. */
  private def writeSchemaSidecar(path: String,
                                 schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = new java.io.File(path, SchemaSidecar)
    if (!f.exists()) {
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, schema.json.getBytes)
    }
  }

  private def readWithSidecarSchema(path: String): DataFrame = {
    val f = new java.io.File(path, SchemaSidecar)
    if (f.exists()) {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(new String(java.nio.file.Files.readAllBytes(f.toPath)))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.read.schema(schema).parquet(path)
    } else spark.read.parquet(path)
  }

  def tier(d: Long): DataFrame = store.readAll(HistKind, d)

  /** Retention for the RAW streaming sinks (reference TTLs raw buckets
    * at hours, not days — reference.conf:22-47): drops whole
    * `bucket_date` partition dirs that are BOTH past the ttl and
    * strictly older than the first tier's cursor day. The cursor bound
    * makes the drop safe-by-construction: only the first tier ever
    * reads a raw sink, and every one of its reads — probe and
    * increment — prunes to `bucket_date >= day(cursor)` before any file
    * is opened, so a dropped partition is unreachable even through the
    * sink's `_spark_metadata` listing. Data not yet rolled up is never
    * dropped, whatever the ttl says. Returns dropped dirs per kind. */
  def enforceRawRetention(ttlMs: Long,
                          nowMs: Long = System.currentTimeMillis(),
                          firstTier: Long = Rollup.StandardTiers.head): Map[String, Seq[String]] = {
    def dropFor(kind: String, rawDir: String): Seq[String] = {
      val cursor = readCursor(kind, firstTier)
      if (cursor == Long.MinValue) return Nil // nothing rolled up yet
      val cursorDay = TierStore.utcDateOf(cursor).toLocalDate
      val ttlDay = java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochMilli(nowMs - ttlMs), java.time.ZoneOffset.UTC)
      val cutoff = if (cursorDay.isBefore(ttlDay)) cursorDay else ttlDay
      val dropped = TierStore.dropPartitionsBefore(new java.io.File(rawDir), cutoff)
      if (dropped.nonEmpty) spark.catalog.refreshByPath(rawDir)
      dropped
    }
    Map(HistKind -> dropFor(HistKind, rawTierPath),
      CounterKind -> dropFor(CounterKind, counterRawTierPath))
  }

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

  /** Underscore prefix keeps it out of parquet file listings. */
  val SchemaSidecar = "_graft_schema.json"
}
