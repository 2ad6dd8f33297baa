package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.TextAnalysis
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming count-min sketch: the [[TextAnalysis.cmsSketch]] cell
  * frame maintained as running state across micro-batches. CMS cells
  * are plain counters, so the cross-batch merge is exactly the batch
  * operator's shard merge — union + groupBy (r, b) sum — and the state
  * is ≤ depth·width rows (bytes, not data) however long the stream
  * runs. Commits use the crash-safe three-name swap, same recovery
  * discipline as [[StreamingTopK]].
  *
  * Failure semantics: at-least-once. A replayed batch adds its counts
  * twice; estimates only ever move UP, so the CMS guarantee that
  * matters (est ≥ true count, never an undercount) survives replays —
  * the overcount bound degrades by the replayed volume, exactly like a
  * duplicated shard in the batch merge.
  *
  * [[estimates]] answers point queries from the persisted cells with
  * the same salted hash family as the build ([[TextAnalysis.cmsTokenBuckets]]),
  * so a token's estimate is min over its `depth` cells; tokens whose
  * cells were never touched report 0.
  */
class StreamingCms(spark: SparkSession, baseDir: String,
                   depth: Int = 4, width: Long = 1024L,
                   idCol: String = "doc_id", textCol: String = "text") {
  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 1, s"width must be positive, got $width")

  private val storeDir = new File(s"$baseDir/cells")
  private val tmpDir = new File(s"$baseDir/cells__tmp")
  private val oldDir = new File(s"$baseDir/cells__old")

  // serializes reads against the mid-swap window (see StreamingTopK)
  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Current cell frame (r, b, cnt); empty before the first batch.
    * Snapshotted by COLLECTING inside the lock (bounded by the sketch:
    * ≤ depth·width touched cells): a lazy scan would read the store
    * path after the lock is released, racing the per-batch three-name
    * swap — the transient-FileNotFound window the lock exists to
    * close (the [[StreamingDomainReweight.currentWeights]] rule). */
  def cells(s: SparkSession = spark): DataFrame = storeLock.synchronized {
    TierStore.recoverSwap(storeDir, oldDir)
    TierStore.deleteTree(oldDir)
    TierStore.deleteTree(tmpDir)
    if (!storeDir.exists())
      return s.range(0).select(col("id").cast("int").as("r"),
        col("id").as("b"), col("id").as("cnt")).limit(0)
    s.catalog.refreshByPath(storeDir.toString)
    val snap = s.read.parquet(storeDir.toString)
    s.createDataFrame(java.util.Arrays.asList(snap.collect(): _*), snap.schema)
  }

  /** Point estimates for `probes` from the persisted cells: min over
    * each token's `depth` cells, 0 for never-touched cells. */
  def estimates(probes: Seq[String], s: SparkSession = spark): Map[String, Long] = {
    import s.implicits._
    if (probes.isEmpty) return Map.empty
    val pb = TextAnalysis.cmsTokenBuckets(probes.toDF("token"), depth, width)
    pb.join(cells(s), Seq("r", "b"), "left")
      .groupBy("token").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // one row per id (the shared twin guard against duplicated lines)
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
        val batchCells = TextAnalysis.cmsSketch(b, depth, width, textCol)
        storeLock.synchronized {
          val merged = cells(s).unionByName(batchCells)
            .groupBy("r", "b").agg(sum("cnt").as("cnt"))
          merged.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
          if (storeDir.exists()) TierStore.swapInto(storeDir, tmpDir, oldDir)
          else {
            Files.createDirectories(Paths.get(baseDir))
            require(tmpDir.renameTo(storeDir), s"could not publish $tmpDir")
          }
        }
        ()
      }
      .start()
}
