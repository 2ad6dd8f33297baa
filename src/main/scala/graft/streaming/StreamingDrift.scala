package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.TextAnalysis
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-drift monitor: every micro-batch is scored with
  * [[TextAnalysis.tokenDrift]] against a PINNED reference
  * token-distribution snapshot, and the one-row report lands in an
  * append-only drift log — the alarm feed an operator charts to catch
  * the crawl going off-distribution (new language → oov_e6 spikes;
  * same-vocab style shift → drift_e6 moves; both 0 → healthy).
  *
  * The reference is published explicitly ([[publishReference]], atomic
  * three-name swap like every twin store) and NOT updated by the
  * stream — drift is measured against a fixed yardstick; re-publishing
  * after an intentional distribution change is the operator's call.
  *
  * Failure semantics: at-least-once appends. A replayed batch writes
  * its report twice with the same batch_id; [[driftLog]] dedups by
  * batch_id (reports are deterministic per batch, so any copy is the
  * right one). State = the vocabulary-sized reference + one tiny row
  * per batch, however long the stream runs.
  */
class StreamingDrift(spark: SparkSession, baseDir: String,
                     idCol: String = "doc_id", textCol: String = "text") {

  private val refDir = new File(s"$baseDir/ref")
  private val refTmp = new File(s"$baseDir/ref__tmp")
  private val refOld = new File(s"$baseDir/ref__old")
  private val logDir = s"$baseDir/log"

  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Publish `docs`' token counts as the reference snapshot (atomic
    * swap; a running stream scores subsequent batches against it). */
  def publishReference(docs: DataFrame): Unit = storeLock.synchronized {
    TextAnalysis.tokenCounts(docs, textCol)
      .coalesce(1).write.mode("overwrite").parquet(refTmp.toString)
    if (refDir.exists()) TierStore.swapInto(refDir, refTmp, refOld)
    else {
      Files.createDirectories(Paths.get(baseDir))
      require(refTmp.renameTo(refDir), s"could not publish $refTmp")
    }
  }

  /** Current reference (token, cnt); empty before the first publish.
    * Snapshotted INSIDE the lock by an eager `localCheckpoint`: the
    * blocks materialize distributed (the reference is VOCAB-sized —
    * tens of millions of tokens at design scale, far too large for the
    * driver round-trip the |domains|-row twins use) and the truncated
    * lineage means no consumer re-reads the path after the lock is
    * released, so a concurrent [[publishReference]] swap cannot race
    * the scoring join. */
  def reference(s: SparkSession = spark): DataFrame = storeLock.synchronized {
    TierStore.recoverSwap(refDir, refOld)
    TierStore.deleteTree(refOld)
    TierStore.deleteTree(refTmp)
    if (!refDir.exists())
      return s.range(0).select(col("id").cast("string").as("token"),
        col("id").as("cnt")).limit(0)
    s.catalog.refreshByPath(refDir.toString)
    s.read.parquet(refDir.toString).localCheckpoint(eager = true)
  }

  /** The drift log, one row per processed batch (batch_id, n_tokens,
    * n_in_vocab, drift_e6, oov_e6), replay-deduped, batch order. */
  def driftLog(s: SparkSession = spark): DataFrame = {
    if (!new File(logDir).exists())
      return s.range(0).select(col("id").as("batch_id"), col("id").as("n_tokens"),
        col("id").as("n_in_vocab"), col("id").as("drift_e6"), col("id").as("oov_e6"))
        .limit(0)
    s.catalog.refreshByPath(logDir)
    s.read.parquet(logDir)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("batch_id").orderBy(col("n_tokens").desc)))
      .where(col("__rn") === 1)
      .select("batch_id", "n_tokens", "n_in_vocab", "drift_e6", "oov_e6")
      .orderBy("batch_id")
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // one row per id (the shared twin guard against duplicated lines)
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
        storeLock.synchronized {
          TextAnalysis.tokenDrift(b, reference(s), textCol)
            .withColumn("batch_id", lit(batchId))
            .coalesce(1).write.mode("append").parquet(logDir)
        }
        ()
      }
      .start()
}
