package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact dedup: the incremental-rebuild shape
  * ([[graft.ops.Dedup.exactIncremental]]) as a continuously-running
  * pipeline. Each micro-batch is deduped against the persistent digest
  * store AND within itself, survivors land in `kept/`, and their
  * digests are appended to the store — so a document ever seen (in any
  * earlier batch or earlier in this one) never reaches the kept corpus
  * again.
  *
  * Scale: state is the digest store — 32-byte sha2 digests, one per
  * distinct document, read as a parquet side input and anti-joined by
  * digest (the planner broadcasts while it's small, shuffles when it
  * isn't). Document text never enters the join. This is the same
  * cursor-style incremental pattern the tier cascade uses
  * ([[StreamingIngest]]): heavy state lives in partitioned tables, the
  * stream only carries the delta.
  *
  * Failure semantics: at-least-once. Kept docs are written BEFORE
  * their digests, so a crash between the writes re-emits (never loses)
  * documents on batch replay; duplicate digest rows in the store are
  * harmless to the anti-join. Exactly-once would need a transactional
  * table format, which this repo deliberately leaves to the deployment
  * (SURVEY §7.5).
  */
class StreamingDedup(spark: SparkSession, baseDir: String,
                     idCol: String = "doc_id", textCol: String = "text") {

  private val keptDir = s"$baseDir/kept"
  private val digestDir = s"$baseDir/digests"

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Path to the deduped corpus sink (parquet, appended per batch). */
  def keptPath: String = keptDir

  /** Compact the digest store's per-batch slivers (maintenance-window
    * op — run between triggers or with the stream stopped). */
  def compactStore(maxFiles: Int = 8): Boolean =
    StoreCompaction.compactDir(spark, digestDir, maxFiles)

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val withDigest = batch.select(
          col(idCol), col(textCol),
          sha2(Dedup.normText(col(textCol)), 256).as("digest"))
        val seen =
          if (Files.exists(Paths.get(digestDir))) {
            // a streaming-written parquet dir's file listing is cached
            // per path in the session — refresh or batches see a stale
            // digest snapshot and re-admit duplicates
            s.catalog.refreshByPath(digestDir)
            s.read.parquet(digestDir)
          } else s.emptyDataFrame.select(lit("").as("digest")).limit(0)
        val fresh = withDigest.join(seen, Seq("digest"), "left_anti")
        // within-batch winner: exactly ONE row per digest (a min-id
        // groupBy+join would keep BOTH copies of a verbatim-duplicated
        // row, since they share the min id); row_number with an
        // (id, text) order keeps the pick deterministic even then
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("digest").orderBy(col(idCol).asc, col(textCol).asc)
        val kept = fresh
          .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // both writes below reuse one evaluation
        kept.select(col(idCol), col(textCol))
          .write.mode("append").parquet(keptDir)
        kept.select("digest").write.mode("append").parquet(digestDir)
        ()
      }
      .start()
}
