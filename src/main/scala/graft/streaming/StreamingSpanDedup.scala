package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact-substring span dedup:
  * [[graft.ops.TextAnalysis.spanDedupIncremental]] as a continuous
  * pipeline. The persistent state is the gram-hash store — 8 B per
  * UNIQUE length-n gram ever observed, never the text — so the
  * per-batch cost is the batch's own gram build plus one hash
  * semi-join against the store. Each micro-batch:
  *
  *   1. every batch window with a store hit, or an earlier (id, pos)
  *      occurrence within the batch, is excised (keep-first across the
  *      whole stream history);
  *   2. excised rows (id, n_tokens, n_removed, text_dedup) land in
  *      `deduped/`;
  *   3. the batch's NOVEL gram hashes append to the store under this
  *      batch id.
  *
  * Failure semantics: at-least-once, with one twist the drop-shaped
  * twins don't need — excision REWRITES text, so a replayed batch must
  * see the store exactly as the original run did or its own
  * half-appended grams would excise the batch's first occurrences. The
  * store read therefore excludes rows tagged with the CURRENT batch
  * id: replays recompute bit-identical output rows (duplicated, never
  * corrupted), and re-appended grams land under the same batch id
  * (duplicate store rows are harmless to the semi-join).
  */
class StreamingSpanDedup(spark: SparkSession, baseDir: String, n: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text") {

  private val outDir = s"$baseDir/deduped"
  private val gramDir = s"$baseDir/grams"

  /** Path to the excised-corpus sink (parquet, appended per batch). */
  def dedupedPath: String = outDir

  /** Compact the gram store's per-batch slivers (maintenance-window
    * op — run between triggers or with the stream stopped). */
  def compactStore(maxFiles: Int = 8): Boolean =
    StoreCompaction.compactDir(spark, gramDir, maxFiles)

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // one row per id (the StreamingNearDup guard): excision output
        // is keyed by id, and a same-id duplicate would emit two rows
        val oneRn = org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // excision + gram append share one evaluation
        val seen =
          if (Files.exists(Paths.get(gramDir))) {
            s.catalog.refreshByPath(gramDir) // streaming sink listing is cached
            s.read.parquet(gramDir)
              .where(col("batch_id") =!= batchId) // replay isolation, see above
              .select("h")
          } else b.limit(0).select(xxhash64(col(textCol)).as("h"))
        TextAnalysis.spanDedupIncremental(b, seen, n, idCol, textCol)
          .write.mode("append").parquet(outDir)
        // output BEFORE state (the docs-before-store ordering all the
        // streaming twins share); novel hashes only keep the store
        // distinct across batches
        TextAnalysis.spanGramStore(b, n, textCol)
          .join(seen, Seq("h"), "left_anti")
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(gramDir)
        ()
      }
      .start()
}
