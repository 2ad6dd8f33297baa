package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.{Dedup, TextAnalysis}
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming heavy hitters: the Misra–Gries summary maintained as
  * running state across micro-batches. Each trigger folds the batch's
  * token stream with the same one-pass, shuffle-free distributed fold
  * the batch operator uses ([[TextAnalysis.heavyHitters]]), merges the
  * result into the persisted summary — MG merges preserve the
  * `error ≤ n/(capacity+1)` bound over the full history (Agarwal et
  * al., PODS '12) — and commits with the crash-safe three-name swap
  * ([[TierStore.swapInto]]).
  *
  * Scale: state is ≤ capacity (token, est) rows plus one running
  * total — bytes, not data, regardless of how long the stream runs.
  * The batch never shuffles; the driver merges two ≤ capacity maps.
  * Contrast with a streaming groupBy-count, whose state grows with
  * the vocabulary.
  *
  * Failure semantics: at-least-once. A replayed batch merges twice,
  * inflating est AND the recorded n together, so the summary remains
  * a valid MG summary of the replayed multiset — every invariant the
  * bound promises still holds w.r.t. the n the store reports.
  */
class StreamingTopK(spark: SparkSession, baseDir: String,
                    capacity: Int = 64, textCol: String = "text") {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private val storeDir = new File(s"$baseDir/summary")
  private val tmpDir = new File(s"$baseDir/summary__tmp")
  private val oldDir = new File(s"$baseDir/summary__old")

  /** Guards the store against a reader's recoverSwap racing the batch
    * thread mid-swap (dst renamed aside, tmp not yet in place — the
    * window where recovery would "restore" the old dir and fail the
    * writer's rename). summary() is documented for use WHILE the
    * stream runs, so reads and commits serialize here; monitors are
    * reentrant, so the batch path's own summary() call is fine. */
  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"doc_id LONG, $textCol STRING").json(dir)

  /** Current state: the ≤ capacity (token, est) summary and the total
    * token count n it is guaranteed against. (Nil, 0) before the first
    * batch. Every row carries n, and a null-token sentinel row keeps n
    * recoverable even when the summary itself is empty (possible: at
    * capacity 1, a stream `a b` decrements `a` away and never admits
    * `b`). */
  def summary(s: SparkSession = spark): (Seq[(String, Long)], Long) = storeLock.synchronized {
    TierStore.recoverSwap(storeDir, oldDir)
    // A crash between swapInto's publish rename and its deleteTree(old)
    // leaves BOTH the store and the __old dir on disk; recoverSwap is a
    // no-op then, and the next commit's swapInto would fail renaming the
    // store onto the surviving __old. Clear the leftovers here — the
    // commit path calls summary() first under the lock — mirroring
    // StoreCompaction.compactDir's recover-then-clean sequence.
    TierStore.deleteTree(oldDir)
    TierStore.deleteTree(tmpDir)
    if (!storeDir.exists()) return (Nil, 0L)
    s.catalog.refreshByPath(storeDir.toString)
    val rows = s.read.parquet(storeDir.toString).collect()
    val n = rows.headOption.map(_.getLong(2)).getOrElse(0L)
    (rows.filter(!_.isNullAt(0)).map(r => (r.getString(0), r.getLong(1))).toSeq, n)
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val cap = capacity
        val toks = batch.select(explode(Dedup.tokens(col(textCol))).as("t")).as[String]
        // one pass per partition: count the tokens WHILE folding them
        // into the local summary (mgLocal consumes the iterator)
        val partials = toks.mapPartitions { it =>
          var n = 0L
          val counted = it.map { t => n += 1; t }
          val local = TextAnalysis.mgLocal(counted, cap)
          Iterator.single((local, n))
        }
        // mapPartitions emits exactly one row per partition, so the
        // reduce can only be empty when the batch has ZERO partitions —
        // checked without a job (a Dataset.isEmpty probe would tokenize
        // and MG-fold all of partition 0 just to fetch one row)
        val (batchSummary, batchN) =
          if (partials.rdd.getNumPartitions == 0) (Seq.empty[(String, Long)], 0L)
          else partials.reduce { (a, b) =>
            (TextAnalysis.mgMerge(a._1, b._1, cap), a._2 + b._2)
          }
        storeLock.synchronized {
          val (stored, storedN) = summary(s)
          val merged = TextAnalysis.mgMerge(stored, batchSummary, cap)
          val n = storedN + batchN
          val out = merged.map { case (t, e) => (Option(t), e, n) } :+
            ((None: Option[String], 0L, n))
          out.toDF("token", "est", "n").coalesce(1)
            .write.mode("overwrite").parquet(tmpDir.toString)
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
