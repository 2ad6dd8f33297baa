package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.Sampling
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Adaptive temperature source-mixing as a stream: the α-sampling rule
  * ([[Sampling.temperatureSample]]) with the source shares LEARNED
  * cumulatively. Per batch: per-source counts fold into a persistent
  * |sources|-row count store (three-name-swap committed), rates
  * recompute from the counts INCLUDING this batch — so a one-batch
  * stream equals the batch operator exactly (spec-pinned) — and the
  * batch's docs pass the same deterministic [[Sampling.detHashMod]]
  * gate before appending to `kept/`. Rates re-balance continuously as
  * the observed mix shifts — expected kept volume tracks `targetFrac`
  * of the cumulative corpus (a flooding source's rate RISES toward
  * targetFrac since it must supply nearly all the target, while
  * boosted tail sources stay at the keep-everything cap) — without a
  * corpus re-read, because only the count store (bytes) carries state.
  *
  * Earlier batches were gated by then-current rates — the standard
  * streaming trade (decisions at arrival with knowledge so far). An
  * exact retrospective mix is the batch operator over the full corpus;
  * this twin is the continuous approximation whose rates converge as
  * shares stabilize.
  *
  * Failure semantics: at-least-once with the twins' ordering — kept
  * docs append BEFORE the count commit, so a crash between them
  * re-emits (never loses) docs on replay; a replayed batch re-folds
  * its counts, biasing rates conservatively DOWN (duplicate counts ⇒
  * sources look bigger ⇒ smaller rates), never over-keeping.
  */
class StreamingMixture(spark: SparkSession, baseDir: String,
                       alpha: Double = 0.5, targetFrac: Double = 0.3,
                       groupCol: String = "source",
                       idCol: String = "doc_id", textCol: String = "text") {

  private val keptDir = s"$baseDir/kept"
  private val countsDir = new File(s"$baseDir/counts")
  private val tmpDir = new File(s"$baseDir/counts__tmp")
  private val oldDir = new File(s"$baseDir/counts__old")
  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)

  def keptPath: String = keptDir

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream
      .schema(s"$idCol LONG, $textCol STRING, $groupCol STRING").json(dir)

  /** Current cumulative per-source counts (groupCol, n_docs).
    * Snapshotted by COLLECTING inside the lock (|sources| rows): a
    * lazy scan would read the store path after the lock is released,
    * racing the per-batch swap — the transient-FileNotFound window the
    * lock exists to close ([[StreamingDomainReweight.currentWeights]]'
    * rule). */
  def counts(s: SparkSession = spark): DataFrame = storeLock.synchronized {
    TierStore.recoverSwap(countsDir, oldDir)
    TierStore.deleteTree(oldDir)
    TierStore.deleteTree(tmpDir)
    if (!countsDir.exists()) {
      import s.implicits._
      return Seq.empty[(String, Long)].toDF(groupCol, "n_docs")
    }
    s.catalog.refreshByPath(countsDir.toString)
    val snap = s.read.parquet(countsDir.toString)
    s.createDataFrame(java.util.Arrays.asList(snap.collect(): _*), snap.schema)
  }

  /** The rates the NEXT batch would be gated with. */
  def currentRates(s: SparkSession = spark): DataFrame =
    Sampling.temperatureRatesFromCounts(counts(s), alpha, targetFrac, groupCol)

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol), col(groupCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // counts fold + gate share one evaluation
        storeLock.synchronized {
          val merged = counts(s)
            .unionByName(b.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs")))
            .groupBy(col(groupCol)).agg(sum("n_docs").as("n_docs"))
            .localCheckpoint() // rates + commit reuse one tiny frame
          val rates = Sampling
            .temperatureRatesFromCounts(merged, alpha, targetFrac, groupCol)
            .select(col(groupCol), col("rate_e6"))
          // kept BEFORE counts: replay re-emits, never loses
          b.join(broadcast(rates), groupCol)
            .where(Sampling.detHashMod(col(idCol), 1000000L) < col("rate_e6"))
            .write.mode("append").parquet(keptDir)
          merged.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
          if (countsDir.exists()) TierStore.swapInto(countsDir, tmpDir, oldDir)
          else {
            Files.createDirectories(Paths.get(baseDir))
            require(tmpDir.renameTo(countsDir), s"could not publish $tmpDir")
          }
        }
        ()
      }
      .start()
}
