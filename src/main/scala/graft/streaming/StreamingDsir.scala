package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming DSIR filter: [[graft.ops.Sampling.lambdaFrame]]'s
  * fit-once/serve-many shape as a continuous pipeline — the way DSIR
  * is actually deployed on a crawl (fit the hashed-ngram log-ratio
  * model on a target corpus plus a raw reference sample ONCE, then
  * score every incoming batch against the frozen model and keep the
  * target-like tail).
  *
  * The persistent state is the λ frame — ≤ nBuckets+1 (bucket, lam_e6)
  * rows, bytes regardless of how long the stream runs, published with
  * the staged-rename/`__old`-fallback commit every store here uses.
  * Unlike the dedup twins there is no per-batch state GROWTH at all:
  * batches read the model, they never write it (re-[[fit]] is the
  * maintenance op, run between triggers like retrain/compact
  * elsewhere).
  *
  * Failure semantics: at-least-once, trivially — scoring is stateless
  * given the model, so a replayed batch re-emits bit-identical rows
  * (duplicated, never corrupted), and a crash inside [[fit]] leaves
  * some complete λ generation readable via the `__old` fallback.
  */
class StreamingDsir(spark: SparkSession, baseDir: String,
                    threshold: Double = 0.0,
                    nBuckets: Int = 4096, alpha: Double = 1.0,
                    idCol: String = "doc_id", textCol: String = "text") {

  private val keptDir = s"$baseDir/kept"
  private val lamDir = s"$baseDir/lambda"

  /** Path to the kept (target-like) corpus sink. */
  def keptPath: String = keptDir

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Fit (or re-fit) the λ model and commit it atomically — must run
    * once before [[start]]; re-running between triggers swaps the
    * model under the stream the way retrain swaps the quantizer in
    * [[StreamingVecNearDup]]. */
  def fit(target: DataFrame, rawSample: DataFrame): Unit = {
    val tmp = s"$lamDir.__stage"
    val old = s"$lamDir.__old"
    Sampling.lambdaFrame(rawSample, target, nBuckets, alpha, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    if (Files.exists(Paths.get(lamDir))) {
      graft.sources.TierStore.deleteTree(new java.io.File(old))
      Files.move(Paths.get(lamDir), Paths.get(old))
    }
    Files.move(Paths.get(tmp), Paths.get(lamDir))
    graft.sources.TierStore.deleteTree(new java.io.File(old))
    spark.catalog.refreshByPath(lamDir)
  }

  /** The committed λ frame ( `__old` fallback inside a crashed fit's
    * rename window). */
  private def model(s: SparkSession): DataFrame = {
    val dir =
      if (Files.exists(Paths.get(lamDir))) lamDir
      else if (Files.exists(Paths.get(s"$lamDir.__old"))) s"$lamDir.__old"
      else throw new IllegalStateException(
        s"StreamingDsir at $baseDir has no fitted model — call fit() first")
    s.catalog.refreshByPath(dir)
    s.read.parquet(dir)
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // one row per id (the shared twin guard)
        val oneRn = org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // scored join + kept text write share one evaluation
        val scored = Sampling.scoreAgainst(b, model(s), nBuckets, idCol, textCol)
          .where(col("logratio") >= threshold)
        b.join(scored, Seq(idCol))
          .select(col(idCol), col(textCol), col("n_grams"), col("logratio"))
          .write.mode("append").parquet(keptDir)
        ()
      }
      .start()
}
