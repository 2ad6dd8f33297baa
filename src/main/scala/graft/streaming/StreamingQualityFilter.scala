package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming trained-classifier quality filter:
  * [[graft.ops.TextAnalysis.trainQualityClassifier]]'s fit-once/
  * serve-many shape as a continuous pipeline — the deployed form of
  * the wiki-vs-crawl filter: train the logistic weights on a curated
  * positive set plus a raw negative sample ONCE, then score every
  * incoming batch against the frozen weights and keep the docs the
  * classifier marks σ > ½ (the [[TextAnalysis.classifierScore]]
  * `keep` rule).
  *
  * The persistent state is the weight frame — ≤ dim (bucket, w_e6)
  * rows, bytes regardless of stream length, published with the same
  * staged-rename/`__old`-fallback commit as [[StreamingDsir]]'s λ
  * model. Batches read the model, never write it; re-[[fit]] between
  * triggers swaps generations atomically, like quantizer retrain in
  * [[StreamingVecNearDup]].
  *
  * Failure semantics: at-least-once, trivially — scoring is stateless
  * given the weights, so a replayed batch re-emits bit-identical rows
  * (duplicated, never corrupted), and a crash inside [[fit]] leaves a
  * complete readable generation via the `__old` fallback.
  */
class StreamingQualityFilter(spark: SparkSession, baseDir: String,
                             dim: Int = 4096, steps: Int = 2,
                             idCol: String = "doc_id", textCol: String = "text") {

  private val keptDir = s"$baseDir/kept"
  private val wDir = s"$baseDir/weights"

  /** Path to the kept (classifier-positive) corpus sink. */
  def keptPath: String = keptDir

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Train (or re-train) the weights and commit atomically — must run
    * once before [[start]]. */
  def fit(pos: DataFrame, neg: DataFrame): Unit = {
    val tmp = s"$wDir.__stage"
    val old = s"$wDir.__old"
    TextAnalysis.trainQualityClassifier(pos, neg, dim, steps,
        idCol = idCol, textCol = textCol)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    if (Files.exists(Paths.get(wDir))) {
      graft.sources.TierStore.deleteTree(new java.io.File(old))
      Files.move(Paths.get(wDir), Paths.get(old))
    }
    Files.move(Paths.get(tmp), Paths.get(wDir))
    graft.sources.TierStore.deleteTree(new java.io.File(old))
    spark.catalog.refreshByPath(wDir)
  }

  /** The committed weight frame (`__old` fallback inside a crashed
    * fit's rename window). */
  private def model(s: SparkSession): DataFrame = {
    val dir =
      if (Files.exists(Paths.get(wDir))) wDir
      else if (Files.exists(Paths.get(s"$wDir.__old"))) s"$wDir.__old"
      else throw new IllegalStateException(
        s"StreamingQualityFilter at $baseDir has no fitted model — call fit() first")
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
        graft.functions.ensureRegistered(s)
        // one row per id (the shared twin guard)
        val oneRn = org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // score join + kept write share one evaluation
        val kept = TextAnalysis.classifierScore(b, model(s), dim, idCol, textCol)
          .where(col("keep"))
        b.join(kept, Seq(idCol))
          .select(col(idCol), col(textCol), col("score"))
          .write.mode("append").parquet(keptDir)
        ()
      }
      .start()
}
