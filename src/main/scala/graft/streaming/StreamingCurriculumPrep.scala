package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.{Dedup, TrainingRun}
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously refreshed CURRICULUM shards:
  * [[graft.ops.TrainingRun.prepareCurriculum]]'s short-to-long rank →
  * stripe as a stream — the [[StreamingTrainingPrep]] sibling for the
  * curriculum ordering instead of the DoReMi mixture (no controller,
  * no weight state: the difficulty signal is each doc's own token
  * count, so the twin is pure fold-and-republish).
  *
  * Input contract: an already-CURATED document stream (chain
  * [[StreamingCuration]]'s kept store in front — batch
  * prepareCurriculum owns curation for the same reason). Per batch the
  * (id, n_tokens) rows — 16 bytes/doc, the only state — fold into
  * `state/docs` (one row per id across all batches, so a replayed or
  * re-crawled id cannot shift the curriculum), and the manifest
  * (id, pos, shard) is REPUBLISHED over the cumulative store through
  * the batch operator's own tail ([[TrainingRun.curriculumTail]]: the
  * three-level curriculum rank, then stripe). Token counts use the
  * curation stage's exact semantics (`size(Dedup.tokens(text))`), so
  * the N-batch stream equals the batch chain bit-for-bit (spec-pinned).
  *
  * The manifest is recomputed whole each trigger BY DESIGN — a dense
  * global rank over the grown corpus cannot be appended to (every
  * insertion shifts positions after it) — and the recompute never
  * re-reads text: the rank runs on the 16 B/doc store.
  *
  * Failure semantics: at-least-once, the [[StreamingTrainingPrep]]
  * contract — docs + manifest commit as ONE parent swap; a crash
  * between folds leaves the previous committed generation serving.
  */
class StreamingCurriculumPrep(spark: SparkSession, baseDir: String,
                              nShards: Int = 4, seed: Long = 0L,
                              idCol: String = "doc_id", textCol: String = "text") {
  require(nShards >= 1, s"nShards must be >= 1, got $nShards")

  private val storeLock = TierStore.pathLock(baseDir)
  private val stateDir = new File(s"$baseDir/state")
  private val stateTmp = new File(s"$baseDir/state__tmp")
  private val stateOld = new File(s"$baseDir/state__old")

  /** Streaming source for JSON-lines curated-document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  private def emptyDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long)].toDF(idCol, TokCol)
  }

  private val TokCol = "n_tokens"

  private def readDocs(s: SparkSession): DataFrame = storeLock.synchronized {
    TierStore.recoverSwap(stateDir, stateOld)
    TierStore.deleteTree(stateOld)
    val leaf = new File(stateDir, "docs")
    if (!leaf.exists()) emptyDocs(s)
    else {
      s.catalog.refreshByPath(leaf.toString)
      s.read.parquet(leaf.toString)
    }
  }

  /** The committed manifest (idCol, pos, shard) — or None before the
    * first completed batch. Snapshotted inside the lock via eager
    * localCheckpoint (corpus-sized; the [[StreamingDrift]] pattern). */
  def currentManifest(s: SparkSession = spark): Option[DataFrame] =
    storeLock.synchronized {
      TierStore.recoverSwap(stateDir, stateOld)
      val leaf = new File(stateDir, "manifest")
      if (!leaf.exists()) None
      else {
        s.catalog.refreshByPath(leaf.toString)
        Some(s.read.parquet(leaf.toString).localCheckpoint(eager = true))
      }
    }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // one row per id: MIN token count — the SAME key the cross-
        // batch fold reduces on, so an id re-crawled with different
        // texts commits the same count whether the copies share a
        // batch or not (batching-invariance; a plain min aggregate,
        // no window). Token counts use the curation stage's exact
        // tokenizer semantics — text never enters the store.
        val b = batch
          .select(col(idCol),
            // NULL text counts as 0 tokens (ranks first), not NULL:
            // under ANSI size(NULL) is NULL, which would flow into the
            // min-fold and make curriculumOrder's NULL-difficulty guard
            // wedge the stream forever on one malformed line
            when(col(textCol).isNull, lit(0L))
              .otherwise(size(Dedup.tokens(col(textCol))).cast("long"))
              .as(TokCol))
          .groupBy(idCol).agg(min(TokCol).as(TokCol))
          .localCheckpoint()
        if (b.isEmpty) ()
        else storeLock.synchronized {
          // fold: one row per id across ALL batches, min token count
          // wins — a replay folds the identical count, a re-crawl
          // lands deterministically regardless of arrival order
          val docsAll = readDocs(s)
            .unionByName(b)
            .groupBy(idCol).agg(min(TokCol).as(TokCol))
            .localCheckpoint() // manifest + commit share one evaluation
          val manifest = TrainingRun
            .curriculumTail(docsAll, nShards, seed, idCol, TokCol)
            .localCheckpoint() // evaluate before the store swaps under it
          publishAll(Seq("docs" -> docsAll, "manifest" -> manifest))
        }
        ()
      }
      .start()

  /** Both frames into a staging parent, swapped in ONE rename — the
    * [[StreamingTrainingPrep]] commit protocol verbatim; both frames
    * are corpus-sized so they keep their natural partitioning. */
  private def publishAll(frames: Seq[(String, DataFrame)]): Unit = {
    TierStore.deleteTree(stateTmp)
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite")
        .parquet(new File(stateTmp, name).toString)
    }
    if (stateDir.exists()) TierStore.swapInto(stateDir, stateTmp, stateOld)
    else {
      Files.createDirectories(Paths.get(baseDir))
      require(stateTmp.renameTo(stateDir), s"could not publish $stateTmp")
    }
    frames.foreach { case (name, _) =>
      spark.catalog.refreshByPath(new File(stateDir, name).toString)
    }
  }
}
