package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.{Sampling, TrainingRun}
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously refreshed training shards:
  * [[graft.ops.TrainingRun.prepareDoremi]]'s fit → upsample → shuffle
  * → stripe loop as a stream — the twin that closes the deployment
  * loop when the corpus itself is a stream (each night's crawl lands,
  * the mixture refits, and the NEXT training run reads the freshly
  * published manifest).
  *
  * Input contract: an already-CURATED document stream (chain
  * [[StreamingCuration]]'s kept store in front for the full funnel —
  * batch prepareDoremi owns curation for the same reason: fit on
  * survivors, not raw crawl). Per batch:
  *
  *  1. the embedded [[StreamingDomainReweight]] controller folds the
  *     batch's counts into its swap-committed gram stores and
  *     publishes the refit DoReMi weights (`rounds` ≥ 2 = iterative);
  *  2. the batch's (id, source) rows — 16 bytes/doc, the ONLY
  *     corpus-sized state this twin adds — fold into `state/docs`;
  *  3. the manifest (id, copy, pos, shard) is REPUBLISHED over the
  *     cumulative doc store through the batch operator's own tail
  *     ([[TrainingRun.upsampledTail]]): learned weights →
  *     [[Sampling.epochsFromWeights]] (a \|domains\|-row driver
  *     crossing, the loop's only collect) → deterministic upsample →
  *     seeded replica shuffle → stripe.
  *
  * The manifest is recomputed whole each trigger BY DESIGN: a global
  * permutation over the grown corpus cannot be appended to (every
  * pos shifts), and that is exactly what makes the N-batch stream
  * equal the batch operator bit-for-bit (spec-pinned). The recompute
  * is one upsample scan + the epochShuffle two-level prefix sum over
  * id/source pairs — no text is ever re-read; set the trigger (or
  * gate batches upstream) to the cadence shards should refresh at.
  *
  * Failure semantics: at-least-once. A replayed batch re-folds counts
  * into the reweight stores (the documented same-mass bias) and
  * re-arrives in the doc store, where the per-id guard keeps one row;
  * a crash between the reweight publish and the manifest publish
  * leaves the PREVIOUS manifest generation serving (swap-committed,
  * never torn) until the replay republishes. [[currentManifest]]
  * snapshots the committed generation inside the lock (corpus-sized,
  * so distributed blocks via localCheckpoint — the [[StreamingDrift]]
  * pattern, not a driver collect).
  */
class StreamingTrainingPrep(spark: SparkSession, baseDir: String,
                            nShards: Int = 4, rounds: Int = 2,
                            seed: Long = 0L, maxEpochsE6: Long = 8000000L,
                            etaE6: Long = 500000L, lam: Double = 0.7,
                            srcCol: String = "source",
                            idCol: String = "doc_id", textCol: String = "text",
                            curriculum: Boolean = false) {
  require(nShards >= 1, s"nShards must be >= 1, got $nShards")

  // curriculum mode = the [[TrainingRun.prepareDoremiCurriculum]] twin:
  // the doc store carries the curation-tokenizer count beside the
  // source (24 B/doc instead of 16), and the manifest republishes
  // through doremiCurriculumTail (epoch-major easy→hard) instead of
  // the hash permutation. Everything else — controller, store
  // protocol, commit — is shared.
  private val tokCol = "n_tokens"

  private val reweight = new StreamingDomainReweight(spark,
    s"$baseDir/reweight", etaE6, lam, srcCol, idCol, textCol, rounds)

  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)
  // docs + manifest commit as ONE parent swap (the reweight twin's
  // design): a crash can never publish a manifest computed over a doc
  // generation that is not the one on disk beside it
  private val stateDir = new File(s"$baseDir/state")
  private val stateTmp = new File(s"$baseDir/state__tmp")
  private val stateOld = new File(s"$baseDir/state__old")

  /** Streaming source for JSON-lines curated-document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream
      .schema(s"$idCol LONG, $textCol STRING, $srcCol STRING").json(dir)

  private def emptyDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    if (curriculum) Seq.empty[(Long, String, Long)].toDF(idCol, srcCol, tokCol)
    else Seq.empty[(Long, String)].toDF(idCol, srcCol)
  }

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

  /** The committed manifest (idCol, copy, pos, shard) — the frame a
    * training job's shard writer reads — or None before the first
    * completed batch. Snapshotted inside the lock via eager
    * localCheckpoint: corpus × epochs rows, far too large for the
    * |domains|-row collect pattern, and the truncated lineage means no
    * consumer re-reads the path after a later publish swaps it. */
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
        // one row per id (the shared twin guard)
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol), col(srcCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // the controller fold + the doc fold share it
        if (b.isEmpty) ()
        else {
          // 1. refit the mixture on the cumulative counts — the
          // guarded entry point: b is already one-row-per-id and
          // materialized above, so the controller folds it directly
          reweight.processGuardedBatch(b)
          storeLock.synchronized {
            // 2. fold (id, source[, n_tokens]): one row per id across
            // ALL batches — a replayed or re-crawled id must not gain
            // manifest copies. The reduce is a row-LEXICOGRAPHIC min
            // (source, then count), associative across any batching, so
            // a re-crawled id commits the same row whether its copies
            // share a batch or not.
            val batchDocs =
              if (curriculum)
                // NULL text counts as 0 tokens (ranks first), it does
                // NOT raise: the input contract is a curated stream,
                // but a single malformed line must not become a
                // forever-retrying poison pill inside foreachBatch —
                // and non-curriculum mode keeps the same doc, so
                // dropping it here would diverge the two modes
                b.select(col(idCol), col(srcCol),
                  when(col(textCol).isNull, lit(0L))
                    .otherwise(size(graft.ops.Dedup.tokens(col(textCol)))
                      .cast("long")).as(tokCol))
              else b.select(col(idCol), col(srcCol))
            val foldOrder =
              if (curriculum) Seq(col(srcCol).asc_nulls_first, col(tokCol).asc)
              else Seq(col(srcCol).asc_nulls_first)
            val docsAll = readDocs(s)
              .unionByName(batchDocs)
              .withColumn("__rn", row_number().over(
                Window.partitionBy(idCol).orderBy(foldOrder: _*)))
              .where(col("__rn") === 1).drop("__rn")
              .localCheckpoint() // manifest + commit share one evaluation
            // 3. learned weights → epochs → the batch operator's tail
            val w = reweight.currentWeights(s).getOrElse(throw new IllegalStateException(
              "reweight controller published no weights for a non-empty batch"))
            val epochs = Sampling.epochsFromWeights(w, maxEpochsE6, srcCol)
              .select(col(srcCol), col("epochs_e6")).collect()
              .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
            val manifest = (
              if (curriculum) TrainingRun.doremiCurriculumTail(
                docsAll, epochs, nShards, seed, srcCol, idCol, tokCol)
              else TrainingRun
                .upsampledTail(docsAll, epochs, nShards, seed, srcCol, idCol))
              .localCheckpoint() // evaluate before the store swaps under it
            publishAll(Seq("docs" -> docsAll, "manifest" -> manifest))
          }
        }
        ()
      }
      .start()

  /** Write both frames into a staging parent, then swap the parent in
    * ONE rename — state is always a consistent generation. UNLIKE the
    * reweight twin's vocab-bounded snapshots, both frames here are
    * corpus-sized (16 B and 32 B per doc), so they keep their natural
    * partitioning — a coalesce(1) would funnel every publish through
    * one task at scale. */
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
