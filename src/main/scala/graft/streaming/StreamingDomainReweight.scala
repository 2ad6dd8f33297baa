package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.ops.{Sampling, TextAnalysis}
import graft.sources.TierStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous hard-domain reweighting: [[Sampling.hardDomainWeights]]
  * as a stream — the mixture CONTROLLER a crawl pipeline consults
  * ("which domains deserve more share tonight") recomputed per batch
  * from cumulative corpus statistics.
  *
  * Persistent state is ONE swap-committed parent (`state/`) holding
  * three count snapshots plus the weight frame, all corpus-size-FREE
  * and committed as a unit (a crash can never leave the counts from
  * two different fold generations visible together):
  *  - `state/srcgrams` — per-source bigram tables (source, prev, cur,
  *    tf): |sources|·vocab² bounded;
  *  - `state/srcunis`  — per-source token counts (source, token, uf):
  *    |sources|·vocab bounded (round 10 — replaces the global
  *    `unigrams` leaf; the iterative rounds below need unigram mass
  *    SPLIT by source, and the one-shot path derives the global sum);
  *  - `state/srcdocs`  — per-source doc counts: |sources| rows;
  *  - `state/weights`  — the published serving artifact.
  *
  * `rounds` ≥ 2 publishes ITERATIVE DoReMi weights
  * ([[Sampling.doremiWeightsFromGramStores]] — the K-round
  * refit-rescore loop over the same three stores; the weight frame
  * gains `cum_factor_e6`); `rounds = 1` (default) keeps the one-shot
  * schema and behavior bit-for-bit.
  *
  * Migration: a state dir written by the pre-`srcunis` version (global
  * `unigrams` leaf) CANNOT be upgraded in place — global counts don't
  * split by source — so the first batch fails loudly naming the fix
  * (rebuild the state from the corpus) instead of silently folding a
  * fresh per-source store beside stale global counts.
  *
  * The per-source STORES hold raw counts, not scores: a bigram's
  * log-probability moves as the corpus lexicon evolves, so every
  * source's historical pairs must re-price under the CURRENT counts —
  * which also makes a one-batch stream equal the batch operator
  * bit-for-bit (spec-pinned). Each batch folds its counts in, then
  * publishes the recomputed weight frame to `weights/` with the same
  * staged-rename/`__old`-fallback commit every snapshot store here
  * uses; [[currentWeights]] serves the committed frame.
  *
  * Failure semantics: at-least-once — a replayed batch re-folds its
  * counts, which biases every domain's statistics by the SAME
  * duplicated mass (weights shift only to the extent the replayed
  * batch's mix differs from the corpus mix, and never corrupt:
  * the stores stay exact counts of what was folded).
  */
class StreamingDomainReweight(spark: SparkSession, baseDir: String,
                              etaE6: Long = 500000L, lam: Double = 0.7,
                              srcCol: String = "source",
                              idCol: String = "doc_id", textCol: String = "text",
                              rounds: Int = 1) {

  require(rounds >= 1, s"rounds must be >= 1, got $rounds")

  // path-keyed JVM-wide lock (TierStore.pathLock): two handles over
  // one store dir in one driver serialize their swap/read critical
  // sections instead of racing them (the per-instance lock only ever
  // guarded a single handle; cross-process publishers remain out of
  // contract, as documented)
  private val storeLock = TierStore.pathLock(baseDir)
  // ONE parent directory holds all four snapshots and swaps as a unit:
  // per-store swaps would let a crash between publishes fold a
  // replayed batch twice into some stores and once into others — a
  // permanent skew of the lexicon's conditionals no later batch heals.
  // A crash anywhere leaves either the old complete state or the new
  // complete state readable (recoverSwap heals the rename window).
  private val stateDir = new File(s"$baseDir/state")
  private val stateTmp = new File(s"$baseDir/state__tmp")
  private val stateOld = new File(s"$baseDir/state__old")

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream
      .schema(s"$idCol LONG, $textCol STRING, $srcCol STRING").json(dir)

  private def readStore(s: SparkSession, name: String, emptyDf: => DataFrame): DataFrame =
    storeLock.synchronized {
      TierStore.recoverSwap(stateDir, stateOld)
      TierStore.deleteTree(stateOld)
      val leaf = new File(stateDir, name)
      if (!leaf.exists()) emptyDf
      else {
        s.catalog.refreshByPath(leaf.toString)
        s.read.parquet(leaf.toString)
      }
    }

  /** Write all four frames into a staging parent, then swap the parent
    * in ONE rename — state is always a consistent generation. */
  private def publishAll(frames: Seq[(String, DataFrame)]): Unit = {
    TierStore.deleteTree(stateTmp)
    frames.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite")
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

  private def emptyGrams(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(String, String, String, Long)].toDF(srcCol, "prev", "cur", "tf")
  }
  private def emptySrcUnis(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(String, String, Long)].toDF(srcCol, "token", "uf")
  }
  private def emptyDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(String, Long)].toDF(srcCol, "n_docs")
  }

  /** The committed weight frame (the serving artifact), or None before
    * the first completed batch. */
  def currentWeights(s: SparkSession = spark): Option[DataFrame] = storeLock.synchronized {
    // under storeLock: readStore deleteTree's state__old unconditionally,
    // so an unlocked reader landing in the swap window could have the
    // __old fallback deleted mid-read and fail transiently
    val weights = new File(stateDir, "weights")
    val weightsOld = new File(stateOld, "weights")
    val dir =
      if (weights.exists()) Some(weights)
      else if (weightsOld.exists()) Some(weightsOld)
      else None
    dir.map { d =>
      s.catalog.refreshByPath(d.toString)
      // snapshot inside the lock by COLLECTING the frame (tiny by
      // construction: one row per source domain) and rebuilding it as
      // a local relation. A lazy frame would read the path after the
      // lock is released, re-opening the race; a localCheckpoint
      // (ADVICE r9) leaks executor storage blocks on every poll until
      // the RDD is GC'd. The result is a frozen snapshot of the
      // committed generation — the serving contract.
      val snap = s.read.parquet(d.toString)
      val rows = snap.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), snap.schema)
    }
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch)
        ()
      }
      .start()

  /** One micro-batch's fold + weight publish — the foreachBatch body. */
  private[streaming] def processBatch(batch: DataFrame): Unit = {
        // one row per id (the shared twin guard)
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol), col(srcCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint() // three count folds share one evaluation
        processGuardedBatch(b)
  }

  /** [[processBatch]] minus the per-id guard + checkpoint — for
    * composing twins ([[StreamingTrainingPrep]]) that have ALREADY
    * deduplicated and materialized the batch for their own folds:
    * re-running the window + a second eager localCheckpoint over the
    * same rows would double the hottest per-batch path's shuffle and
    * storage-block footprint. Contract: `b` is one row per `idCol`,
    * carries (`idCol`, `textCol`, `srcCol`), and is materialized. */
  private[streaming] def processGuardedBatch(b: DataFrame): Unit = {
        val s = b.sparkSession
        storeLock.synchronized {
          // heal the swap window FIRST: a legacy state parked at
          // state__old by a crash inside swapInto would otherwise slip
          // past the layout check below, get recovered by readStore,
          // and be silently folded beside an empty srcunis store
          TierStore.recoverSwap(stateDir, stateOld)
          TierStore.deleteTree(stateOld)
          // a pre-srcunis state (global `unigrams` leaf) cannot be
          // split by source — refuse loudly rather than folding a
          // fresh per-source store beside stale global counts
          if (new File(stateDir, "unigrams").exists() &&
              !new File(stateDir, "srcunis").exists())
            throw new IllegalStateException(
              s"$stateDir was written by a pre-srcunis StreamingDomainReweight " +
                "(global `unigrams` leaf): global counts cannot be split by " +
                "source. Rebuild the state by re-streaming the corpus.")
          val grams = readStore(s, "srcgrams", emptyGrams(s))
            .unionByName(TextAnalysis.bigramPairCounts(b, Seq(srcCol), textCol))
            .groupBy(srcCol, "prev", "cur").agg(sum("tf").as("tf"))
            .localCheckpoint() // weights recompute + commit share one frame
          val srcUnis = readStore(s, "srcunis", emptySrcUnis(s))
            .unionByName(Sampling.srcUnigramCounts(b, srcCol, textCol))
            .groupBy(srcCol, "token").agg(sum("uf").as("uf"))
            .localCheckpoint()
          // n_docs counts SCORED docs (>= 2 tokens), matching the batch
          // operator's inner join of docs against their bigram scores
          val bdocs = b
            .where(size(graft.ops.Dedup.tokens(col(textCol))) >= 2)
            .groupBy(srcCol).agg(count(lit(1)).as("n_docs"))
          val sdocs = readStore(s, "srcdocs", emptyDocs(s))
            .unionByName(bdocs)
            .groupBy(srcCol).agg(sum("n_docs").as("n_docs"))
            .localCheckpoint()
          val weights = (
            if (rounds == 1)
              // one-shot path: the global unigram sum derives from the
              // per-source store (identical integers), keeping the
              // published schema and the one-batch ≡ batch pin intact
              Sampling.hardDomainWeightsFromGramStores(
                grams,
                srcUnis.groupBy("token").agg(sum("uf").as("ufreq")),
                sdocs, etaE6, lam, srcCol)
            else Sampling.doremiWeightsFromGramStores(
              grams, srcUnis, sdocs, rounds, etaE6, lam, srcCol)
          ).localCheckpoint() // evaluate before the stores swap under it
          publishAll(Seq("srcgrams" -> grams, "srcunis" -> srcUnis,
            "srcdocs" -> sdocs, "weights" -> weights))
        }
  }
}
