package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming curation: the batch [[graft.ops.Curation]] funnel as one
  * continuously-running pipeline — quality gate → exact dedup (vs the
  * persistent digest store) → near-dup dedup (vs the persistent
  * signature/bucket stores) → benchmark decontamination — composing
  * the SAME store layouts as [[StreamingDedup]] and
  * [[StreamingNearDup]], so each stage's state scales exactly like its
  * standalone twin: digests are 32 B per distinct kept doc, signatures
  * `numHashes` longs per kept doc, buckets (id, band, bh) longs, and
  * the benchmark shingle set is static. Ordering mirrors the batch
  * facade: dedup the cheap way first (exact before MinHash), so the
  * near-dup join only ever sees quality survivors.
  *
  * Per batch, survivors append to `kept/` and a per-stage funnel row
  * set (batch_id, stage, n_docs, ts_ms) appends to `funnel/` — the
  * operational record of what each gate cut, continuously (the
  * streaming twin of [[graft.ops.Curation.funnel]]'s doc counts).
  * [[CurationMetrics]] publishes that record into a metrics TierStore
  * as `~curation.<stage>` counters, chartable through the Influx
  * surface like any other metric.
  *
  * Near-dup verification is the MinHash ESTIMATE, as in
  * [[StreamingNearDup]] (exact verification would require storing
  * every kept document's shingle set — the corpus itself); size
  * `numHashes`/`threshold` with σ ≈ √(J(1−J)/numHashes) in mind.
  *
  * Failure semantics: at-least-once, same ordering discipline as the
  * twins — kept docs write BEFORE state appends, so a crash between
  * the writes re-emits (never loses) documents on batch replay, and
  * duplicate store rows only widen candidate sets. Replayed batches
  * re-append funnel rows with the same batch_id; consumers dedup on
  * (batch_id, stage).
  */
class StreamingCuration(spark: SparkSession, baseDir: String,
                        benchmark: DataFrame,
                        minQuality: Double = 0.15,
                        k: Int = 3, numHashes: Int = 96, bands: Int = 32,
                        threshold: Double = 0.5, minSharedShingles: Int = 2,
                        idCol: String = "doc_id", textCol: String = "text",
                        /** Optional stage-1c lexicon policy gate —
                          * [[graft.ops.TextAnalysis.lexiconFlags]]
                          * semantics, mirroring the batch facade's
                          * `Params(lexicon)`: flagged docs drop before
                          * the quality gate and never reach the dedup
                          * stores. */
                        lexicon: Option[Seq[String]] = None,
                        lexiconMaxHitRate: Double = 0.0,
                        /** Optional stage-1d entropy gate — mirrors the
                          * batch facade's `Params(minEntropyE6)`:
                          * low-information docs ([[graft.ops
                          * .TextAnalysis.tokenEntropy]] below the
                          * threshold) drop before quality and never
                          * reach the dedup stores. Stateless: the gate
                          * is a per-row projection of the batch. */
                        minEntropyE6: Option[Long] = None,
                        /** When set, [[CurationMetrics.publish]] runs
                          * after every `publishEveryBatches`-th batch's
                          * funnel append — the `~curation.*` counters
                          * stay continuously chartable without an
                          * external scheduler. The publish is an atomic
                          * snapshot swap, so a crash mid-publish leaves
                          * the previous generation readable. */
                        metricsStoreDir: Option[String] = None,
                        publishEveryBatches: Int = 1) {
  require(numHashes % bands == 0, "bands must divide numHashes")
  require(publishEveryBatches >= 1,
    s"publishEveryBatches must be >= 1, got $publishEveryBatches")
  // register on the OUTER session too: micro-batch session clones copy
  // the function registry at clone time, and the static benchmark
  // frame's shingle expressions analyze against it
  graft.functions.ensureRegistered(spark)
  private val rows = numHashes / bands
  private val keptDir = s"$baseDir/kept"
  private val digestDir = s"$baseDir/digests"
  private val sigDir = s"$baseDir/signatures"
  private val bkDir = s"$baseDir/buckets"
  private val funnelDir = s"$baseDir/funnel"

  def keptPath: String = keptDir
  def funnelPath: String = funnelDir

  /** Compact all three state stores' per-batch slivers (maintenance-
    * window op — run between triggers or with the stream stopped). */
  def compactStore(maxFiles: Int = 8): Boolean = {
    val a = StoreCompaction.compactDir(spark, digestDir, maxFiles)
    val b = StoreCompaction.compactDir(spark, sigDir, maxFiles)
    val c = StoreCompaction.compactDir(spark, bkDir, maxFiles)
    a || b || c // true when ANY store compacted (compactDir's contract)
  }

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  // signature/bucket/estimate pipeline shared with StreamingNearDup
  private val mh = new MinhashTwinOps(k, numHashes, bands, rows, idCol, textCol)
  import mh.{sigArrOf, bucketsOf, estimate}

  private def readStore(s: SparkSession, dir: String, like: DataFrame): DataFrame =
    if (Files.exists(Paths.get(dir))) {
      // streaming sink listings are cached per path in the session
      s.catalog.refreshByPath(dir)
      s.read.parquet(dir)
    } else like.limit(0)

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // stage 1 (total): one row per id — a verbatim-duplicated line
        // slips every candidate join; deterministic winner as the twins
        val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint()
        // stage 1c (optional): lexicon policy gate, as the batch facade
        val screened = lexicon match {
          case Some(lex) =>
            b.join(
              TextAnalysis.lexiconFlags(b, lex, lexiconMaxHitRate, idCol, textCol)
                .where(!col("flagged")).select(idCol),
              Seq(idCol), "left_semi")
              .localCheckpoint()
          case None => b
        }
        // stage 1d (optional): entropy gate, as the batch facade —
        // stateless per-row projection, ids-only semi-join
        val entGated = minEntropyE6 match {
          case Some(minEnt) =>
            // materialize entropy before the threshold (the batch
            // facade's rationale: a pushed filter re-derives the
            // run-length chain per row)
            val ent = TextAnalysis.tokenEntropy(screened, idCol, textCol)
              .select(col(idCol), col("entropy_e6")).localCheckpoint()
            screened.join(
              ent.where(col("entropy_e6") >= minEnt).select(idCol),
              Seq(idCol), "left_semi")
              .localCheckpoint()
          case None => screened
        }
        // stage 2: quality gate — the same rounded score the batch
        // facade thresholds on
        val quality = entGated
          .where(round(TextAnalysis.qualityScoreOf(
            Dedup.tokens(col(textCol)), col(textCol)), 4) >= minQuality)
          .localCheckpoint()
        // stage 3: exact dedup vs the digest store + within the batch
        val withDigest = quality.select(col(idCol), col(textCol),
          sha2(Dedup.normText(col(textCol)), 256).as("digest"))
        val seenDig = readStore(s, digestDir, withDigest.select("digest"))
        val digW = Window.partitionBy("digest").orderBy(col(idCol).asc, col(textCol).asc)
        val exact = withDigest
          .join(seenDig.select("digest"), Seq("digest"), "left_anti")
          .withColumn("__rn", row_number().over(digW)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint()
        // stage 4: near-dup vs the signature/bucket stores + within
        // the batch (estimate-verified, exactly as StreamingNearDup)
        val sigArr = sigArrOf(exact).localCheckpoint()
        val newBk = bucketsOf(sigArr)
        val seenSig = readStore(s, sigDir, sigArr)
        val seenBk = readStore(s, bkDir, newBk)
        val crossCand = newBk.as("a")
          .join(seenBk.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.id") =!= col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        val crossDup = estimate(crossCand, sigArr, seenSig)
          .where(col("est") >= threshold)
          .select(col("id_a").as(idCol)).distinct()
        val selfCand = newBk.as("a")
          .join(newBk.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        val selfPairs = estimate(selfCand, sigArr, sigArr)
          .where(col("est") >= threshold).select("id_a", "id_b")
        val selfLosers = Dedup.dupClusters(selfPairs)
          .where(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as(idCol))
        val nearDup = exact
          .join(crossDup, Seq(idCol), "left_anti")
          .join(selfLosers, Seq(idCol), "left_anti")
          .localCheckpoint()
        // stage 5: decontamination against the static benchmark
        val kept = nearDup.join(
          Dedup.contamination(nearDup, benchmark, k, minSharedShingles,
            idCol, textCol).select(idCol),
          Seq(idCol), "left_anti")
          .localCheckpoint()
        // outputs: docs FIRST (at-least-once), then state, then funnel
        kept.select(col(idCol), col(textCol)).write.mode("append").parquet(keptDir)
        kept.select("digest").write.mode("append").parquet(digestDir)
        val keptSig = sigArr.join(kept.select(col(idCol).as("id")), "id")
          .localCheckpoint() // signature + bucket appends share one eval
        keptSig.write.mode("append").parquet(sigDir)
        bucketsOf(keptSig).write.mode("append").parquet(bkDir)
        // wall-clock batch stamp: the funnel is an OPERATIONAL record
        // (metrics-bridge input — see CurationMetrics), so real time is
        // the right axis; replay dedup happens on (batch_id, stage)
        val nowMs = System.currentTimeMillis()
        (Seq("1_total" -> b) ++
            (if (lexicon.isDefined) Seq("1c_lexicon" -> screened) else Nil) ++
            (if (minEntropyE6.isDefined) Seq("1d_entropy" -> entGated) else Nil) ++
            Seq("2_quality" -> quality, "3_exact_dedup" -> exact,
              "4_near_dup" -> nearDup, "5_decontaminated" -> kept))
          .map { case (st, df) =>
            df.agg(count(lit(1)).as("n_docs"))
              .select(lit(batchId).as("batch_id"), lit(st).as("stage"),
                col("n_docs"), lit(nowMs).as("ts_ms")) }
          .reduce(_ union _)
          .write.mode("append").parquet(funnelDir)
        metricsStoreDir.foreach { store =>
          if (batchId % publishEveryBatches == 0)
            CurationMetrics.publish(s, funnelDir, store)
        }
        ()
      }
      .start()
}
