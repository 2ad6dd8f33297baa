package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-dup dedup: [[graft.ops.Dedup.minhashLshIncremental]]
  * as a continuous pipeline. The persistent state is the MinHash
  * signature store — `numHashes` longs per kept document, NOT the
  * documents or their shingles — so the per-batch cost is the batch's
  * own signature build plus a band-bucket equi-join against the store.
  * Each micro-batch:
  *
  *   1. signatures + LSH band buckets for the batch's docs;
  *   2. cross dups: batch docs whose bucket-mates in the store have
  *      estimated Jaccard ≥ threshold are dropped;
  *   3. within-batch dups: bucket self-join pairs → estimated Jaccard
  *      → [[Dedup.dupClusters]] → min-id winner per cluster survives
  *      (the same operators a batch pipeline composes);
  *   4. survivors land in `kept/`; their signatures AND band-bucket
  *      rows join the store (buckets are persisted so step 2 reads
  *      them instead of re-deriving O(|store| × bands) rows per
  *      trigger).
  *
  * Unlike the batch operator, near-duplicate verification here is the
  * MinHash ESTIMATE (matching-hash fraction — unbiased, σ ≈
  * √(J(1−J)/numHashes) ≈ 0.05 at 96 hashes), because exact verification
  * would require storing every kept document's shingle set, i.e. the
  * corpus itself. Size `numHashes`/`threshold` with that margin in
  * mind.
  *
  * Failure semantics match [[StreamingDedup]]: kept docs are written
  * before their signatures and buckets — batch replay re-emits, never
  * loses (at-least-once). Duplicate store rows from a replay only
  * widen the candidate set (the joins de-duplicate), never corrupt it.
  */
class StreamingNearDup(spark: SparkSession, baseDir: String,
                       k: Int = 3, numHashes: Int = 96, bands: Int = 32,
                       threshold: Double = 0.5,
                       idCol: String = "doc_id", textCol: String = "text") {
  require(numHashes % bands == 0, "bands must divide numHashes")
  private val rows = numHashes / bands
  private val keptDir = s"$baseDir/kept"
  private val sigDir = s"$baseDir/signatures"
  // band buckets are persisted ALONGSIDE the signatures: re-deriving
  // them from the signature store every trigger would cost
  // O(|store| x bands) per batch — linear in corpus age — where a
  // pre-bucketed read is a plain scan of (id, band, bh) rows
  private val bkDir = s"$baseDir/buckets"

  def keptPath: String = keptDir

  /** Compact the signature and bucket stores' per-batch slivers
    * (maintenance-window op — run between triggers or with the stream
    * stopped). */
  def compactStore(maxFiles: Int = 8): Boolean = {
    val a = StoreCompaction.compactDir(spark, sigDir, maxFiles)
    val b = StoreCompaction.compactDir(spark, bkDir, maxFiles)
    a || b // true when ANY store compacted (compactDir's contract)
  }

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  // signature/bucket/estimate pipeline shared with StreamingCuration
  private val mh = new MinhashTwinOps(k, numHashes, bands, rows, idCol, textCol)
  import mh.{sigArrOf, bucketsOf, estimate}

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // one row per id: a same-id duplicate pair slips every candidate
        // join (self needs id_a < id_b, cross excludes equal ids) and
        // would fan the signature store out per copy; deterministic pick
        val oneRn = org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint()
        val sigArr = sigArrOf(b).localCheckpoint() // buckets + estimates + store append
        val newBk = bucketsOf(sigArr)
        val seenSig =
          if (Files.exists(Paths.get(sigDir))) {
            s.catalog.refreshByPath(sigDir) // streaming sink listing is cached per path
            s.read.parquet(sigDir)
          } else sigArr.limit(0)
        val seenBk =
          if (Files.exists(Paths.get(bkDir))) {
            s.catalog.refreshByPath(bkDir)
            s.read.parquet(bkDir)
          } else newBk.limit(0)
        // cross dups: batch docs near-duplicating the kept corpus —
        // against the PRE-BUCKETED store, not a per-batch re-derivation
        val crossCand = newBk.as("a")
          .join(seenBk.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.id") =!= col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        val crossDup = estimate(crossCand, sigArr, seenSig)
          .where(col("est") >= threshold)
          .select(col("id_a").as(idCol)).distinct()
        // within-batch dups: pair graph → clusters → min-id wins
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
        val kept = b
          .join(crossDup, Seq(idCol), "left_anti")
          .join(selfLosers, Seq(idCol), "left_anti")
          .localCheckpoint() // doc write + signature append share one evaluation
        kept.write.mode("append").parquet(keptDir)
        val keptSig = sigArr.join(kept.select(col(idCol).as("id")), "id")
          .localCheckpoint() // signature + bucket appends share one eval
        keptSig.write.mode("append").parquet(sigDir)
        // kept-rows-only bucket derivation: per-batch cost, not per-store
        bucketsOf(keptSig).write.mode("append").parquet(bkDir)
        ()
      }
      .start()
}
