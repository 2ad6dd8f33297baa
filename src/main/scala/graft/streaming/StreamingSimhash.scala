package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming SimHash dedup: [[graft.ops.Dedup.simhashPairsIncremental]]
  * as a continuous pipeline — the signature-proxy twin of
  * [[StreamingNearDup]] at 1/12 the state (ONE long per kept doc vs
  * 96 minhash longs). Persistent state is the signature store plus its
  * pre-derived pigeonhole block rows; per-batch cost is the batch's
  * own signature build + a block equi-join against the store. Each
  * micro-batch:
  *
  *   1. 64-bit signatures + (maxHamming+1) block rows for the batch;
  *   2. cross dups: batch docs within `maxHamming` bits of a KEPT
  *      doc's signature are dropped (pigeonhole candidates, exact
  *      `bit_count(xor)` verify — no estimate: the verify state IS
  *      the 8-byte signature, so unlike the MinHash twin nothing is
  *      approximated beyond SimHash itself);
  *   3. within-batch dups: block self-join pairs →
  *      [[Dedup.dupClusters]] → min-id survivor;
  *   4. survivors land in `kept/`; their signatures and block rows
  *      join the stores.
  *
  * Failure semantics match [[StreamingDedup]]: kept docs write before
  * their signatures — replay re-emits, never loses (at-least-once);
  * duplicate store rows only widen the candidate set (the joins
  * de-duplicate), never corrupt it.
  */
class StreamingSimhash(spark: SparkSession, baseDir: String,
                       maxHamming: Int = 3, bits: Int = 64,
                       idCol: String = "doc_id", textCol: String = "text") {
  require(maxHamming >= 0 && maxHamming < bits,
    s"maxHamming must be in [0, $bits), got $maxHamming")
  private val nBlocks = maxHamming + 1
  private val keptDir = s"$baseDir/kept"
  private val sigDir = s"$baseDir/signatures"
  private val bkDir = s"$baseDir/buckets"

  def keptPath: String = keptDir

  /** Compact the signature and block stores' per-batch slivers
    * (maintenance-window op). Canonicalizes like the BM25 twin: an
    * at-least-once replay double-appends rows, and without folding the
    * read-side healing into the rewrite, duplicates would persist
    * through compaction and permanently widen the candidate fan-out
    * past the 'one long per kept doc' state bound. The per-id pick is
    * deterministic (max signature), and the BLOCK store rebuilds from
    * the canonical signatures rather than deduping its own rows — a
    * per-(id, blk) dedup could keep blocks from two DIFFERENT stored
    * signatures of one id (a re-ingested edited doc), leaving bucket
    * coverage that corresponds to no single signature and silently
    * voiding the pigeonhole guarantee. */
  def compactStore(maxFiles: Int = 8): Boolean = {
    def canonicalSigs(df: DataFrame): DataFrame =
      df.groupBy("id").agg(max("simhash").as("simhash"))
    val a = StoreCompaction.compactDir(spark, sigDir, maxFiles,
      canonicalize = canonicalSigs)
    val b = StoreCompaction.compactDir(spark, bkDir, maxFiles,
      canonicalize = df =>
        Dedup.simhashBands(canonicalSigs(df.select("id", "simhash")),
          nBlocks, bits))
    a || b // true when ANY store compacted (compactDir's contract)
  }

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.functions.ensureRegistered(s)
        // one row per id (see StreamingNearDup: a same-id pair slips
        // every candidate join and fans the store out per copy)
        val oneRn = org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col(textCol).asc)
        val b = batch.select(col(idCol), col(textCol))
          .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
          .drop("__rn")
          .localCheckpoint()
        val sig = Dedup.simhash(b, idCol, textCol, bits = bits)
          .localCheckpoint() // bands + store append share one eval
        val newBk = Dedup.simhashBands(sig, nBlocks, bits)
        val seenBk =
          if (Files.exists(Paths.get(bkDir))) {
            s.catalog.refreshByPath(bkDir) // sink listing is cached per path
            s.read.parquet(bkDir)
          } else newBk.limit(0)
        def ham = Dedup.hamming(col("a.simhash"), col("b.simhash"))
        // cross dups: batch docs within maxHamming of the kept corpus,
        // against the PRE-DERIVED block store
        val crossDup = newBk.as("a")
          .join(seenBk.as("b"),
            col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
              col("a.id") =!= col("b.id"))
          .where(ham <= maxHamming)
          .select(col("a.id").as(idCol)).distinct()
        // within-batch dups: pair graph → clusters → min-id wins
        val selfPairs = newBk.as("a")
          .join(newBk.as("b"),
            col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
              col("a.id") < col("b.id"))
          .where(ham <= maxHamming)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        val selfLosers = Dedup.dupClusters(selfPairs)
          .where(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as(idCol))
        val kept = b
          .join(crossDup, Seq(idCol), "left_anti")
          .join(selfLosers, Seq(idCol), "left_anti")
          .localCheckpoint() // doc write + signature append share one eval
        kept.write.mode("append").parquet(keptDir)
        val keptSig = sig.join(kept.select(col(idCol).as("id")), "id")
          .localCheckpoint() // signature + block appends share one eval
        keptSig.write.mode("append").parquet(sigDir)
        Dedup.simhashBands(keptSig, nBlocks, bits)
          .write.mode("append").parquet(bkDir)
        ()
      }
      .start()
}
