package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EMBEDDING near-dup dedup:
  * [[graft.ops.Similarity.ivfNearDupIncremental]] as a continuous
  * pipeline — the vector twin of [[StreamingNearDup]]. The persistent
  * state is a real IVF index:
  *
  *  - `centroids/` — the coarse quantizer, trained ONCE on the first
  *    batch and persisted with a version stamp; every later batch
  *    probes the SAME Voronoi partition the store was built under
  *    (mixing assignments from different centroid sets would make
  *    cell-equality meaningless, so the version rides along and is
  *    asserted on read);
  *  - `cells/` — (id, cell, vector, norm, centroid version) assignment
  *    rows for every kept vector, `assignNprobe` rows per id
  *    (multiple assignment — see [[Similarity.ivfNearDupIncremental]]).
  *    Vectors ride in the assignment rows so the exact verify reads
  *    one store, and only rows in probed cells are ever joined.
  *
  * Each micro-batch: (1) probe the batch's vectors; (2) cross dups —
  * batch vectors whose store-mates in a shared cell verify at cosine ≥
  * threshold are dropped (EXACT verify, unlike the text twin's MinHash
  * estimate: the index stores the vectors themselves, so there is
  * nothing to approximate); (3) within-batch dups via
  * [[Similarity.ivfNearDupPairs]] under the SAME pinned centroids →
  * [[Dedup.dupClusters]] → min-id survivor; (4) survivors land in
  * `kept/`, their assignment rows join the store.
  *
  * Failure semantics match [[StreamingNearDup]]: kept vectors are
  * written before their assignment rows, so batch replay re-emits but
  * never loses (at-least-once); duplicate store rows from a replay
  * only widen the candidate set (the joins de-duplicate), never
  * corrupt it. Restart durability: centroids and cells live on disk,
  * so a new instance over the same `baseDir` resumes the same index —
  * spec-verified ([[graft.StreamingSpec]]).
  */
class StreamingVecNearDup(spark: SparkSession, baseDir: String,
                          threshold: Double = 0.7,
                          nlist: Int = 16, nprobe: Int = 2, assignNprobe: Int = 1,
                          idCol: String = "vec_id", vecCol: String = "embedding") {
  private val keptDir = s"$baseDir/kept"
  private val cellDir = s"$baseDir/cells"
  private val centDir = s"$baseDir/centroids"

  def keptPath: String = keptDir

  /** Streaming source for JSON-lines embedding files in `dir`. */
  def readJsonVecs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $vecCol ARRAY<FLOAT>").json(dir)

  /** Compact the assignment store's per-batch slivers (maintenance-
    * window op, as in [[StreamingNearDup.compactStore]]), folding in
    * the superseded-generation prune: reads pin `version` = the
    * committed centroid generation, so rows behind older versions —
    * one full corpus of assignments left by EACH [[retrain]] — are
    * dead weight the rewrite drops (keep >= committed; an in-flight
    * retrain's newer rows survive, same crash design as PQ codes). */
  def compactStore(maxFiles: Int = 8): Boolean =
    StoreCompaction.compactDir(spark, cellDir, maxFiles,
      canonicalize = StoreCompaction.versionPrune(
        StoreCompaction.centroidVersionBeside(spark, cellDir)))

  /** Retrain the quantizer on the FULL kept corpus and re-key every
    * assignment under the new centroid version — the index-maintenance
    * op the version pin exists for. The bootstrap centroids are
    * whatever the first batch looked like; as the corpus grows past
    * them, cells skew and candidate volume with it (Σ C(|cell|,2) is
    * minimized by balanced cells), so a deployment retrains in a
    * maintenance window — run between triggers or with the stream
    * stopped, like [[compactStore]]. Crash-safe by ordering, not by
    * atomicity: new-generation assignment rows APPEND behind the
    * version pin first (invisible until commit), then the quantizer
    * swaps via staged renames with an `__old` fallback — every crash
    * point leaves some complete (version, cells) pair readable, and a
    * re-run converges. Probes never mix Voronoi generations; old
    * rows linger as disk until compaction. `newNlist` defaults to the
    * construction-time nlist; pass the grown value as the corpus
    * scales (the nlist ∝ n rule). No-op false when nothing was kept
    * yet. Returns true when the index was rebuilt. */
  def retrain(newNlist: Int = nlist, iters: Int = 1): Boolean = {
    if (!Files.exists(Paths.get(keptDir))) return false
    spark.catalog.refreshByPath(keptDir)
    val kept = spark.read.parquet(keptDir)
    val n = kept.count()
    if (n == 0L) return false
    graft.functions.ensureRegistered(spark)
    val version = System.currentTimeMillis()
    val cents = Similarity.ivfCentroids(kept,
      math.min(newNlist.toLong, n).toInt, iters, idCol, vecCol)
    val storeWidth = math.min(assignNprobe, cents.length)
    // 1. APPEND the new generation's assignment rows alongside the old
    //    ones — never delete before the commit point. The version pin
    //    keeps them structurally invisible until the quantizer swaps,
    //    so a crash anywhere in this write leaves the old pair live.
    assignRows(kept.select(col(idCol), col(vecCol)), cents, storeWidth, version)
      .drop("pos")
      .write.mode("append").parquet(cellDir)
    // 2. COMMIT: stage the new quantizer beside the old, then two
    //    renames. loadCentroids falls back to the __old dir when the
    //    primary is missing, so EVERY crash point reads a coherent
    //    (version, cells) pair: before the primary rename → the old
    //    generation (its rows untouched above); after → the new one
    //    (its rows already appended). A re-run after a crash appends
    //    duplicate rows for the same version — harmless to the store
    //    joins, reclaimed by compactStore.
    val tmpCent = s"$centDir.__retrain"
    val oldCent = s"$centDir.__old"
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (row, cell) =>
      row.zipWithIndex.map { case (x, d) => (version, cell, d, x) }
    }.toDF("version", "cell", "dim", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmpCent)
    if (Files.exists(Paths.get(centDir))) {
      graft.sources.TierStore.deleteTree(new java.io.File(oldCent))
      Files.move(Paths.get(centDir), Paths.get(oldCent))
    }
    Files.move(Paths.get(tmpCent), Paths.get(centDir))
    graft.sources.TierStore.deleteTree(new java.io.File(oldCent))
    // 3. the old generation's cell rows stay behind the version pin —
    //    a disk-only cost until compaction, never a correctness one
    spark.catalog.refreshByPath(cellDir)
    spark.catalog.refreshByPath(centDir)
    true
  }

  /** The persisted coarse quantizer, or None before the first batch.
    * Tiny by construction (nlist × dims rows) — the same driver-side
    * footprint [[Similarity.ivfCentroids]] already pays. */
  private def loadCentroids(s: SparkSession): Option[(Long, Seq[Seq[Double]])] = {
    // primary first; the __old staging dir only exists inside retrain's
    // two-rename commit window — falling back to it makes every crash
    // point readable (see retrain)
    val dir =
      if (Files.exists(Paths.get(centDir))) Some(centDir)
      else if (Files.exists(Paths.get(s"$centDir.__old"))) Some(s"$centDir.__old")
      else None
    dir.flatMap { d =>
      s.catalog.refreshByPath(d)
      val rows = s.read.parquet(d)
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[Int]("cell"),
          r.getAs[Int]("dim"), r.getAs[Double]("value")))
      if (rows.isEmpty) None
      else {
        val version = rows.head._1
        require(rows.forall(_._1 == version),
          s"centroid store $centDir holds mixed versions — rebuild the index")
        val cents = rows.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (_, rs) => rs.sortBy(_._3).map(_._4).toSeq }
        Some((version, cents))
      }
    }
  }

  /** (id, cell, pos, v, nrm, version) assignment rows for a vector
    * frame — `pos` is the probe rank (0 = nearest cell), so one
    * probe pass serves both the wide query join and the
    * `pos < assignNprobe` store append. */
  private def assignRows(vecs: DataFrame, cents: Seq[Seq[Double]], probes: Int,
                         version: Long): DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.norm(col(vecCol)).as("nrm"),
        posexplode(graft.functions.ivf_probe(col(vecCol), cents, probes))
          .as(Seq("pos", "cell")))
      .withColumn("version", lit(version))

  def start(vecs: DataFrame, trigger: Trigger): StreamingQuery =
    vecs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()

  private def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    graft.functions.ensureRegistered(s)
    // one row per id (cf. StreamingNearDup: a same-id duplicate pair
    // slips the ≠/< candidate joins and would fan the store)
    val oneRn = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(xxhash64(col(vecCol).cast("string")).asc)
    val b = batch.select(col(idCol), col(vecCol))
      .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint()
    val nBatch = b.count()
    // a no-data trigger must not train a degenerate quantizer (or
    // touch the stores at all)
    if (nBatch == 0) return
    // bootstrap: the first batch trains and persists the quantizer
    // (capped at the batch size — a tiny bootstrap batch yields a
    // coarse index, refined in a deployment by periodic retrain+rekey)
    val (version, cents) = loadCentroids(s).getOrElse {
      val c = Similarity.ivfCentroids(b, math.min(nlist.toLong, nBatch).toInt,
        iters = 1, idCol, vecCol)
      import s.implicits._
      c.zipWithIndex.flatMap { case (row, cell) =>
        row.zipWithIndex.map { case (x, d) => (batchId, cell, d, x) }
      }.toDF("version", "cell", "dim", "value")
        .coalesce(1).write.mode("overwrite").parquet(centDir)
      (batchId, c)
    }
    // probe widths can never exceed the trained cell count
    val storeWidth = math.min(assignNprobe, cents.length)
    val probeWidth = math.min(math.max(nprobe, storeWidth), cents.length)
    val probed = assignRows(b, cents, probeWidth, version)
      .localCheckpoint() // cross join + (filtered) store append share it
    // version filter: cell equality is only meaningful within one
    // Voronoi generation, so rows from an interrupted retrain (or any
    // stale generation) are structurally invisible — a half-complete
    // retrain degrades to under-dedup until it is re-run, never to
    // wrong-cell matches
    val seenCells =
      if (Files.exists(Paths.get(cellDir))) {
        s.catalog.refreshByPath(cellDir)
        s.read.parquet(cellDir).where(col("version") === version)
      } else probed.drop("pos").limit(0)
    // cross dups: EXACT cosine verify against store rows sharing a
    // probed cell — only those rows are ever read into the join
    val crossDup = probed.as("a")
      .join(seenCells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
      .where(col("a.nrm") > 0 && col("b.nrm") > 0 &&
        Similarity.dot(col("a.v"), col("b.v")) >=
          lit(threshold) * col("a.nrm") * col("b.nrm"))
      .select(col("a.id").as(idCol)).distinct()
    // within-batch dups under the SAME pinned centroids — FlatAssign
    // pins the probe flat to match the store's persisted ivf_probe
    // assignment (the round-9 auto-superProbe default would otherwise
    // switch this leg to the two-level probe at nlist ≥ 256 and open a
    // geometry mismatch with the cells already on disk)
    val selfPairs = Similarity.ivfNearDupPairs(b, threshold,
      nlist, math.min(math.max(nprobe, 2), cents.length),
      idCol = idCol, vecCol = vecCol, centroids = Some(cents),
      superProbe = Similarity.FlatAssign)
    val selfLosers = Dedup.dupClusters(selfPairs)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    val kept = b
      .join(crossDup, Seq(idCol), "left_anti")
      .join(selfLosers, Seq(idCol), "left_anti")
      .localCheckpoint() // vector write + assignment append share one eval
    kept.write.mode("append").parquet(keptDir)
    // store kept rows' assignments at the index width, not the probe
    // width — probed already carries the wider of the two with probe
    // ranks, so filter, don't recompute
    val keptAssign = probed
      .join(kept.select(col(idCol).as("id")), "id")
      .where(col("pos") < storeWidth)
      .drop("pos")
    keptAssign.write.mode("append").parquet(cellDir)
  }
}
