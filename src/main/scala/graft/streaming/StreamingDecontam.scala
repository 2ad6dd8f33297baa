package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming semantic decontamination:
  * [[graft.ops.Similarity.semanticDecontam]] as a continuous pipeline —
  * every incoming vector whose cosine to ANY benchmark vector reaches
  * `threshold` is dropped before it can enter the kept corpus. The
  * benchmark (an eval suite) is FIXED for the life of the store, which
  * makes this the simplest twin in the package: unlike
  * [[StreamingVecNearDup]], kept vectors never join the index, so
  * per-batch work is a pure stateless probe and there is no
  * within-batch leg at all.
  *
  * Stores under `baseDir`:
  *  - `centroids/` — the coarse quantizer, trained ONCE on the
  *    benchmark by [[indexBenchmark]] (version-stamped; the benchmark
  *    is tiny next to the corpus, so nlist derives from ITS count);
  *  - `cells/` — (id, cell, v, nrm, version) assignment rows for every
  *    benchmark vector at `assignNprobe` width — vectors ride along so
  *    the exact verify reads one store and only probed cells join;
  *  - `meta/` — one (version, bench_n) row. Written LAST by
  *    indexBenchmark, so its presence certifies a complete index; a
  *    crash mid-build leaves no meta and the next indexBenchmark call
  *    rebuilds from scratch (mode "overwrite" everywhere — the build
  *    is idempotent). [[start]] REFUSES to run without it: a stream
  *    that silently kept everything because the index was never built
  *    is the one failure mode this op exists to prevent. An EMPTY
  *    benchmark writes bench_n = 0 and batches keep everything — the
  *    batch op's empty-benchmark identity, made explicit.
  *
  * Each micro-batch: probe the batch's vectors against the benchmark
  * cells (`nprobe` wide), exact-verify cosine ≥ threshold on rows
  * sharing a probed cell, drop hits, append survivors to `kept/`.
  * Ids equal to a benchmark id never pair (the shared-id-space
  * convention of the batch op). At-least-once: the only write is the
  * kept append, so batch replay re-emits but never loses, and nothing
  * it writes feeds back into any later decision. Restart durability is
  * trivial — the index is immutable on disk; a new instance over the
  * same `baseDir` serves it unchanged (spec-verified,
  * [[graft.StreamingSpec]]). To decontaminate against a NEW benchmark,
  * point at a fresh `baseDir` — there is deliberately no in-place
  * re-index on a store whose whole contract is immutability.
  */
class StreamingDecontam(spark: SparkSession, baseDir: String,
                        threshold: Double,
                        nlist: Int = 0, nprobe: Int = 2, assignNprobe: Int = 1,
                        idCol: String = "vec_id", vecCol: String = "embedding") {
  private val keptDir = s"$baseDir/kept"
  private val cellDir = s"$baseDir/cells"
  private val centDir = s"$baseDir/centroids"
  private val metaDir = s"$baseDir/meta"

  def keptPath: String = keptDir

  /** Streaming source for JSON-lines embedding files in `dir`. */
  def readJsonVecs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $vecCol ARRAY<FLOAT>").json(dir)

  /** Build the benchmark index — call once before [[start]]; a
    * rebuild over the same dir overwrites (idempotent). Crash safety by
    * ordering: the OLD meta is DELETED first — the certificate is gone
    * before any artifact is touched — and the new one is written LAST,
    * so every crash point leaves either a complete certified index or
    * no certificate at all ([[start]] refuses the latter; without the
    * upfront delete, a crash mid-rebuild would leave the old meta
    * certifying a mixed new-centroids/old-cells index that silently
    * keeps contaminated vectors). The version is a fresh timestamp per
    * build, so generations are distinguishable and a stale mix can
    * never satisfy the version agreement the loader and
    * [[graft.ops.StoreDoctor]] check. Returns the benchmark count.
    * `nlist ≤ 0` derives from that count ([[Similarity.suggestNlist]]).
    */
  def indexBenchmark(bench: DataFrame): Long = {
    graft.functions.ensureRegistered(spark)
    import spark.implicits._
    if (Files.exists(Paths.get(metaDir)))
      graft.sources.TierStore.deleteTree(new java.io.File(metaDir))
    val b = bench.select(col(idCol), col(vecCol)).localCheckpoint()
    val n = b.count()
    val version = System.currentTimeMillis()
    if (n > 0) {
      val want = if (nlist > 0) nlist else Similarity.suggestNlist(n)
      val cents = Similarity.ivfCentroids(b, math.min(want.toLong, n).toInt,
        iters = 1, idCol, vecCol)
      cents.zipWithIndex.flatMap { case (row, cell) =>
        row.zipWithIndex.map { case (x, d) => (version, cell, d, x) }
      }.toDF("version", "cell", "dim", "value")
        .coalesce(1).write.mode("overwrite").parquet(centDir)
      val width = math.min(assignNprobe, cents.length)
      b.select(col(idCol).as("id"), col(vecCol).as("v"),
          Similarity.norm(col(vecCol)).as("nrm"),
          explode(graft.functions.ivf_probe(col(vecCol), cents, width))
            .as("cell"))
        .withColumn("version", lit(version))
        .write.mode("overwrite").parquet(cellDir)
    }
    Seq((version, n)).toDF("version", "bench_n")
      .coalesce(1).write.mode("overwrite").parquet(metaDir)
    n
  }

  private def loadIndex(s: SparkSession): (Long, Long, Seq[Seq[Double]]) = {
    require(Files.exists(Paths.get(metaDir)),
      s"StreamingDecontam at $baseDir has no benchmark index — call " +
        "indexBenchmark(bench) before start() (a stream that keeps " +
        "everything because the index is missing must not run silently)")
    s.catalog.refreshByPath(metaDir)
    val meta = s.read.parquet(metaDir).collect()
    require(meta.length == 1, s"meta store $metaDir holds ${meta.length} rows")
    val (version, benchN) = (meta(0).getAs[Long]("version"),
      meta(0).getAs[Long]("bench_n"))
    if (benchN == 0L) (version, 0L, Nil)
    else {
      s.catalog.refreshByPath(centDir)
      val rows = s.read.parquet(centDir)
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[Int]("cell"),
          r.getAs[Int]("dim"), r.getAs[Double]("value")))
      require(rows.nonEmpty && rows.forall(_._1 == version),
        s"centroid store $centDir disagrees with meta version $version")
      val cents = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, rs) => rs.sortBy(_._3).map(_._4).toSeq }
      (version, benchN, cents)
    }
  }

  def start(vecs: DataFrame, trigger: Trigger): StreamingQuery = {
    // load ONCE — the index is immutable for the life of the store, so
    // the (tiny) centroid collect and meta read happen here, not per
    // micro-batch; failing here (no certificate) beats failing at the
    // first batch. Only the distributed cells read stays per-batch.
    val idx = loadIndex(spark)
    vecs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idx)
      }
      .start()
  }

  private def processBatch(batch: DataFrame,
                           idx: (Long, Long, Seq[Seq[Double]])): Unit = {
    val s = batch.sparkSession
    graft.functions.ensureRegistered(s)
    val (version, benchN, cents) = idx
    val b = batch.select(col(idCol), col(vecCol))
    // Generation guard — BEFORE the empty-benchmark identity branch
    // (ADVICE r13): the stream filters cells to the version captured
    // ONCE at start(). indexBenchmark over the same baseDir is
    // documented-idempotent and nothing refuses to run it while a
    // stream is live — after which the captured version matches no
    // cell row, benchCells is empty, and every batch vector would be
    // SILENTLY kept: the exact failure mode this op exists to prevent.
    // A stream started against an EMPTY benchmark is the same hazard,
    // not an exemption — if the index is rebuilt non-empty under it,
    // its keep-everything identity is now wrong, so the bench_n == 0
    // branch must also fail loudly on a generation change. The meta is
    // one row, so the per-batch re-read is a trivial driver-side
    // parquet footer away.
    s.catalog.refreshByPath(metaDir)
    val liveMeta = s.read.parquet(metaDir).collect()
    require(liveMeta.length == 1 &&
        liveMeta(0).getAs[Long]("version") == version,
      s"StreamingDecontam at $baseDir: benchmark index was rebuilt " +
        s"under a live stream (started against version $version, store " +
        s"now holds ${liveMeta.map(_.getAs[Long]("version")).mkString(", ")}) " +
        "— restart the stream against the new index; continuing would " +
        "probe an empty generation and silently keep everything")
    if (benchN == 0L) { // empty-benchmark identity: everything kept
      b.write.mode("append").parquet(keptDir)
      return
    }
    val probeWidth = math.min(math.max(nprobe, 1), cents.length)
    val probed = b.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.norm(col(vecCol)).as("nrm"),
        explode(graft.functions.ivf_probe(col(vecCol), cents, probeWidth))
          .as("cell"))
    s.catalog.refreshByPath(cellDir)
    val benchCells = s.read.parquet(cellDir)
      .where(col("version") === version)
    val contaminated = probed.as("a")
      .join(benchCells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
      .where(col("a.nrm") > 0 && col("b.nrm") > 0 &&
        Similarity.dot(col("a.v"), col("b.v")) >=
          lit(threshold) * col("a.nrm") * col("b.nrm"))
      .select(col("a.id").as(idCol)).distinct()
    b.join(contaminated, Seq(idCol), "left_anti")
      .write.mode("append").parquet(keptDir)
  }
}
