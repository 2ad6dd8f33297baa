package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, versioned IVF-PQ index — the artifact a 100 TB corpus
  * actually serves ANN queries from. [[Similarity.ivfPqTopK]] without
  * an index runs TWO driver-coordinated Lloyd trainings per call
  * (centroids + codebooks); a deployment trains ONCE, encodes each
  * vector at ingest, and answers every query by scanning 8-byte codes.
  * This store makes that shape a first-class API:
  *
  *  - `quantizer/` — one parquet holding BOTH trained artifact families
  *    under a version stamp (kind = 'cent': (cell, dim) → value;
  *    kind = 'cb': (subspace j, codeword c, dim) → value). One dir so
  *    the commit is ONE atomic rename — no window where centroids and
  *    codebooks disagree about the generation.
  *  - `codes/` — (version, n_id, cell, codes) rows: the 8-byte packed
  *    PQ codes plus the build-generation cell assignment, appended at
  *    ingest. 16 B of hot state per vector (vs 4·d bytes of float32) —
  *    the scan payload math that makes PQ the 100 TB move.
  *
  * Crash safety follows [[graft.streaming.StreamingVecNearDup.retrain]]:
  * codes APPEND behind the version pin first (structurally invisible —
  * reads filter `version = quantizer version`), then the quantizer
  * swaps via staged renames with an `__old` fallback, so every crash
  * point leaves some complete (quantizer, codes) generation readable
  * and a re-run converges. Stale-generation code rows linger as disk
  * until [[compact]], never as a correctness hazard.
  *
  * The hot-cell guard runs at BUILD time (where it belongs for a
  * persisted partition): [[build]] WARNs with the projected
  * Σ C(|cell|,2) when the trained quantizer's cells skew — the
  * re-balance lever for a store is retraining at larger nlist, not a
  * serve-time re-key the stored assignments would disagree with.
  *
  * No reference analog (khronus is a metrics store); geometry follows
  * Jégou et al. 2011 (IVFADC) as in [[Similarity.ivfPqTopK]].
  */
class PqIndexStore(spark: SparkSession, baseDir: String,
                   nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                   residual: Boolean = false, iters: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   superProbe: Option[Int] = None,
                   sampleInit: Boolean = true,
                   trainCap: Int = -1,
                   opqRotate: Boolean = false) {
  // Round-9 default flips (every 100 TB-critical lever used to be
  // opt-in — §G11 measured the flat fallback at 5.9× for a caller who
  // forgot): sampleInit defaults ON (hash-sampled Lloyd seeds — the
  // only init that can seed appended id ranges on a retrain; for a
  // fresh build it is at worst equivalent to first-k), trainCap
  // defaults to AUTO (-1 ⇒ ~50 vectors/centroid hash sample, the FAISS
  // training regime; 0 = explicitly train on everything), and
  // superProbe = None now means AUTO (two-level assignment once nlist
  // ≥ Similarity.AutoSuperProbeNlist; pass Similarity.FlatAssign to
  // force flat). Oracle queries pin the legacy explicit configs.

  /** The store's on-disk root — what a SQL client passes to
    * `graft_pq_serve_topk('<dir>', ...)` (the PySpark smoke wires the
    * ingest-time build to the SQL serve path through this). */
  def dir: String = baseDir

  private val quantDir = s"$baseDir/quantizer"
  private val codesDir = s"$baseDir/codes"
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def codesPath: String = codesDir

  /** Train the coarse quantizer + codebooks on `corpus`, encode it, and
    * commit the new generation — the ONE training event in the index's
    * life (re-run = retrain: the standard maintenance op as the corpus
    * outgrows its cells; pass a larger `nlist` via a new store instance
    * or rebuild after the hot-cell WARN fires). Returns the committed
    * version. */
  def build(corpus: DataFrame): Long = {
    graft.functions.ensureRegistered(spark)
    val version = System.currentTimeMillis()
    // `opqRotate` trains the OPQ rotation (driver-side Procrustes
    // alternation on a hash sample — §G12) and builds the WHOLE index
    // in rotated coordinates: orthogonality preserves dots, so cells,
    // recalls, and the exhaustive config are unchanged while the PQ
    // subspaces stop wasting codewords on an anisotropic spectrum
    // (measured +0.22 recall@10 at ksub 16 on the aniso corpus; a
    // no-op on variance-balanced corpora). The rotation persists with
    // the quantizer (kind = 'rot'), so serve and append re-enter
    // rotated coordinates with zero retraining.
    val rotation: Option[Seq[Seq[Double]]] =
      if (!opqRotate) None
      else Some(Similarity.opqRotation(corpus, m = m, ksub = ksub,
        idCol = idCol, vecCol = vecCol))
    val rcorpus = rotation.map(Similarity.rotated(corpus, _, vecCol))
      .getOrElse(corpus)
    // nlist ≤ 0 derives via the nlist ∝ n rule — the right default for
    // a store whose corpus size is only known at build time
    // `trainCap > 0` trains quantizer + codebooks on a hash-sampled
    // subset (the smallest-xxhash64 trainCap vectors — deterministic,
    // one distributed TakeOrdered) and only the ENCODE pass touches
    // every vector — how production PQ trainers work (k-means sees
    // ~50-250 vectors per centroid, not the corpus; at 10⁹ vectors
    // training on everything prices each Lloyd iteration as a full
    // corpus aggregate for no recall gain). nlist still derives from
    // the FULL corpus count (nlist ∝ n bounds cell size at serve).
    val nlistEff = Similarity.resolveNlist(corpus, nlist, "PqIndexStore.build")
    // a trainCap below nlist would silently train FEWER centroids than
    // the nlist ∝ n rule promises (limit(nlist) over a smaller frame),
    // quadrupling E|cell| with no signal — clamp up and say so
    // trainCap < 0 = AUTO (the round-9 default): hash-sample
    // ~AutoTrainPerCentroid vectors per centroid — when the corpus is
    // smaller than the cap the limit is a no-op and training still sees
    // everything, so small stores are bit-for-bit unaffected
    val requestedCap =
      if (trainCap < 0)
        math.min(Int.MaxValue.toLong,
          PqIndexStore.AutoTrainPerCentroid.toLong * nlistEff).toInt
      else trainCap
    val capEff =
      if (requestedCap > 0 && requestedCap < nlistEff) {
        log.warn(s"PqIndexStore.build: trainCap $requestedCap < nlist $nlistEff " +
          s"would train too few centroids — clamping the training sample " +
          s"to $nlistEff rows (aim for ~50-250 x nlist)")
        nlistEff
      } else requestedCap
    val trainSet =
      if (capEff <= 0) rcorpus
      else rcorpus.orderBy(xxhash64(col(idCol)), col(idCol)).limit(capEff)
        .localCheckpoint()
    // `sampleInit` (hash-sampled Lloyd seeds) is the RETRAIN
    // configuration: first-k init never seeds a centroid inside an
    // appended id range, so a retrain over base ∪ drifted mass can't
    // split the hot cell the audit flagged (§G11)
    val cents = Similarity.ivfCentroids(trainSet,
      nlistEff, iters, idCol, vecCol, sampleInit, superProbe)
    require(cents.nonEmpty, "cannot build a PQ index from an empty corpus")
    // Resolve the assignment geometry ONCE, here, against the trained
    // centroid count — and persist it with the quantizer (kind='mode'
    // row below). The auto-superProbe default resolves at BUILD time
    // only: append() and topK() pin to the persisted mode, so a handle
    // opened after a default flip (or with different args) can never
    // two-level-assign new codes into a flat-assigned generation —
    // mixed geometry within one version is silent recall loss.
    val assignMode: Option[Int] =
      Similarity.resolveSuperProbe(cents.length, superProbe)
    val assignPin: Option[Int] = assignMode.orElse(Similarity.FlatAssign)
    // `assignPin` threads the resolved assignment through BOTH
    // build-side n × nlist terms (residual codebook training and the
    // full-corpus encode) — the same escape hatch ivfTopK's serve path
    // got when nlist is grown ∝ n (§G9): without it an index BUILD at
    // 10⁶+ vectors pays the flat assignment the serve was rescued from
    val cbs = Similarity.trainPqCodebooks(trainSet, cents, m, ksub, iters,
      residual, idCol, vecCol, assignPin, sampleInit)
    val encoded = Similarity.pqEncodedBase(rcorpus, cents, cbs, residual,
      idCol, vecCol, assignPin)
    // 1. codes first, behind the version pin (invisible until commit)
    encoded.select(lit(version).as("version"), col("n_id"), col("cell"),
        col("codes"))
      .write.mode("append").parquet(codesDir)
    // build-time hot-cell audit: counts ride the codes just written
    // (no second corpus pass); the WARN names the skew and the lever
    cellAuditOf(version, cents.length, Similarity.DefaultHotCellFactor,
      "PqIndexStore.build", cents)
    // 2. COMMIT: stage the quantizer beside the old, then two renames
    //    (load falls back to __old inside the rename window)
    import spark.implicits._
    val centRows = cents.zipWithIndex.flatMap { case (row, cell) =>
      row.zipWithIndex.map { case (x, d) => (version, "cent", cell, 0, d, x) }
    }
    val cbRows = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.flatMap { case (cw, c) =>
        cw.zipWithIndex.map { case (x, d) => (version, "cb", j, c, d, x) }
      }
    }
    val rotRows = rotation.toSeq.flatMap(_.zipWithIndex.flatMap { case (row, r) =>
      row.zipWithIndex.map { case (x, d) => (version, "rot", r, 0, d, x) }
    })
    // the resolved assignment geometry, as ONE row (kind='mode', a = 0
    // for flat, a = w for two-level at width w) — load() pins to it
    val modeRows = Seq((version, "mode", assignMode.getOrElse(0), 0, 0, 0.0))
    val tmp = s"$quantDir.__stage"
    val old = s"$quantDir.__old"
    (centRows ++ cbRows ++ rotRows ++ modeRows)
      .toDF("version", "kind", "a", "b", "d", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    if (Files.exists(Paths.get(quantDir))) {
      graft.sources.TierStore.deleteTree(new java.io.File(old))
      Files.move(Paths.get(quantDir), Paths.get(old))
    }
    Files.move(Paths.get(tmp), Paths.get(quantDir))
    graft.sources.TierStore.deleteTree(new java.io.File(old))
    spark.catalog.refreshByPath(quantDir)
    version
  }

  /** The persisted artifacts, or None before the first [[build]]. The
    * quantizer collect is bounded (nlist·dims + m·ksub·dsub rows); the
    * codes frame stays LAZY — it is the scan side of the serve join,
    * filtered to the loaded generation. */
  def load(): Option[(Long, Similarity.PqIndexArtifacts)] = {
    val dir =
      if (Files.exists(Paths.get(quantDir))) Some(quantDir)
      else if (Files.exists(Paths.get(s"$quantDir.__old"))) Some(s"$quantDir.__old")
      else None
    dir.flatMap { d =>
      spark.catalog.refreshByPath(d)
      val rows = spark.read.parquet(d).collect()
        .map(r => (r.getAs[Long]("version"), r.getAs[String]("kind"),
          r.getAs[Int]("a"), r.getAs[Int]("b"), r.getAs[Int]("d"),
          r.getAs[Double]("value")))
      if (rows.isEmpty) None
      else {
        val version = rows.head._1
        require(rows.forall(_._1 == version),
          s"quantizer store $quantDir holds mixed versions — rebuild the index")
        val cents = rows.filter(_._2 == "cent").groupBy(_._3).toSeq.sortBy(_._1)
          .map { case (_, rs) => rs.sortBy(_._5).map(_._6).toSeq }
        val cbs = rows.filter(_._2 == "cb").groupBy(_._3).toSeq.sortBy(_._1)
          .map { case (_, js) =>
            js.groupBy(_._4).toSeq.sortBy(_._1)
              .map { case (_, cs) => cs.sortBy(_._5).map(_._6).toSeq }
          }
        val rotRows = rows.filter(_._2 == "rot")
        val rotation =
          if (rotRows.isEmpty) None
          else Some(rotRows.groupBy(_._3).toSeq.sortBy(_._1)
            .map { case (_, rs) => rs.sortBy(_._5).map(_._6).toSeq })
        // the persisted assignment geometry (kind='mode': a = 0 flat,
        // a = w two-level); absent on pre-mode generations
        val assignMode: Option[Option[Int]] = rows.find(_._2 == "mode")
          .map(r => if (r._3 <= 0) None else Some(r._3))
        spark.catalog.refreshByPath(codesDir)
        val codes = spark.read.parquet(codesDir)
          .where(col("version") === version)
          .select(col("n_id"), col("cell"), col("codes"))
        Some((version, Similarity.PqIndexArtifacts(cents, cbs, Some(codes),
          residual, rotation, assignMode)))
      }
    }
  }

  /** Encode a NEW batch under the pinned artifacts and append its code
    * rows — the nightly-ingest op. ZERO training jobs: one codegen'd
    * encode pass per vector. Rows for an already-indexed id append
    * alongside the old ones (at-least-once ingest semantics — the
    * serve join's candidates dedup by (q_id, n_id) ranking, and
    * [[compact]] reclaims). */
  def append(newVecs: DataFrame): Unit = {
    val (version, art) = load().getOrElse(
      throw new IllegalStateException(s"PqIndexStore at $baseDir has no built index"))
    // a rotated index encodes appends in the same rotated coordinates
    val rvecs = art.rotation.map(Similarity.rotated(newVecs, _, vecCol))
      .getOrElse(newVecs)
    Similarity.pqEncodedBase(rvecs, art.centroids, art.codebooks, residual,
        idCol, vecCol, persistedProbePin(art))
      .select(lit(version).as("version"), col("n_id"), col("cell"), col("codes"))
      .write.mode("append").parquet(codesDir)
    spark.catalog.refreshByPath(codesDir)
  }

  /** Serve top-k from the persisted index: probe, ADC-scan the stored
    * codes, exact-rerank survivors against `corpus` (the store holds
    * codes, not vectors — full precision lives in the corpus table and
    * is only read for |queries|·rerank survivor rows). No training, no
    * encoding of the corpus — the only per-call work on the corpus
    * side is the survivors' vector lookup. */
  /** `probePrefix`: rank the probed cells on the first p dims only
    * (Matryoshka composition — p/d of the query-side probe flops; the
    * stored cells, codes, and exact rerank stay full-width, and the
    * exhaustive config is bit-for-bit unchanged). The store's persisted
    * assignment geometry still pins HOW cells are probed; the prefix
    * only narrows WHAT the ranking reads. Refused on an OPQ-rotated
    * store: rotation balances variance ACROSS dims (its whole job), so
    * the first p rotated dims are an arbitrary ~p/d-variance projection,
    * not the front-loaded MRL prefix the recall curve was measured on —
    * serving would silently degrade well below [[Similarity.dimPrefixRecall]]. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           nprobe: Int = 4, rerank: Int = 50,
           probePrefix: Option[Int] = None): DataFrame =
    topKWith(loadedArt(), corpus, queries, k, nprobe, rerank, probePrefix)

  private def loadedArt(): Similarity.PqIndexArtifacts =
    load().getOrElse(
      throw new IllegalStateException(
        s"PqIndexStore at $baseDir has no built index"))._2

  /** [[topK]] against artifacts already in hand — so a multi-round
    * caller ([[filteredTopK]]'s escalation ladder) pays the quantizer
    * load once, not once per round. */
  private def topKWith(art: Similarity.PqIndexArtifacts,
                       corpus: DataFrame, queries: DataFrame, k: Int,
                       nprobe: Int, rerank: Int,
                       probePrefix: Option[Int]): DataFrame = {
    require(probePrefix.isEmpty || art.rotation.isEmpty,
      s"PqIndexStore at $baseDir is OPQ-rotated: probePrefix ranks cells on " +
        "the first p ROTATED dims, which carry no front-loaded (Matryoshka) " +
        "structure — serve full-width, or build an unrotated store for " +
        "prefix serving.")
    // a rotated index serves in rotated coordinates (dots/cosines are
    // preserved, so ranks and the exact rerank are unchanged)
    val (c, q) = art.rotation match {
      case Some(r) => (Similarity.rotated(corpus, r, vecCol),
        Similarity.rotated(queries, r, vecCol))
      case None => (corpus, queries)
    }
    Similarity.ivfPqTopK(c, q, k,
      nlist = art.centroids.length, nprobe = nprobe, m = art.codebooks.length,
      ksub = art.codebooks.head.length, rerank = rerank, iters = iters,
      idCol = idCol, vecCol = vecCol, residual = residual, index = Some(art),
      superProbe = persistedProbePin(art), probePrefix = probePrefix)
  }

  /** Metadata-filtered serve from the persisted index: the k nearest
    * AMONG corpus rows satisfying `predicate` — the Post-filter shape
    * where a SHARED index genuinely earns its keep. §G20 (BASELINE.md)
    * measured [[Similarity.filteredTopK]]'s recompute arms and Pre
    * (filter-then-assign) dominates there at every selectivity, because
    * Post re-assigns the full corpus per call; HERE the assignments and
    * codes are already on disk, so Post's serve cost is the probe +
    * ADC scan + an ids-only semi-join — no per-predicate index pass at
    * all, one store answering every filter.
    *
    * Shape: probe [[topK]] for a selectivity-sized shortlist (exact-
    * reranked to its full depth, so survivor order is true sim order),
    * semi-join the survivor id set, renumber. The first shortlist is
    * sized UP FRONT from measured selectivity s — shortK =
    * max(oversample·k, ⌈2k/s⌉), i.e. expected survivors ≥ 2k — so a
    * sharp predicate is answered in ONE round instead of starving and
    * ladder-climbing (§G20 measured the naive oversample·k start at
    * 49.7 s for a 2% predicate at 20k vectors — every query starved
    * through the ladder — vs one right-sized round; this is the same
    * default-footgun class as the r10 curation Exact default). The
    * measurement is one counting scan of the predicate columns;
    * callers at corpus scale pass `selectivityHint` (or `autoSize =
    * false` for the raw oversample·k start) and skip the scan.
    *
    * Residual starvation (cell-probe misses, local survivor deserts)
    * still ESCALATES: shortK ×4 and nprobe ×2 (capped at nlist) per
    * round, `escalations` rounds max, starved queries re-answered
    * wholesale — never mixed with their discarded partial rows. After
    * the last round, still-starved queries either return short
    * (default — the latency-bounded contract, rows are true survivors
    * in true order) or, with `bruteFinal = true`, fall back to exact
    * brute force over the filtered corpus (opt-IN: at mild selectivity
    * that is a corpus-sized scan — the caller must choose it knowingly;
    * at the sharp selectivities that actually starve, survivors are few
    * and brute is cheap). The starvation detector is one |queries|-row
    * count per round; escalation rounds touch ONLY the starved queries.
    *
    * Exactness envelope: at `nprobe` = nlist, `rerank` ≥ |corpus| and
    * shortK ≥ |corpus| the shortlist is the full exact ranking —
    * output ≡ brute force over the filtered corpus bit-for-bit.
    * `rerank` ≤ 0 (default) auto-sizes to the round's shortK so the
    * shortlist is always exact-reranked end-to-end. `rerank` > 0 is a
    * FLOOR, not a cap: each round raises it to max(rerank, shortK) so
    * survivor order stays exact — a partially-reranked shortlist would
    * interleave ADC-approximate and exact scores and the post-filter
    * top-k would no longer be the true top-k of the shortlist. NOTE
    * the consequence for latency-pinned callers: with `autoSize` the
    * first shortK is ⌈2k/s⌉ (selectivity-sized, capped at
    * Int.MaxValue/8), so a small pinned rerank can be raised to a
    * near-corpus-sized exact rerank at sharp selectivities; to bound
    * rerank work, bound shortK itself (`autoSize = false` +
    * `oversample`), not the rerank floor. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   predicate: org.apache.spark.sql.Column,
                   nprobe: Int = 4, oversample: Int = 8, rerank: Int = 0,
                   escalations: Int = 2, bruteFinal: Boolean = false,
                   autoSize: Boolean = true,
                   selectivityHint: Option[Double] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    require(escalations >= 0, s"escalations must be >= 0, got $escalations")
    require(selectivityHint.forall(s => s > 0.0 && s <= 1.0),
      s"selectivityHint must be in (0, 1], got $selectivityHint")
    val art = loadedArt()
    val nCells = art.centroids.length
    // shared once: every escalation rung's postFilterTopK re-uses this
    // frame (survivor semi-join + starvation count) — without the
    // checkpoint each rung would re-run the full predicate scan, the
    // same per-round waste class as the quantizer reloads removed in
    // r12. EAGER (r14, the §G16 race sweep + ADVICE r13): the first
    // rung's action consumes it from TWO plan sites (the survivor
    // semi-join and the starvation count, potentially on
    // broadcast-exchange threads) — exactly the lazy-checkpoint
    // getOrCompute race class.
    val keepIds = graft.ops.Checkpoints.shared(
      corpus.where(predicate).select(col(idCol).as("n_id")), eager = true)
    // ×4 headroom before Int overflow so the escalation ladder can
    // always take its next step
    val ShortKCap = Int.MaxValue / 8
    val baseShortK = math.multiplyExact(oversample, k)
    val measured: Option[(Long, Long)] =
      if (autoSize && selectivityHint.isEmpty)
        Some(Similarity.predicateCounts(corpus, predicate))
      else None
    // fewer survivors than k: NO shortlist depth can ever fill a query,
    // so the whole ladder would run to exhaustion for a provably-short
    // answer — brute over the < k-row survivor set IS the exact answer,
    // for less than one probe round
    measured match {
      case Some((_, nk)) if nk < k =>
        return Similarity.bruteForceTopK(corpus.where(predicate), queries,
          k, idCol, vecCol)
      case _ => ()
    }
    val shortK0 =
      if (!autoSize) baseShortK
      else {
        val s = selectivityHint.getOrElse {
          val (n, nk) = measured.get
          if (n == 0L) 1.0 else nk.toDouble / n.toDouble
        }
        math.max(baseShortK,
          math.min(math.ceil(2.0 * k / s), ShortKCap.toDouble).toInt)
      }
    def round(qs: DataFrame, shortK: Int, np: Int, left: Int): DataFrame = {
      val shortlist = topKWith(art, corpus, qs, shortK,
        nprobe = math.min(np, nCells),
        rerank = if (rerank > 0) math.max(rerank, shortK) else shortK,
        probePrefix = None)
      if (left > 0)
        Similarity.postFilterTopK(shortlist, keepIds, qs, k, topUp = true,
          idCol) { starved =>
          round(starved, math.min(shortK.toLong * 4, ShortKCap.toLong).toInt,
            math.min(math.multiplyExact(np, 2), nCells), left - 1)
        }
      else if (bruteFinal)
        Similarity.postFilterTopK(shortlist, keepIds, qs, k, topUp = true,
          idCol) { starved =>
          Similarity.bruteForceTopK(corpus.where(predicate), starved, k,
            idCol, vecCol)
        }
      else
        Similarity.postFilterTopK(shortlist, keepIds, qs, k, topUp = false,
          idCol)(identity)
    }
    round(queries, shortK0, nprobe, escalations)
  }

  /** The probe/assignment pin for a LOADED generation: the geometry
    * persisted at build time, never the handle's (possibly newer)
    * default resolution — stored cell assignments are only meaningful
    * under the geometry that created them (the same invariant
    * [[graft.streaming.StreamingVecNearDup]] pins with `FlatAssign`).
    * A handle that EXPLICITLY pins a conflicting geometry is a config
    * error and fails loudly; `superProbe = None` (AUTO) silently honors
    * the store. Pre-mode generations (no recorded geometry) fall back
    * to the handle's resolution with a WARN — rebuild/retrain records
    * the mode. */
  private def persistedProbePin(art: Similarity.PqIndexArtifacts): Option[Int] =
    art.assignMode match {
      case Some(stored) =>
        if (superProbe.isDefined) {
          val handleRes =
            Similarity.resolveSuperProbe(art.centroids.length, superProbe)
          require(handleRes == stored,
            s"PqIndexStore at $baseDir was built with assignment geometry " +
              s"${stored.fold("flat")(w => s"two-level(width=$w)")} but this " +
              s"handle explicitly pins " +
              s"${handleRes.fold("flat")(w => s"two-level(width=$w)")} — " +
              s"probing a store with a different geometry than built it " +
              s"silently degrades recall. Drop the superProbe arg (AUTO " +
              s"honors the store) or retrain under the new geometry.")
        }
        stored.orElse(Similarity.FlatAssign)
      case None =>
        log.warn(s"PqIndexStore at $baseDir has no persisted assignment " +
          s"geometry (pre-mode generation) — resolving from the handle " +
          s"config; rebuild or retrain to record the mode")
        superProbe
    }

  /** Compact the codes store's per-batch slivers and drop rows from
    * superseded generations (maintenance-window op). Keeps
    * `version >= committed`, not `= committed` — a concurrent build's
    * newer rows sit behind the version pin and must survive (same
    * contract as the maintenance sweep's codes prune). */
  def compact(maxFiles: Int = 8): Boolean = {
    val keep = load().map(_._1)
    keep.exists { version =>
      if (!Files.exists(Paths.get(codesDir))) false
      else {
        spark.catalog.refreshByPath(codesDir)
        val live = spark.read.parquet(codesDir).where(col("version") >= version)
        val tmp = s"$codesDir.__compact"
        live.coalesce(math.max(1, maxFiles)).write.mode("overwrite").parquet(tmp)
        val old = s"$codesDir.__oldc"
        graft.sources.TierStore.deleteTree(new java.io.File(old))
        Files.move(Paths.get(codesDir), Paths.get(old))
        Files.move(Paths.get(tmp), Paths.get(codesDir))
        graft.sources.TierStore.deleteTree(new java.io.File(old))
        spark.catalog.refreshByPath(codesDir)
        true
      }
    }
  }

  /** Audit the CURRENT generation's cell occupancy — build rows plus
    * everything [[append]]ed since. This is the drift check §G4
    * motivates: Lloyd absorbs corpus skew at TRAIN time (the measured
    * head cell on a 13%-head-cluster corpus is 0.74%), so the regime
    * where one Voronoi cell silently goes quadratic is a persisted
    * quantizer serving data it was not trained on — i.e. skew
    * accumulated through appends. [[build]] runs this once at train
    * time; a deployment re-runs it from the maintenance window (cost:
    * one (cell, count) aggregate over the codes store, ≤ nlist rows to
    * the driver) and retrains at a larger nlist when `drifted` — a
    * serve-time re-key is deliberately not offered, because stored
    * assignments would disagree with it. None before the first build. */
  def audit(hotCellFactor: Double = Similarity.DefaultHotCellFactor): Option[PqIndexStore.CellAudit] =
    load().map { case (version, art) =>
      cellAuditOf(version, art.centroids.length, hotCellFactor,
        "PqIndexStore.audit", art.centroids)
    }

  /** [[audit]], with the result APPENDED to the audit-history store
    * (`audits/` — one tiny row per run, keyed by generation + a dense
    * per-generation sequence number). §G11's key reading: on a
    * zipf-clustered corpus the binary `drifted` flag fires even at a
    * fresh build (head cells poke past a mean-relative cap), so the
    * actionable maintenance signal is the TREND across recorded
    * audits, not the level — see [[driftTrend]]. */
  def recordAudit(hotCellFactor: Double = Similarity.DefaultHotCellFactor): Option[PqIndexStore.CellAudit] = {
    // ONE load: auditing then re-loading for the version would let a
    // concurrent retrain commit in between and mislabel the recorded
    // row's generation
    val out = load().map { case (version, art) =>
      (version, cellAuditOf(version, art.centroids.length, hotCellFactor,
        "PqIndexStore.recordAudit", art.centroids))
    }
    // read-max-then-append is only safe single-writer: two concurrent
    // recordAudit calls could both read max=k and both append seq=k+1,
    // making driftTrend's orderBy(seq desc).limit(2) nondeterministic.
    // Serialize per audit store: the JVM-wide lock (keyed by path)
    // covers threads in one driver; the OS file lock extends the
    // guard across DRIVERS sharing one store path (round-11: the
    // previously documented-only contract, now enforced wherever the
    // filesystem supports locking — local disk and NFSv4 do; object
    // stores don't, which is why [[driftTrend]] also detects the
    // duplicate-seq symptom on read).
    out.foreach { case (version, a) =>
      PqIndexStore.auditLock(auditsDir).synchronized {
       PqIndexStore.withFileLock(auditsDir) {
        val seq =
          if (!Files.exists(Paths.get(auditsDir))) 0L
          else {
            spark.catalog.refreshByPath(auditsDir)
            // mergeSchema: audit dirs written before round 9 hold
            // 8-column files (no eff_dim_e6); without it parquet
            // resolves ONE file's footer and the newer column can be
            // intermittently invisible
            spark.read.option("mergeSchema", "true").parquet(auditsDir)
              .agg(max(col("seq"))).head()
              .getAs[Any](0) match {
                case null => 0L
                case n: Long => n + 1L
              }
          }
        import spark.implicits._
        // eff_dim_formula versions the eff_dim_e6 SEMANTICS (2 =
        // centered energies, the r10 formula; rows without the column
        // — pre-r10 8-col or r10 9-col files, NULL under mergeSchema —
        // are raw-second-moment or unknown). eff_dim_e6 is comparable
        // across rows ONLY within one formula version; [[driftTrend]]
        // itself never ratios it (cap/ppr only), so the column exists
        // for external trend readers, which must group by it.
        Seq((seq, version, a.nCells, a.total, a.maxCell, a.cap, a.hotCells,
          a.projectedPairs, a.effDimE6, 2L))
          .toDF("seq", "version", "n_cells", "total", "max_cell", "cap",
            "hot_cells", "projected_pairs", "eff_dim_e6", "eff_dim_formula")
          .coalesce(1).write.mode("append").parquet(auditsDir)
        spark.catalog.refreshByPath(auditsDir)
       }
      }
    }
    out.map(_._2)
  }

  /** The cross-run drift TREND over the last two recorded audits: how
    * the max-cell/cap ratio and the per-row projected candidate
    * volume moved. `trending` fires when either grows past
    * `growthFactor` — the alert a maintenance job should page on
    * (§G11: the drifted-append state moved projected pairs 3.5× for
    * 2× rows while a healthy append moves both ≈ 1×). None until two
    * audits are recorded. Reading the two newest rows costs one tiny
    * scan of the single-file audit store. */
  def driftTrend(growthFactor: Double = 1.25): Option[PqIndexStore.DriftTrend] = {
    if (!Files.exists(Paths.get(auditsDir))) return None
    spark.catalog.refreshByPath(auditsDir)
    // mergeSchema: see recordAudit — mixed 8/9-column audit files
    val audits = spark.read.option("mergeSchema", "true").parquet(auditsDir)
    // duplicate-seq detector over the WHOLE (tiny, one-row-per-audit)
    // history: rows sharing a seq mean the store was appended by
    // concurrent unguarded writers (possible only on filesystems where
    // withFileLock degraded). A duplicate ANYWHERE poisons ordering —
    // orderBy(seq desc).limit(2) would return an arbitrary one of the
    // twins whenever the window slides over it — so refuse loudly
    // instead of paging on garbage, however deep the duplicate sits.
    val dupSeq = audits.groupBy("seq").count().where(col("count") > 1)
      .select("seq").collect().map(_.getLong(0))
    if (dupSeq.nonEmpty)
      throw new IllegalStateException(
        s"audit store $auditsDir holds duplicate seq rows " +
          s"(${dupSeq.sorted.mkString(", ")}) - concurrent recordAudit " +
          "writers corrupted the history; rebuild the audit dir and run " +
          "recordAudit from one maintenance job")
    val last2 = audits.orderBy(col("seq").desc).limit(2).collect()
    if (last2.length < 2) return None
    def ratio(r: org.apache.spark.sql.Row): (Double, Double) = {
      val maxCell = r.getAs[Long]("max_cell").toDouble
      val cap = math.max(1L, r.getAs[Long]("cap")).toDouble
      val total = math.max(1L, r.getAs[Long]("total")).toDouble
      (maxCell / cap, r.getAs[Double]("projected_pairs") / total)
    }
    val (curCap, curPpr) = ratio(last2(0))
    val (prevCap, prevPpr) = ratio(last2(1))
    val capGrowth = if (prevCap > 0) curCap / prevCap else 1.0
    val pprGrowth = if (prevPpr > 0) curPpr / prevPpr else 1.0
    Some(PqIndexStore.DriftTrend(capGrowth, pprGrowth,
      capGrowth > growthFactor || pprGrowth > growthFactor))
  }

  /** Whether a RETRAIN of this store should enable `opqRotate` —
    * §G12's decision rule, wired into the lifecycle instead of left as
    * a manual judgment: true when the committed generation is already
    * rotated (the spectrum of rotated centroids reads balanced BECAUSE
    * the rotation balanced it — the cloud was flagged once, and
    * un-rotating a flagged cloud would hand the recall back), or when
    * the committed centroids' effective-dimension share reads
    * anisotropic ([[PqIndexStore.effDimShareE6]] <
    * [[PqIndexStore.RotationEffDimThresholdE6]]). False before the
    * first build. */
  def rotationAdvised(): Boolean = load().exists { case (_, art) =>
    art.rotation.isDefined ||
      PqIndexStore.effDimShareE6(art.centroids) <
        PqIndexStore.RotationEffDimThresholdE6
  }

  private def auditsDir = s"$baseDir/audits"

  private def cellAuditOf(version: Long, nlistEff: Int, factor: Double,
                          opName: String,
                          cents: Seq[Seq[Double]] = Nil): PqIndexStore.CellAudit = {
    spark.catalog.refreshByPath(codesDir)
    val counts = spark.read.parquet(codesDir)
      .where(col("version") === version)
      .groupBy("cell").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val target = math.max(Similarity.HotCellMinTarget,
      math.ceil(total.toDouble / math.max(nlistEff, 1)).toLong)
    val cap = math.ceil(factor * target).toLong
    val hot = counts.count(_._2 > cap)
    if (hot > 0)
      log.warn(Similarity.hotCellDiagnostic(opName, counts, nlistEff, cap) +
        " For a persisted index the re-balance lever is retraining at a" +
        " larger nlist (nlist ∝ n keeps E|cell| constant) with sampleInit" +
        " (hash-sampled Lloyd seeds — first-k init cannot seed appended" +
        " mass), not a serve-time re-key.")
    PqIndexStore.CellAudit(counts.size, total,
      if (counts.isEmpty) 0L else counts.values.max, cap, hot,
      counts.values.map(c => c.toDouble * (c.toDouble - 1) / 2).sum,
      PqIndexStore.effDimShareE6(cents))
  }
}

object PqIndexStore {

  /** The §G11 maintenance response as ONE call, with §G12's rotation
    * rule wired in: open the store at `baseDir`, decide `opqRotate`
    * from the COMMITTED generation ([[PqIndexStore.rotationAdvised]] —
    * anisotropic centroid spectrum, or already rotated), then build a
    * new generation over `corpus` in the retrain configuration
    * (sampleInit — first-k init provably cannot seed appended id
    * ranges; auto trainCap; nlist regrown ∝ n when `nlist ≤ 0`). The
    * swap is the usual atomic two-rename commit; superseded code rows
    * are reclaimed by [[PqIndexStore.compact]] / the maintenance sweep.
    * Returns the store handle and the committed version. */
  def retrain(spark: SparkSession, baseDir: String, corpus: DataFrame,
              nlist: Int = 0, m: Int = 8, ksub: Int = 16,
              residual: Boolean = false, iters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              superProbe: Option[Int] = None): (PqIndexStore, Long) = {
    val prior = new PqIndexStore(spark, baseDir, nlist, m, ksub, residual,
      iters, idCol, vecCol, superProbe)
    val rotate = prior.rotationAdvised()
    val store =
      if (!rotate) prior
      else new PqIndexStore(spark, baseDir, nlist, m, ksub, residual,
        iters, idCol, vecCol, superProbe, opqRotate = true)
    (store, store.build(corpus))
  }

  /** AUTO trainCap regime (trainCap < 0): the training sample holds
    * ~this many vectors per centroid — the published FAISS guidance
    * (k-means gains nothing past ~50-250 points/centroid; at 10⁹
    * vectors training on everything prices each Lloyd iteration as a
    * full-corpus aggregate for no recall gain). */
  val AutoTrainPerCentroid = 50

  /** Per-audit-store write lock: serializes [[PqIndexStore.recordAudit]]'s
    * read-max-then-append so concurrent calls can't mint duplicate seq
    * values. JVM-wide via the shared [[graft.sources.TierStore.pathLock]]
    * registry, guarding threads within one driver; [[withFileLock]]
    * extends the guard across drivers on lock-capable filesystems. */
  private[ops] def auditLock(dir: String): Object =
    graft.sources.TierStore.pathLock(dir)

  /** Cross-PROCESS mutual exclusion for the audit append: a blocking
    * OS file lock on `<dir>.lock` held for the read-max-then-append
    * critical section. Two drivers sharing one store path on a
    * lock-capable filesystem (local disk, NFSv4) serialize here; on
    * filesystems without advisory locking the lock() call itself
    * fails and we degrade (loudly, via WARN) to the documented
    * single-driver contract — the read-side duplicate-seq detector in
    * [[PqIndexStore.driftTrend]] still refuses a store two unguarded
    * writers corrupted. Callers must already hold [[auditLock]]: the
    * JVM-wide monitor prevents the OverlappingFileLockException two
    * threads of ONE process would otherwise get from the OS lock. */
  private[graft] def withFileLock[T](dir: String)(body: => T): T = {
    val lockPath = Paths.get(dir + ".lock")
    Option(lockPath.getParent).foreach(Files.createDirectories(_))
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.lock()
        catch {
          case e: java.io.IOException =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"no advisory locking on $lockPath (${e.getMessage}); " +
                "multi-driver recordAudit is unguarded here - " +
                "single-driver contract applies")
            null
        }
      try body
      finally if (lock != null) lock.release()
    } finally ch.close()
  }

  /** The committed quantizer generation sitting beside a `codes/` leaf
    * — the quantizer dir, else its `__old` fallback (the mid-swap
    * crash window [[PqIndexStore.load]] honors); None when neither is
    * readable. Lets the fleet-wide maintenance sweep prune superseded
    * code generations without instantiating the store: retrain swaps
    * the quantizer atomically but appends codes per generation, so
    * without pruning the codes store grows ×(retrain count) while
    * reads only ever touch `version = committed`. */
  def committedVersionBeside(spark: SparkSession, codesDir: String): Option[Long] = {
    val base = Option(new java.io.File(codesDir).getParent).getOrElse(".")
    Seq(s"$base/quantizer", s"$base/quantizer.__old")
      .find(d => Files.exists(Paths.get(d)))
      .flatMap { d =>
        spark.catalog.refreshByPath(d)
        try spark.read.parquet(d).select("version").head(1).headOption
          .map(_.getLong(0))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      }
  }

  /** One generation's cell-occupancy report: `drifted` is the retrain
    * signal ([[PqIndexStore.audit]]); `projectedPairs` is the
    * Σ C(|cell|,2) candidate bound a pair build over these cells would
    * face — the quantity the hot-cell WARN names. `effDimE6` is the
    * committed generation's variance-spectrum diagnostic (effective-
    * dimension share of the centroid matrix, [[effDimShareE6]]):
    * [[anisotropic]] is §G12's decision input — an anisotropic cloud is
    * the regime where plain PQ wastes codewords and a retrain should
    * enable `opqRotate` (measured +0.215 recall@10 at ksub 16). */
  final case class CellAudit(nCells: Int, total: Long, maxCell: Long,
                             cap: Long, hotCells: Int, projectedPairs: Double,
                             effDimE6: Long = 1000000L) {
    def drifted: Boolean = hotCells > 0
    def anisotropic: Boolean = effDimE6 < RotationEffDimThresholdE6
  }

  /** Below this effective-dimension share (×10⁶) the centroid spectrum
    * is concentrated enough that OPQ rotation is advised (§G12: the
    * e^(−d/16) real-embedding spectrum measures ~0.2-0.3 here; balanced
    * synthetic clouds ~0.8-1.0). */
  val RotationEffDimThresholdE6 = 500000L

  /** Effective-dimension share of a centroid matrix, ×10⁶: the
    * participation ratio (Σ_d E_d)² / (dims · Σ_d E_d²) of the per-
    * dimension CENTERED energies E_d = Σ_c (c_d − mean_d)² — 1.0 when
    * variance is spread evenly across dims (rotation buys nothing,
    * §G12's balanced rows), → 1/dims when one dimension carries
    * everything. Centering matters (ADVICE r9): raw second moments let
    * a non-zero cloud MEAN dominate the energies, so a balanced-
    * variance corpus whose mean concentrates in a few dims would read
    * anisotropic (spurious opqRotate) and a spread-out mean could mask
    * real variance decay — the rotation decision is about where the
    * VARIANCE lives, which is what PQ codewords spend bits on.
    * Driver-side over the (nlist × dims) centroid matrix the store
    * already holds — the audit needs NO corpus pass; Lloyd centroids
    * inherit the cloud's spectrum. */
  def effDimShareE6(cents: Seq[Seq[Double]]): Long = {
    if (cents.isEmpty || cents.head.isEmpty) return 1000000L
    val dims = cents.head.length
    val mean = new Array[Double](dims)
    cents.foreach { row =>
      var d = 0
      while (d < dims) { mean(d) += row(d); d += 1 }
    }
    var d0 = 0
    while (d0 < dims) { mean(d0) /= cents.length; d0 += 1 }
    val energy = new Array[Double](dims)
    cents.foreach { row =>
      var d = 0
      while (d < dims) {
        val c = row(d) - mean(d)
        energy(d) += c * c; d += 1
      }
    }
    val s = energy.sum
    val s2 = energy.map(e => e * e).sum
    if (s <= 0 || s2 <= 0) 1000000L
    else math.round(s * s / (dims.toDouble * s2) * 1e6)
  }

  /** Growth of the two §G11 drift signals between the last two
    * recorded audits: `maxCapGrowth` = (max_cell/cap)ᵗ ÷ (…)ᵗ⁻¹,
    * `pairsPerRowGrowth` the same for Σ C(|cell|,2)/total. A healthy
    * append holds both near 1; drifted mass moves them together. */
  final case class DriftTrend(maxCapGrowth: Double, pairsPerRowGrowth: Double,
                              trending: Boolean)
}
