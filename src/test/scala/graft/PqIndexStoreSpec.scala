package graft

import java.nio.file.Files

import graft.ops.{PqIndexStore, Similarity}
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index: build-once/serve-many semantics, the
  * zero-training serve contract (asserted by JOB COUNT, not by reading
  * the code), encode-only append, restart durability, and compaction.
  */
class PqIndexStoreSpec extends SparkSpec {

  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vecs = Array.fill(400)(Array.fill(64)(rnd.nextGaussian().toFloat))
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
      .localCheckpoint()
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"pqindex_$tag").toString

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Spark jobs launched while `body` runs, measured through a job
    * group + status tracker (polled to quiescence — the status store
    * is fed asynchronously). */
  private def jobsDuring[T](group: String)(body: => T): (T, Int) = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel = false)
    val out = try body finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(group).length
    var spins = 0
    while (cur != last && spins < 50) {
      Thread.sleep(100); last = cur
      cur = sc.statusTracker.getJobIdsForGroup(group).length
      spins += 1
    }
    (out, cur)
  }

  test("serve from a persisted index: zero training jobs, exact-config parity") {
    val dir = tmpDir("serve")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    val queries = emb.where(col("vec_id") < 20)
    // exact configuration (all cells probed, rerank ≥ corpus) must equal
    // brute force — through the persisted codes
    val served = store.topK(emb, queries, k = 5, nprobe = 16, rerank = 1000000)
    assert(rows(served) == rows(Similarity.bruteForceTopK(emb, queries, 5)))
    // the serve call builds its plan WITHOUT training: the only eager
    // work is the bounded quantizer read (collect) — a fresh ivfPqTopK
    // call runs two Lloyd loops plus guard counts on the same corpus
    val (_, serveJobs) = jobsDuring("pq_serve") {
      store.topK(emb, queries, k = 5, nprobe = 16, rerank = 1000000)
    }
    val (_, freshJobs) = jobsDuring("pq_fresh") {
      Similarity.ivfPqTopK(emb, queries, k = 5, nlist = 16, nprobe = 16,
        rerank = 1000000)
    }
    assert(serveJobs <= 3,
      s"serve-plan construction ran $serveJobs jobs — training leaked into the serve path")
    assert(freshJobs > serveJobs,
      s"fresh call ran $freshJobs jobs vs serve $serveJobs — job-count probe is broken")
  }

  test("filtered serve: exact config ≡ brute over survivors; escalation; short-return; no-index refusal") {
    val dir = tmpDir("fserve")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    val queries = emb.where(col("vec_id") < 10)
    // mild predicate at the exactness envelope: nprobe = nlist,
    // oversample·k = 400 ≥ |corpus|, rerank auto = shortK
    val mild = col("vec_id") % 2 === 0
    val bruteMild = rows(Similarity.bruteForceTopK(emb.where(mild), queries, 5))
    assert(rows(store.filteredTopK(emb, queries, k = 5, predicate = mild,
      nprobe = 16, oversample = 80)) == bruteMild)
    // sharp predicate (4 survivors in 400): the DEFAULT autoSize start
    // right-sizes the first shortlist from measured selectivity
    // (shortK = max(3, ⌈2·3/0.01⌉) = 600 ≥ |corpus|) and answers in
    // one round — the §G20 fix for the starved-ladder regime
    val sharp = col("vec_id") % 100 === 0
    val bruteSharp = rows(Similarity.bruteForceTopK(emb.where(sharp), queries, 3))
    // rerank pinned exhaustive so EVERY round's shortlist is the exact
    // global ranking prefix (rerank auto = shortK would exact-rerank
    // only the ADC head — a query that stops starving in an early round
    // would then return ADC-distorted picks, not the true survivors)
    assert(rows(store.filteredTopK(emb, queries, k = 3, predicate = sharp,
      nprobe = 16, oversample = 1, rerank = 1000000))
      == bruteSharp, "autoSized first round did not recover brute")
    // selectivityHint replaces the counting scan, same sizing
    assert(rows(store.filteredTopK(emb, queries, k = 3, predicate = sharp,
      nprobe = 16, oversample = 1, rerank = 1000000,
      selectivityHint = Some(0.01))) == bruteSharp,
      "hinted sizing diverged from the measured one")
    // the escalation ladder alone (autoSize off): every query starves
    // at shortK = 3; four escalations reach shortK = 768 ≥ |corpus|
    // at exhaustive nprobe, so the result must recover brute
    assert(rows(store.filteredTopK(emb, queries, k = 3, predicate = sharp,
      nprobe = 16, oversample = 1, rerank = 1000000, escalations = 4,
      autoSize = false)) == bruteSharp,
      "escalation ladder did not recover the brute result")
    // bruteFinal recovers it with NO escalation rounds
    assert(rows(store.filteredTopK(emb, queries, k = 3, predicate = sharp,
      nprobe = 16, oversample = 1, rerank = 1000000, escalations = 0,
      bruteFinal = true, autoSize = false)) == bruteSharp,
      "bruteFinal arm diverged from brute")
    // short-return contract: emitted pairs are true survivors in true
    // order, ranks contiguous from 1 within each query
    val short = store.filteredTopK(emb, queries, k = 3, predicate = sharp,
        nprobe = 16, oversample = 1, rerank = 1000000, escalations = 0,
        autoSize = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(short.length < bruteSharp.size, "sharp fixture did not starve")
    assert(short.map(t => (t._1, t._3)).toSet
      .subsetOf(bruteSharp.map(t => (t._1, t._3))))
    short.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"non-contiguous ranks for query $q")
    }
    // a store with no built index refuses loudly
    val empty = new PqIndexStore(spark, tmpDir("fserve_empty"))
    intercept[IllegalStateException] {
      empty.filteredTopK(emb, queries, k = 3, predicate = mild)
    }
  }

  test("append encodes only the batch; restart re-opens the same generation") {
    val dir = tmpDir("append")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    val v1 = store.build(emb.where(col("vec_id") < 300))
    // nightly batch: encode-only (no training at any width)
    val (_, appendJobs) = jobsDuring("pq_append") {
      store.append(emb.where(col("vec_id") >= 300))
    }
    // quantizer read + one encode-write pass (+ a refresh) — far below
    // a training loop's job count
    assert(appendJobs <= 4, s"append ran $appendJobs jobs — training leaked into ingest")
    // the grown index answers over the full corpus, exact config
    val queries = emb.where(col("vec_id") % 40 === 0)
    val served = store.topK(emb, queries, k = 5, nprobe = 16, rerank = 1000000)
    assert(rows(served) == rows(Similarity.bruteForceTopK(emb, queries, 5)))
    // restart: a NEW instance over the same dir resumes the same
    // generation and returns identical results
    val reopened = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    val (v2, _) = reopened.load().get
    assert(v2 == v1, "restart lost the committed generation")
    assert(rows(reopened.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(served))
    // retrain (= rebuild) commits a NEW generation; old code rows are
    // structurally invisible and compaction reclaims them
    val v3 = reopened.build(emb)
    assert(v3 != v1)
    assert(rows(reopened.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(served))
    assert(reopened.compact(maxFiles = 2))
    spark.catalog.refreshByPath(reopened.codesPath)
    val codes = spark.read.parquet(reopened.codesPath)
    assert(codes.select("version").distinct().count() == 1)
    assert(codes.count() == 400)
    assert(rows(reopened.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(served))
  }

  test("residual-mode store round-trips the IVFADC geometry") {
    val dir = tmpDir("resid")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16,
      residual = true)
    store.build(emb)
    val queries = emb.where(col("vec_id") < 10)
    val served = store.topK(emb, queries, k = 5, nprobe = 16, rerank = 1000000)
    assert(rows(served) == rows(Similarity.bruteForceTopK(emb, queries, 5)))
    // mode mismatch is an error, not garbage distances
    val (_, art) = store.load().get
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, queries, 5, nprobe = 16, rerank = 1000000,
        residual = false, index = Some(art))
    }
    assert(ex.getMessage.contains("residual"))
  }

  test("audit flags drift accumulated through appends; clean before") {
    import spark.implicits._
    val dir = tmpDir("audit")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    val before = store.audit().get
    assert(before.total == 400L && before.nCells <= 16)
    assert(!before.drifted,
      s"balanced build reported drift: $before")
    // drift: append 4× the corpus, every vector a near-copy of ONE
    // build vector — all land in that vector's cell (the quantizer
    // cannot re-balance data it was not trained on)
    val base = emb.where(col("vec_id") === 0)
      .collect().head.getSeq[Float](1).toArray
    val rnd = new scala.util.Random(77)
    val skew = (0 until 1600).map { i =>
      (1000L + i, base.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    store.append(skew)
    val after = store.audit().get
    assert(after.total == 2000L)
    assert(after.drifted, s"appended skew not flagged: $after")
    // the hot cell holds (at least) the whole appended batch, far over
    // the cap, and the projected candidate volume names the quadratic
    assert(after.maxCell >= 1600L && after.maxCell > after.cap, s"$after")
    assert(after.projectedPairs >= 1600.0 * 1599 / 2, s"$after")
    // audit is read-only: the serve path still answers from the store
    val queries = emb.where(col("vec_id") < 5)
    assert(store.topK(emb, queries, k = 3, nprobe = 4, rerank = 1000000)
      .count() > 0)
    // NOTE a retrain cannot heal THIS fixture: 1600 near-copies at
    // cosine ≥ 0.9999 are duplicate mass (one Voronoi site wins them
    // all at any nlist) — the lever for copies is the vec near-dup
    // pipeline, not the quantizer. Distribution drift, which retrain
    // DOES heal, is the next spec.
  }

  test("audit → retrain(sampleInit) → swap heals distribution drift end-to-end") {
    import spark.implicits._
    val dir = tmpDir("heal")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    assert(!store.recordAudit().get.drifted)
    // a single recorded audit has no trend yet
    assert(store.driftTrend().isEmpty)
    // distribution drift: 1500 vectors in ONE cluster at the §G4-like
    // geometry (member↔center cosine ≈ 0.89, member↔member ≈ 0.8,
    // norms matching the corpus) whose mass the build corpus did not
    // contain — the cluster collapses into one A-trained Voronoi cell
    val rnd = new scala.util.Random(99)
    val center = {
      val c = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(8.0 * _ / n)
    }
    val drift = (0 until 1500).map { i =>
      (5000L + i, center.map(x => (x + 0.5 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
      .localCheckpoint()
    store.append(drift)
    val drifted = store.recordAudit().get
    assert(drifted.total == 1900L)
    assert(drifted.drifted, s"appended cluster mass not flagged: $drifted")
    // the TREND across the two recorded audits is the §G11 maintenance
    // signal: drifted mass moves max/cap and pairs-per-row together
    val trendUp = store.driftTrend().get
    assert(trendUp.trending, s"drift trend did not fire: $trendUp")
    assert(trendUp.maxCapGrowth > 1.25 && trendUp.pairsPerRowGrowth > 1.0,
      s"$trendUp")
    // the maintenance response the WARN names: retrain on the full
    // corpus, nlist regrown ∝ n, HASH-SAMPLED init (first-k init never
    // seeds a centroid inside the appended id range, so Lloyd could
    // not split the new mass no matter how far nlist grows)
    val full = emb.union(drift).localCheckpoint()
    val nlist2 = Similarity.suggestNlist(1900, targetCellSize = 64)
    val retrained = new PqIndexStore(spark, dir, nlist = nlist2,
      m = 8, ksub = 16, iters = 2, sampleInit = true)
    val v2 = retrained.build(full)
    assert(retrained.load().get._1 == v2, "retrain did not swap the generation")
    val healed = retrained.recordAudit().get
    assert(healed.total == 1900L)
    assert(!healed.drifted, s"retrain left drift: $healed")
    // the post-retrain audit reads BELOW the drifted one — the trend
    // de-escalates (same history store across the instance restart)
    val trendDown = retrained.driftTrend().get
    assert(!trendDown.trending, s"healed trend still firing: $trendDown")
    assert(trendDown.maxCapGrowth < 1.0, s"$trendDown")
    // recall restored bit-for-bat under the exhaustive config through
    // the NEW generation's codes
    val q2 = full.where(col("vec_id") % 400 === 0)
    assert(rows(retrained.topK(full, q2, k = 5, nprobe = nlist2,
        rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(full, q2, 5)))
  }

  test("two-level build assignment: full super coverage equals flat bit-for-bit; pruned stays exact at exhaustive serve") {
    val queries = emb.where(col("vec_id") < 20)
    // nlist 16 → ⌈√16⌉ = 4 super-cells; probing all 4 scans every
    // centroid, so the hierarchical build must reproduce the flat build
    // EXACTLY: same cells, same codes, same serve answers
    val flatDir = tmpDir("hier_flat")
    val hierDir = tmpDir("hier_full")
    val flatStore = new PqIndexStore(spark, flatDir, nlist = 16, m = 8, ksub = 16)
    flatStore.build(emb)
    val fullStore = new PqIndexStore(spark, hierDir, nlist = 16, m = 8, ksub = 16,
      superProbe = Some(4))
    fullStore.build(emb)
    def codeRows(s: PqIndexStore) = {
      spark.catalog.refreshByPath(s.codesPath)
      spark.read.parquet(s.codesPath)
        .select("n_id", "cell", "codes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.get(2))).toSet
    }
    assert(codeRows(fullStore) == codeRows(flatStore),
      "full-coverage two-level build diverged from the flat build")
    assert(rows(fullStore.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(flatStore.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)))
    // the PRUNED configuration (the 10⁶-vector build shape): cell
    // assignment is approximate, but the exhaustive serve probes every
    // cell, so correctness cannot depend on which cell a vector landed in
    val prunedDir = tmpDir("hier_pruned")
    val pruned = new PqIndexStore(spark, prunedDir, nlist = 16, m = 8, ksub = 16,
      superProbe = Some(2))
    pruned.build(emb)
    assert(rows(pruned.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(emb, queries, 5)))
  }

  test("maintenance sweep prunes superseded code generations behind the committed version") {
    val dir = tmpDir("sweepgen")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb.where(col("vec_id") < 300))
    store.append(emb.where(col("vec_id") >= 300))
    // two retrains: each swaps the quantizer and strands the previous
    // generation's code rows (reads pin version = committed)
    store.build(emb)
    val v3 = store.build(emb)
    spark.catalog.refreshByPath(store.codesPath)
    assert(spark.read.parquet(store.codesPath).select("version")
      .distinct().count() == 3, "fixture should hold three generations")
    val queries = emb.where(col("vec_id") % 40 === 0)
    val before = rows(store.topK(emb, queries, 5, nprobe = 16, rerank = 1000000))
    val swept = graft.streaming.StoreCompaction.sweep(spark, dir, maxFiles = 1)
    assert(swept.exists(_.endsWith("codes")), s"sweep skipped the codes store: $swept")
    spark.catalog.refreshByPath(store.codesPath)
    val codes = spark.read.parquet(store.codesPath)
    assert(codes.select("version").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(v3), "superseded generations survived the sweep")
    assert(codes.count() == 400)
    assert(rows(store.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) == before,
      "sweep changed serve output")
    // an IN-FLIGHT build's newer rows sit behind the version pin (codes
    // write first, quantizer commits second) — the prune must keep
    // them, or a concurrent sweep would hollow out the build it races
    import spark.implicits._
    val future = v3 + 1000L
    Seq((future, 9999L, 0, 0L)).toDF("version", "n_id", "cell", "codes")
      .coalesce(1).write.mode("append").parquet(store.codesPath)
    assert(graft.streaming.StoreCompaction.sweep(spark, dir, maxFiles = 1)
      .exists(_.endsWith("codes")))
    spark.catalog.refreshByPath(store.codesPath)
    val after = spark.read.parquet(store.codesPath)
    assert(after.where(col("version") === future).count() == 1L,
      "sweep dropped an in-flight build's pinned rows")
    assert(after.where(col("version") === v3).count() == 400L)
  }

  test("sampled training (trainCap) still serves exactly at the exhaustive config") {
    val dir = tmpDir("traincap")
    // Lloyd sees only 64 hash-sampled vectors; the encode pass sees all
    // 400 — the exhaustive config is artifact-independent, so serve
    // must still equal brute force bit-for-bit
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16,
      superProbe = Some(4), trainCap = 64)
    store.build(emb)
    spark.catalog.refreshByPath(store.codesPath)
    assert(spark.read.parquet(store.codesPath).count() == 400,
      "encode pass must cover the full corpus, not the training sample")
    val queries = emb.where(col("vec_id") < 20)
    assert(rows(store.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(emb, queries, 5)))
  }

  test("OPQ-rotated store: rotation persists, serve/append re-enter rotated coordinates") {
    val dir = tmpDir("opq")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16,
      opqRotate = true)
    store.build(emb.where(col("vec_id") < 300))
    val (_, art) = store.load().get
    assert(art.rotation.isDefined, "rotation did not persist with the quantizer")
    // orthogonality survives the parquet round trip
    val r = art.rotation.get
    for (i <- 0 until r.length; j <- 0 until r.length) {
      val d = (0 until r.length).map(k => r(k)(i) * r(k)(j)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RtR[$i][$j] = $d")
    }
    // append encodes in the SAME rotated coordinates; a fresh instance
    // (restart) serves exactly at the exhaustive config — rotation
    // preserves cosine, so brute force over RAW vectors is the truth
    store.append(emb.where(col("vec_id") >= 300))
    val reopened = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16,
      opqRotate = true)
    val queries = emb.where(col("vec_id") % 40 === 0)
    assert(rows(reopened.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(emb, queries, 5)))
  }

  test("anisotropy-aware retrain: flagged spectrum retrains WITH rotation and recall recovers vs the unrotated retrain") {
    import spark.implicits._
    // the e^(−d/16) decaying spectrum real embedding models produce —
    // the §G12 regime where plain PQ at ksub 16 wastes codewords
    val rnd = new scala.util.Random(77)
    def anisoVec() =
      Array.tabulate(64)(d => (rnd.nextGaussian() * math.exp(-d / 16.0)).toFloat)
    def frame(ids: Range) = ids.map(i => (i.toLong, anisoVec().toSeq))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
      .localCheckpoint()
    val base = frame(0 until 3000)
    val dir = tmpDir("anisoretrain")
    val store = new PqIndexStore(spark, dir, nlist = 32, m = 8, ksub = 16)
    store.build(base)
    // the committed centroid spectrum carries the cloud's decay — the
    // wired §G12 decision input fires (and reads in the recorded audit)
    assert(store.rotationAdvised(), "anisotropic spectrum not flagged")
    val audited = store.recordAudit().get
    assert(audited.anisotropic, s"audit eff-dim not anisotropic: $audited")
    // ...and does NOT fire on the balanced-variance fixture
    val balDir = tmpDir("anisobal")
    val balStore = new PqIndexStore(spark, balDir, nlist = 16, m = 8, ksub = 16)
    balStore.build(emb)
    assert(!balStore.rotationAdvised(), "balanced spectrum falsely flagged")
    assert(!balStore.recordAudit().get.anisotropic)
    // drift: append more anisotropic mass, then run the one-call
    // maintenance response — rotation decided FROM the store, not by hand
    val drift = frame(3000 until 4000)
    store.append(drift)
    val full = base.union(drift).localCheckpoint()
    val (healed, v2) = PqIndexStore.retrain(spark, dir, full, nlist = 32,
      m = 8, ksub = 16)
    assert(healed.load().get._1 == v2)
    assert(healed.load().get._2.rotation.isDefined,
      "retrain did not enable rotation on the flagged cloud")
    // a second retrain stays rotated (rotated centroids read balanced
    // BECAUSE the rotation balanced them — the rule must not un-rotate)
    assert(healed.rotationAdvised(), "rotated store lost the rotation advice")
    // recall vs the counterfactual UNROTATED retrain at the same pruned
    // config: the rotation recovers recall on this spectrum (§G12
    // measured +0.215 @ ksub 16; everything here is seeded and
    // deterministic, so the comparison is stable)
    val unrotDir = tmpDir("anisounrot")
    val unrot = new PqIndexStore(spark, unrotDir, nlist = 32, m = 8, ksub = 16,
      iters = 2)
    unrot.build(full)
    val queries = full.where(col("vec_id") % 40 === 0).localCheckpoint()
    val truth = rows(Similarity.bruteForceTopK(full, queries, 10))
    def recall(s: PqIndexStore): Double = {
      val got = s.topK(full, queries, k = 10, nprobe = 4, rerank = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(truth.map(t => (t._1, t._3))).size.toDouble / truth.size
    }
    val rRot = recall(healed)
    val rFlat = recall(unrot)
    assert(rRot > rFlat + 0.02,
      s"rotated retrain recall $rRot did not beat unrotated $rFlat")
  }

  test("hard negatives from a persisted quantizer: zero training, exhaustive ≡ exact") {
    import spark.implicits._
    val labeled = emb.withColumn("label", (col("vec_id") % 5).cast("int"))
      .localCheckpoint()
    val dir = tmpDir("hardneg")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(labeled)
    val art = store.load().get._2
    val queries = labeled.where(col("vec_id") < 20)
    // plan construction with pinned centroids runs only the hot-cell
    // counts probe — no Lloyd loop
    val (df, jobs) = jobsDuring("hn_pinned") {
      Similarity.hardNegatives(labeled, queries, k = 5,
        nlist = Some(art.centroids.length), nprobe = art.centroids.length,
        centroids = Some(art.centroids))
    }
    assert(jobs <= 3,
      s"pinned mining plan ran $jobs jobs — training leaked into the serve path")
    // exhaustive probe equals the exact brute-force arm
    assert(rows(df) == rows(Similarity.hardNegatives(labeled, queries, k = 5)))
  }

  test("persisted assignment geometry pins appends/serves across handles; conflicting explicit pin fails") {
    // nlist ≥ AutoSuperProbeNlist is the hazard regime: a store built
    // FLAT there, reopened by a DEFAULT-config handle, must keep flat
    // geometry — the auto-superProbe default must resolve at build
    // time only, never retroactively against persisted codes
    assert(300 >= Similarity.AutoSuperProbeNlist)
    val dir = tmpDir("geom")
    val base = emb.where(col("vec_id") < 300)
    val batch = emb.where(col("vec_id") >= 300)
    val builder = new PqIndexStore(spark, dir, nlist = 300, m = 8, ksub = 16,
      superProbe = Similarity.FlatAssign)
    val v = builder.build(base)
    // the resolved mode is persisted with the quantizer
    val art0 = builder.load().get._2
    assert(art0.assignMode.contains(None), s"expected recorded flat mode, got ${art0.assignMode}")
    // reopen with a DEFAULT handle (superProbe = None → AUTO, which at
    // nlist 300 would resolve two-level) and append: the new codes'
    // cells must be the FLAT assignment, bit-for-bit
    val defaultHandle = new PqIndexStore(spark, dir, nlist = 300, m = 8, ksub = 16)
    defaultHandle.append(batch)
    val art = defaultHandle.load().get._2
    val appended = spark.read.parquet(defaultHandle.codesPath)
      .where(col("version") === v && col("n_id") >= 300)
      .select("n_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def expectedUnder(pin: Option[Int]) =
      Similarity.pqEncodedBase(batch, art.centroids, art.codebooks,
          residual = false, "vec_id", "embedding", pin)
        .select("n_id", "cell", "codes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val flatExpected = expectedUnder(Similarity.FlatAssign)
    assert(appended == flatExpected,
      "default-config append diverged from the store's persisted flat geometry")
    // counterfactual: the auto two-level assignment DOES differ here,
    // so the equality above is load-bearing, not vacuous
    assert(expectedUnder(Some(Similarity.AutoSuperProbeWidth)) != flatExpected,
      "two-level assignment coincides with flat — the pin is untested at this size")
    // serve through the default handle ≡ serve through an explicitly
    // flat handle (and the exhaustive config stays exact)
    val queries = emb.where(col("vec_id") < 20)
    val flatHandle = new PqIndexStore(spark, dir, nlist = 300, m = 8, ksub = 16,
      superProbe = Similarity.FlatAssign)
    assert(rows(defaultHandle.topK(emb, queries, 5, nprobe = 300, rerank = 1000000)) ==
      rows(flatHandle.topK(emb, queries, 5, nprobe = 300, rerank = 1000000)))
    assert(rows(defaultHandle.topK(emb, queries, 5, nprobe = 300, rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(emb, queries, 5)))
    // a handle that EXPLICITLY pins the conflicting geometry fails
    // loudly instead of silently mixing assignments
    val conflicting = new PqIndexStore(spark, dir, nlist = 300, m = 8, ksub = 16,
      superProbe = Some(2))
    val e = intercept[IllegalArgumentException] { conflicting.append(batch) }
    assert(e.getMessage.contains("geometry"))
    intercept[IllegalArgumentException] {
      conflicting.topK(emb, queries, 5, nprobe = 300, rerank = 1000000)
    }
  }

  test("probePrefix serve: exhaustive config bit-for-bit; pruned config returns full top-k per query") {
    val dir = tmpDir("prefix")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    val queries = emb.where(col("vec_id") < 20)
    // exhaustive envelope: every cell probed regardless of the prefix
    // ranking, so the narrow-probe serve equals the full-width serve
    // (and brute force) exactly
    val full = store.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)
    val pref = store.topK(emb, queries, 5, nprobe = 16, rerank = 1000000,
      probePrefix = Some(16))
    assert(rows(pref) == rows(full))
    assert(rows(pref) == rows(Similarity.bruteForceTopK(emb, queries, 5)))
    // pruned config: a well-formed result (k rows per query), recall
    // governed by the prefix curve (measured in dimPrefixRecall specs)
    val pruned = store.topK(emb, queries, 5, nprobe = 4, rerank = 50,
      probePrefix = Some(16))
    val perQ = pruned.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQ.nonEmpty && perQ.forall(_ == 5L))
    // an OPQ-rotated store refuses prefix serving: the first p ROTATED
    // dims carry no Matryoshka structure (rotation balances variance)
    val rdir = tmpDir("prefixrot")
    val rstore = new PqIndexStore(spark, rdir, nlist = 16, m = 8, ksub = 16,
      opqRotate = true)
    rstore.build(emb)
    val e = intercept[IllegalArgumentException] {
      rstore.topK(emb, queries, 5, nprobe = 4, rerank = 50,
        probePrefix = Some(16))
    }
    assert(e.getMessage.contains("OPQ-rotated"), e.getMessage)
  }

  test("pre-mode generation (no recorded geometry) still loads and serves via the handle config") {
    val dir = tmpDir("geomlegacy")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    // simulate a pre-round-10 quantizer: strip the mode row in place
    val quantDir = s"$dir/quantizer"
    val legacy = spark.read.parquet(quantDir).where(col("kind") =!= "mode")
      .collect()
    val schema = spark.read.parquet(quantDir).schema
    val tmp = s"$quantDir.__legacy"
    spark.createDataFrame(java.util.Arrays.asList(legacy: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    graft.sources.TierStore.deleteTree(new java.io.File(quantDir))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(quantDir))
    spark.catalog.refreshByPath(quantDir)
    val reopened = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    val art = reopened.load().get._2
    assert(art.assignMode.isEmpty)
    // legacy fallback: handle-config resolution, exactly the old
    // behavior — the exhaustive config still serves exact
    val queries = emb.where(col("vec_id") < 20)
    assert(rows(reopened.topK(emb, queries, 5, nprobe = 16, rerank = 1000000)) ==
      rows(Similarity.bruteForceTopK(emb, queries, 5)))
  }

  test("audit writers collide safely: concurrent recorders mint distinct seqs; a duplicate-seq store refuses driftTrend") {
    import spark.implicits._
    val dir = tmpDir("auditlock")
    val store = new PqIndexStore(spark, dir, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    // four concurrent recorders (the two-writer collision, doubled):
    // the JVM monitor + the OS file lock serialize read-max-then-
    // append, so the seqs must come out dense 0..3 — any duplicate
    // means the critical section leaked
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map(_ => new Thread(() =>
      try store.recordAudit()
      catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"recorder threw: ${errs.peek()}")
    val auditsDir = s"$dir/audits"
    spark.catalog.refreshByPath(auditsDir)
    val seqs = spark.read.option("mergeSchema", "true").parquet(auditsDir)
      .select("seq").collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(0L, 1L, 2L, 3L), s"seq allocation raced: $seqs")
    // r11 rows carry the eff_dim formula version (2 = centered energies)
    assert(spark.read.parquet(auditsDir)
      .where(col("eff_dim_formula") === 2L).count() == 4L)
    assert(store.driftTrend().isDefined)
    // hand-corrupt the history with a duplicate max seq — the state
    // two UNGUARDED writers on a lock-free filesystem leave behind —
    // and the read path must refuse loudly, not page on garbage
    Seq((3L, 0L, 16, 400L, 100L, 100L, 0, 0.0, 1000000L, 2L))
      .toDF("seq", "version", "n_cells", "total", "max_cell", "cap",
        "hot_cells", "projected_pairs", "eff_dim_e6", "eff_dim_formula")
      .coalesce(1).write.mode("append").parquet(auditsDir)
    spark.catalog.refreshByPath(auditsDir)
    intercept[IllegalStateException] { store.driftTrend() }
    // ...and a duplicate BURIED below the newest rows must refuse too:
    // orderBy(seq desc).limit(2) alone would slide past it and return
    // an arbitrary twin — the detector scans the whole history
    Seq((4L, 0L, 16, 400L, 100L, 100L, 0, 0.0, 1000000L, 2L),
        (5L, 0L, 16, 400L, 100L, 100L, 0, 0.0, 1000000L, 2L))
      .toDF("seq", "version", "n_cells", "total", "max_cell", "cap",
        "hot_cells", "projected_pairs", "eff_dim_e6", "eff_dim_formula")
      .coalesce(1).write.mode("append").parquet(auditsDir)
    spark.catalog.refreshByPath(auditsDir)
    val buried = intercept[IllegalStateException] { store.driftTrend() }
    assert(buried.getMessage.contains("3"), s"buried duplicate not named: $buried")

    // the OS file lock is REAL on this filesystem, not silently
    // degraded: while withFileLock holds <audits>.lock, a second
    // channel cannot acquire it (the JVM surfaces the held lock as
    // OverlappingFileLockException; a foreign process would block);
    // after the body exits, acquisition succeeds — proof of release
    import java.nio.channels.FileChannel
    import java.nio.file.{Paths => P, StandardOpenOption => O}
    val lockPath = P.get(auditsDir + ".lock")
    PqIndexStore.withFileLock(auditsDir) {
      val probe = FileChannel.open(lockPath, O.CREATE, O.WRITE)
      try intercept[java.nio.channels.OverlappingFileLockException] {
        probe.tryLock()
      } finally probe.close()
    }
    val probe2 = FileChannel.open(lockPath, O.CREATE, O.WRITE)
    try {
      val l = probe2.tryLock()
      assert(l != null, "file lock not released after withFileLock body")
      l.release()
    } finally probe2.close()
  }

  test("PqServeStores: cached serve store equals a fresh build, one build per dir") {
    // the bench/verify serve rows answer from a once-per-(session, dir)
    // store (r13: the tier-cache convention replacing a full retrain
    // per timed invocation) — pin the two claims that make the caching
    // sound: (1) results are build-count-invariant (training is
    // bit-deterministic), (2) ensure() really is build-once
    val sfDir = "/root/testdata/sf0.001"
    graft.queries.PqServeStores.invalidate(spark)
    val s1 = graft.queries.PqServeStores.ensure(spark, sfDir)
    val s2 = graft.queries.PqServeStores.ensure(spark, sfDir)
    assert(s1 eq s2, "ensure() must reuse the already-built store")

    val embT = graft.Tables.embeddings(spark, sfDir)
    val queries = embT.where(col("vec_id") < 20)
    val fresh = new PqIndexStore(spark, tmpDir("fresh_parity"), nlist = 16,
      m = 8, ksub = 16, sampleInit = false, trainCap = 0)
    fresh.build(embT)
    // plain serve (the e_pq_index_serve shape)
    assert(rows(s1.topK(embT, queries, k = 5, nprobe = 16, rerank = 1000000)) ==
      rows(fresh.topK(embT, queries, k = 5, nprobe = 16, rerank = 1000000)),
      "cached store's topK differs from a fresh build")
    // filtered serve (the e_pq_filtered_serve shape) — same shared store
    def filtered(st: PqIndexStore) =
      st.filteredTopK(embT, queries, k = 5,
        predicate = col("label") % 3 === 1, nprobe = 16, oversample = 100)
    assert(rows(filtered(s1)) == rows(filtered(fresh)),
      "cached store's filteredTopK differs from a fresh build")
    graft.queries.PqServeStores.invalidate(spark)
  }
}
