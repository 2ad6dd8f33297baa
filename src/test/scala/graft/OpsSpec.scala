package graft

import graft.ops._
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("exact dedup partitions ids: sum of group sizes = corpus size") {
    val d = Dedup.exact(docs).agg(sum("n_dups")).collect()(0).getLong(0)
    assert(d == docs.count())
  }

  test("prefix-filtered jaccard equals the plain inverted-index join") {
    val naive = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(docs, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == naive)
  }

  test("adaptive jaccard matches on both corpus shapes and flips its plan") {
    import spark.implicits._
    // hot-shingle corpus: every doc shares one dominant phrase, so the
    // plain inverted-index join would materialize ~n²/2 candidates
    val hot = (0L until 60L).map(i => (i, s"the quick brown fox jumps over dog number $i end"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // forced-low cap → prefix path; forced-high cap → plain path
    val viaPrefix = pairSet(Dedup.jaccardPairsAdaptive(hot, k = 3, threshold = 0.5,
      maxCandidatePairs = 10L))
    val viaPlain = pairSet(Dedup.jaccardPairsAdaptive(hot, k = 3, threshold = 0.5,
      maxCandidatePairs = Long.MaxValue))
    assert(viaPrefix == viaPlain)
    // low-collision corpus (testdata): default cap picks the plain join
    // and matches the explicit plain result
    val adaptive = pairSet(Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5))
    val plain = pairSet(Dedup.jaccardPairs(docs, k = 3, threshold = 0.5))
    assert(adaptive == plain)
  }

  test("minhash LSH pairs are a subset of exact jaccard pairs (verified)") {
    val exact = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-verified pairs: ${lsh -- exact}")
    // recall on this corpus should be high (bands=8, rows=4 → ~99% at j=0.5)
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.5, s"recall ${lsh.size}/${exact.size}")
  }

  test("incremental minhash finds exactly the cross pairs of the full pair set") {
    // full-corpus exact pairs, restricted to (new ≥ 250) × (seen < 250):
    // jaccardPairs orients pairs id_a < id_b, so cross pairs have
    // id_a = seen, id_b = new — flip to the incremental orientation
    val cross = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5)
      .where(col("id_a") < 250 && col("id_b") >= 250)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    val inc = Dedup.minhashLshIncremental(
      docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250),
      numHashes = 96, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == cross, s"missing=${cross -- inc} extra=${inc -- cross}")
  }

  test("dup clusters: connected components label every node with its component min") {
    import spark.implicits._
    // two components — a 5-node chain (forces propagation beyond round 0)
    // and a disjoint pair — plus duplicate/reversed edges
    val pairs = Seq(
      (10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L),
      (70L, 60L), (60L, 70L)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 50L -> 10L,
      60L -> 60L, 70L -> 60L)
    assert(got == expect)
    // distributed path (driverEdgeCap = 0 forces it) must agree with
    // the driver union-find on the same graph
    val dist = Dedup.dupClusters(pairs, driverEdgeCap = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == expect)
    // long path: 33 nodes in a chain — pointer doubling must converge
    // well inside the round cap (diameter 32 → ≤ ~6 doubling rounds)
    val chain = (0L until 32L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainGot = Dedup.dupClusters(chain, driverEdgeCap = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(chainGot.length == 33 && chainGot.forall(_._2 == 0L))
    // and the driver path sees the same chain result
    val chainDrv = Dedup.dupClusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(chainDrv.length == 33 && chainDrv.forall(_._2 == 0L))
    // non-integral ids always take the distributed path (the driver
    // union-find needs lossless longs): string ids still cluster
    val sPairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val sGot = Dedup.dupClusters(sPairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(sGot == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    // empty pair list → empty output, no crash (cap -1 forces the
    // distributed path even at count 0; the default takes the driver path)
    assert(Dedup.dupClusters(pairs.limit(0)).isEmpty)
    assert(Dedup.dupClusters(pairs.limit(0), driverEdgeCap = -1L).isEmpty)
  }

  test("applyClusters keeps one survivor per cluster plus all singletons") {
    import spark.implicits._
    val corpus = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((10L, 20L), (20L, 30L), (60L, 70L)).toDF("id_a", "id_b")
    val kept = Dedup.applyClusters(corpus, Dedup.dupClusters(pairs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // losers 20,30,70 dropped; survivors 10,60 and the 95 singletons kept
    assert(kept == (0L until 100L).toSet -- Set(20L, 30L, 70L))
  }

  test("curation funnel is monotone and curate matches the final stage") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val (curated, funnelDf) = Curation.run(corpus, bench)
    val funnel = funnelDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(funnel.map(_._1).toSeq ==
      Seq("1_total", "2_quality", "3_exact_dedup", "4_near_dup", "5_decontaminated"))
    val counts = funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${funnel.mkString(", ")}")
    assert(counts.head == corpus.count())
    assert(curated.count() == counts.last)
    // token counts are monotone too, and zero only when docs are zero
    val toks = funnel.map(_._3)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    assert(funnel.forall { case (_, d, t) => (d == 0) == (t == 0) })
    // a never-passing quality bar empties every downstream stage
    val strict = Curation.funnel(corpus, bench, Curation.Params(minQuality = 2.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .map(x => (x._1, (x._2, x._3))).toMap
    assert(strict("2_quality") == (0L, 0L) && strict("5_decontaminated") == (0L, 0L))
  }

  test("minhash pair source: stages 1-3 unchanged, near-dup drops a subset of exact's") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    def funnelOf(p: Curation.Params) = Curation.funnel(corpus, bench, p)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = funnelOf(Curation.Params())
    val mh = funnelOf(Curation.Params(pairSource = Curation.PairSource.MinHash()))
    // the pair source only affects stage 4 onward
    for (s <- Seq("1_total", "2_quality", "3_exact_dedup"))
      assert(mh(s) == exact(s), s"stage $s perturbed by pair source")
    // banded recall < 1 ⇒ LSH finds a subset of the exact pairs ⇒ fewer
    // docs dropped ⇒ counts can only be >= the exact funnel's
    assert(mh("4_near_dup") >= exact("4_near_dup"))
    assert(mh("5_decontaminated") >= 0L)
    // at 96 hashes / 32 bands on this corpus recall is ~1: identical
    assert(mh("4_near_dup") == exact("4_near_dup"),
      s"unexpected recall loss on this corpus: ${mh("4_near_dup")} vs ${exact("4_near_dup")}")
  }

  test("auto pair source: Exact at/below the survivor threshold, MinHash above") {
    // resolution is pure and by-name: explicit sources never count
    import Curation.PairSource
    assert(Curation.resolvePairSource(PairSource.Exact,
      sys.error("counted")) == PairSource.Exact)
    assert(Curation.resolvePairSource(PairSource.MinHash(4, 2),
      sys.error("counted")) == PairSource.MinHash(4, 2))
    // boundary: survivors == threshold stays Exact, +1 flips
    assert(Curation.resolvePairSource(PairSource.Auto(10), 10L) == PairSource.Exact)
    assert(Curation.resolvePairSource(PairSource.Auto(10), 11L) ==
      PairSource.MinHash(96, 32))
    assert(Curation.resolvePairSource(PairSource.Auto(10, 48, 16), 11L) ==
      PairSource.MinHash(48, 16))

    // end-to-end both sides on the driver corpus: a threshold the
    // corpus can't reach ⇒ the funnel is bit-identical to Exact's; a
    // zero threshold ⇒ bit-identical to the explicit MinHash config's
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    def funnelOf(p: Curation.Params) = Curation.funnel(corpus, bench, p)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaExact = funnelOf(Curation.Params(pairSource = PairSource.Exact))
    val belowThreshold = funnelOf(Curation.Params(
      pairSource = PairSource.Auto(maxExactSurvivors = Long.MaxValue)))
    assert(belowThreshold == viaExact, "Auto below threshold must BE Exact")
    // the default Params() is Auto at the 100k threshold — this corpus
    // sits far below it, so the naked default is exact-recall here
    assert(funnelOf(Curation.Params()) == viaExact,
      "naked Params() must resolve to Exact on a sub-threshold corpus")
    val aboveThreshold = funnelOf(Curation.Params(
      pairSource = PairSource.Auto(maxExactSurvivors = 0L)))
    val viaMinhash = funnelOf(Curation.Params(pairSource = PairSource.MinHash()))
    assert(aboveThreshold == viaMinhash, "Auto above threshold must BE MinHash")
  }

  test("novelty gate: stage 1b drops exactly the seen docs, rest of funnel follows") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    // the %5=1 slice sits entirely inside the corpus (ids ≡ 1,6 mod 10),
    // so each of its docs re-scores novelty 0 against its own grams
    val seenSlice = docs.where(col("doc_id") % 5 === 1)
    val p = Curation.Params(minNovelty = Some(200000L),
      noveltyGrams = Some(TextAnalysis.spanGramStore(seenSlice)))
    val funnel = Curation.funnel(corpus, bench, p).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val base = Curation.funnel(corpus, bench).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(funnel.contains("1b_novelty"))
    assert(funnel("1_total") == base("1_total"))
    // every store doc is an exact re-crawl of itself → novelty 0 → dropped;
    // unseen docs may also fall under the 20% bar, so ≤ is the bound
    val seenN = seenSlice.count()
    assert(funnel("1b_novelty") <= funnel("1_total") - seenN,
      s"gate kept too many: ${funnel("1b_novelty")} of ${funnel("1_total")} with $seenN seen")
    assert(funnel("1b_novelty") > 0, "gate wiped the corpus")
    // downstream stages narrow from the gated frame
    assert(funnel("2_quality") <= funnel("1b_novelty"))
    assert(funnel("5_decontaminated") <= funnel("4_near_dup"))
    // half-configured gate refuses loudly
    intercept[IllegalArgumentException] {
      Curation.funnel(corpus, bench, Curation.Params(minNovelty = Some(1L))).collect()
    }
  }

  test("lexicon gate: stage 1c drops exactly the flagged docs, funnel monotone") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val lex = Seq("slow", "error", "crash")
    val p = Curation.Params(lexicon = Some(lex), lexiconMaxHitRate = 0.05)
    val funnel = Curation.funnel(corpus, bench, p).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(funnel.contains("1c_lexicon"))
    val flagged = TextAnalysis.lexiconFlags(corpus, lex, maxHitRate = 0.05)
      .where(col("flagged")).count()
    assert(funnel("1c_lexicon") == funnel("1_total") - flagged)
    assert(funnel("1c_lexicon") > 0, "gate wiped the corpus")
    assert(funnel("2_quality") <= funnel("1c_lexicon"))
    assert(funnel("5_decontaminated") <= funnel("4_near_dup"))
  }

  test("entropy gate: stage 1d drops exactly the low-entropy docs, funnel monotone") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val minEnt = 2500000L
    val p = Curation.Params(minEntropyE6 = Some(minEnt))
    val funnel = Curation.funnel(corpus, bench, p).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(funnel.contains("1d_entropy"))
    val dropped = TextAnalysis.tokenEntropy(corpus)
      .where(col("entropy_e6") < minEnt).count()
    assert(funnel("1d_entropy") == funnel("1_total") - dropped)
    assert(dropped > 0, "threshold never fired — fixture lost its teeth")
    assert(funnel("1d_entropy") > 0, "gate wiped the corpus")
    assert(funnel("2_quality") <= funnel("1d_entropy"))
    assert(funnel("5_decontaminated") <= funnel("4_near_dup"))
    // ungated funnel has no 1d row
    assert(!Curation.funnel(corpus, bench).collect()
      .map(_.getString(0)).contains("1d_entropy"))
  }

  test("reliable-checkpoint knob: funnel and clusters identical, checkpoint dir used") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val baseline = Curation.funnel(corpus, bench).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set(ops.Checkpoints.ReliableKey, "true")
    try {
      val reliable = Curation.funnel(corpus, bench).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(reliable == baseline)
      // the distributed closure's per-round checkpoints go reliable too
      import spark.implicits._
      val chain = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = Dedup.dupClusters(chain, driverEdgeCap = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(labels == (0L to 50L).map(_ -> 0L).toSet)
      // evidence the reliable path actually ran: RDD checkpoint files
      // landed under the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => p.toFile.isFile).count()
      assert(wrote > 0, s"no checkpoint files under $ckDir")
    } finally {
      spark.conf.unset(ops.Checkpoints.ReliableKey)
      graft.sources.TierStore.deleteTree(new java.io.File(ckDir))
    }
  }

  test("reliable checkpoints survive executor-state loss; localCheckpoint demonstrably cannot") {
    // The cliff the knob exists for: localCheckpoint stores blocks
    // non-replicated on executors WITH LINEAGE TRUNCATED, so losing
    // executor storage mid-pipeline kills the query. local[n] has no
    // executor to kill, but dropping every persisted block through the
    // BlockManager reproduces the observable state of "the executor
    // holding the blocks is gone".
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    def dropAllBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    // default mode: materialize the pipeline's shared frames, drop the
    // blocks, re-use the result frame → the truncated lineage cannot
    // recompute and the action fails (this is the documented cliff)
    val (curatedLocal, funnelLocal) = Curation.run(corpus, bench)
    val localBefore = funnelLocal.collect()
    assert(localBefore.nonEmpty)
    dropAllBlocks()
    val failed = intercept[org.apache.spark.SparkException] {
      curatedLocal.count()
    }
    assert(failed.getMessage.contains("Checkpoint block"),
      s"expected a lost-checkpoint-block failure, got: ${failed.getMessage}")

    // reliable mode: same pipeline, same block loss — the shared
    // frames re-read from the checkpoint dir's files and every
    // consumer still completes, stage for stage
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ckpt_fail").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set(ops.Checkpoints.ReliableKey, "true")
    try {
      val (curatedRel, funnelRel) = Curation.run(corpus, bench)
      val before = funnelRel.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      dropAllBlocks()
      val after = funnelRel.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(after == before, "reliable funnel changed after block loss")
      assert(curatedRel.count() == before.last._2,
        "curated corpus unreadable after block loss")
    } finally {
      spark.conf.unset(ops.Checkpoints.ReliableKey)
      graft.sources.TierStore.deleteTree(new java.io.File(ckDir))
    }
  }

  test("semantic curation: stage 6 extends the funnel and drops only cosine losers") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val (curated, funnelDf) = Curation.runWithSemantic(corpus, bench, emb)
    val funnel = funnelDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(funnel.map(_._1).toSeq == Seq("1_total", "2_quality", "3_exact_dedup",
      "4_near_dup", "5_decontaminated", "6_semantic"))
    val counts = funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(curated.count() == counts.last)
    // stages 1-5 must be identical to the text-only pipeline: the
    // semantic tail narrows, never perturbs, the text stages
    val textOnly = Curation.funnel(corpus, bench).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(funnel.init.toSeq == textOnly.toSeq)
    // survivors of stage 6 = stage-5 docs minus semanticDedup losers
    // among stage-5 survivors' embeddings
    val clean5 = Curation.curate(corpus, bench)
    val survEmb = emb.select(col("vec_id").as("doc_id"), col("embedding"))
      .join(clean5.select("doc_id"), "doc_id")
    val losers = Similarity.semanticDedup(survEmb, 0.45, "doc_id")
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    val expect = clean5.collect().map(_.getAs[Long]("doc_id")).toSet -- losers
    assert(curated.collect().map(_.getAs[Long]("doc_id")).toSet == expect)
  }

  test("curation audit: one attribution per doc, reconciles with the funnel deltas") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val audit = Curation.audit(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // a partition of the corpus: every input doc exactly once
    assert(audit.length == corpus.count())
    assert(audit.map(_._1).distinct.length == audit.length)
    // per-stage drop counts equal the funnel's consecutive deltas
    val funnel = Curation.funnel(corpus, bench).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byStage = audit.groupBy(_._2).map { case (s, g) => s -> g.length.toLong }
    funnel.zip(funnel.tail).foreach { case ((_, prev), (name, cur)) =>
      assert(byStage.getOrElse(name, 0L) == prev - cur,
        s"audit count for $name disagrees with the funnel delta")
    }
    assert(byStage.getOrElse("kept", 0L) == funnel.last._2)
    // the kept set IS the curated corpus
    val kept = audit.filter(_._2 == "kept").map(_._1).toSet
    assert(kept == Curation.curate(corpus, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet)
    // the one-build combined form returns the same three outputs
    val (cc, ff, aa) = Curation.runWithAudit(corpus, bench)
    assert(aa.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == audit.toSet)
    assert(ff.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == funnel.toSeq)
    assert(cc.collect().map(_.getAs[Long]("doc_id")).toSet == kept)
    // optional stages attribute under their own names: with an entropy
    // gate strict enough to drop SOMETHING, its stage label appears
    val withGate = Curation.audit(corpus, bench,
      Curation.Params(minEntropyE6 = Some(3000000L))).collect()
      .map(r => r.getString(1))
    assert(withGate.contains("1d_entropy"),
      s"gated audit never attributed to the entropy stage: ${withGate.distinct.toSeq}")
  }

  test("curation semantic-decontam tail: stage 7 equals the manual gate over stage-6 survivors") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val benchEmb = emb.where(col("vec_id") % 7 === 0)
    // threshold 0.25: the sf0.001 fixture (50 embeddings) has no 0.45
    // cross pairs — the oracle row pins 0.45 at sf0.01 where they exist
    val p = Curation.Params(semanticThreshold = 0.25,
      semanticIvfNlist = Some(8), semanticIvfNprobe = 8)
    val (curated, funnelDf) = Curation.runWithSemantic(corpus, bench, emb, p,
      benchEmb = Some(benchEmb))
    val funnel = funnelDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(funnel.map(_._1).toSeq == Seq("1_total", "2_quality", "3_exact_dedup",
      "4_near_dup", "5_decontaminated", "6_semantic", "7_semdecontam"))
    val counts = funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(curated.count() == counts.last)
    // stages 1-6 must be identical to the decontam-less hybrid run:
    // the tail narrows, never perturbs
    val sixStage = Curation.runWithSemantic(corpus, bench, emb, p)
    assert(funnel.init.toSeq == sixStage._2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // stage 7 = stage-6 survivors minus the semanticDecontam drop set
    // over their aligned embeddings (the exact-config batch op)
    val sem6 = sixStage._1.select("doc_id")
    val semEmb = emb.select(col("vec_id").as("doc_id"), col("embedding"))
      .join(sem6, "doc_id")
    val dropped = Similarity.semanticDecontam(semEmb,
        benchEmb.select(col("vec_id").as("doc_id"), col("embedding")),
        threshold = 0.25, nlist = 8, nprobe = 8, idCol = "doc_id")
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "fixture must decontaminate something at 0.25")
    val expect = sem6.collect().map(_.getLong(0)).toSet -- dropped
    assert(curated.collect().map(_.getAs[Long]("doc_id")).toSet == expect)
  }

  test("IVF operators degrade gracefully on empty and tiny corpora") {
    import spark.implicits._
    val none = emb.limit(0)
    val one = emb.limit(1)
    // empty corpus: no index, no pairs / neighbors — never a crash
    // (the sf0.1 curation funnel legitimately wipes every survivor,
    // and its IVF semantic tail must behave like the LSH tail did)
    assert(Similarity.ivfCentroids(none, 8).isEmpty)
    assert(Similarity.ivfNearDupPairs(none, 0.5, nlist = 8, nprobe = 4).isEmpty)
    assert(Similarity.ivfNearDupIncremental(emb, none, 0.5, nlist = 8).isEmpty)
    assert(Similarity.ivfTopK(none, emb.limit(5), k = 3).isEmpty)
    // fewer vectors than nlist/nprobe: widths clamp to the trained
    // cell count instead of tripping the probe-width require
    assert(Similarity.ivfNearDupPairs(one, 0.5, nlist = 8, nprobe = 4).isEmpty)
    assert(Similarity.ivfNearDupIncremental(emb.limit(3), one, 0.0,
      nlist = 8, nprobe = 4, assignNprobe = 4).count() >= 0)
    assert(Similarity.semanticDedup(one, 0.5, ivfNlist = Some(8), ivfNprobe = 4)
      .collect().map(_.getBoolean(1)).forall(identity))
    // the facade shape that found this: filters wipe the corpus, the
    // IVF semantic tail sees zero survivor embeddings
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val funnel = graft.ops.Curation.runWithSemantic(corpus, bench, emb,
        graft.ops.Curation.Params(minQuality = 2.0,
          semanticIvfNlist = Some(8), semanticIvfNprobe = 4))._2
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(funnel("6_semantic") == 0L && funnel("2_quality") == 0L)
    // ...and under the r11 NAKED defaults (Auto pair source + Some(0)
    // derived nlist): zero survivors must flow through suggestNlist(0)
    // and the Auto count without degenerate training or a throw
    val funnelAuto = graft.ops.Curation.runWithSemantic(corpus, bench, emb,
        graft.ops.Curation.Params(minQuality = 2.0))._2
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(funnelAuto("6_semantic") == 0L && funnelAuto("2_quality") == 0L)
  }

  test("semantic curation IVF tail: funnel equals the LSH tail's on the driver corpus") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    def funnelOf(p: Curation.Params) =
      Curation.runWithSemantic(corpus, bench, emb, p)._2.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the LSH arm is opt-in since r11 (None; the default Some(0)
    // auto-derives an IVF nlist from the survivor count)
    val viaLsh = funnelOf(Curation.Params(semanticIvfNlist = None))
    // e_ivf_near_dup's oracle-exact geometry: 4-of-8 probing catches
    // every boundary straddle on this corpus, so the facade's IVF tail
    // must reproduce the LSH tail's funnel stage for stage
    val viaIvf = funnelOf(Curation.Params(
      semanticIvfNlist = Some(8), semanticIvfNprobe = 4))
    assert(viaIvf == viaLsh,
      s"IVF semantic tail diverged:\n  lsh=$viaLsh\n  ivf=$viaIvf")
  }

  test("simhash: identical texts share signatures; hamming is sane") {
    val sig = Dedup.simhash(docs)
    assert(sig.count() == docs.count())
    // join doc 0's signature against itself → hamming 0
    val s0 = sig.where(col("id") === 0).collect()(0).getLong(1)
    val h = sig.where(col("id") === 0)
      .select(Dedup.hamming(col("simhash"), lit(s0)).cast("long")).collect()(0).getLong(0)
    assert(h == 0)
  }

  test("redaction scrubs urls, emails, digit runs with per-kind counts") {
    import graft.ops.{Sampling, TextAnalysis}
    import spark.implicits._
    val docs = Seq(
      (1L, "see https://example.com/x?u=a@b.com and mail me at jo.doe+x@corp.io or call 12345678"),
      (2L, "short 12345 is kept, 123456 is not"),
      (3L, "clean prose with nothing to hide")).toDF("doc_id", "text")
    val out = TextAnalysis.redact(docs).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "see <URL> and mail me at <EMAIL> or call <NUM>")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == ((1L, 1L, 1L)))
    assert(out(1).getString(1) == "short 12345 is kept, <NUM> is not")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) == ((0L, 0L, 1L)))
    assert(out(2).getString(1) == "clean prose with nothing to hide")

    // sampling: deterministic, stable across reruns, stratified caps hold
    val d = Tables.documents(spark, sf)
    val s1 = Sampling.hashSample(d, 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(d, 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < d.count())
    val strat = Sampling.stratifiedSample(d, "lang", 5)
    val perLang = strat.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(perLang.nonEmpty && perLang.forall(_._2 <= 5))

    // repetition: a looping doc scores 1.0, distinct prose 1/n_grams
    val rep = TextAnalysis.ngramRepetition(Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rep(0).getDouble(3) == 1.0)
    assert(rep(1).getLong(1) == 4L && rep(1).getLong(2) == 1L && rep(1).getDouble(3) == 0.25)
  }

  test("degenerate-LSH guardrail fires at low thresholds, not at real near-dup ones") {
    // threshold 0.45 degrades to few bits / many tables → diagnostic
    val (loBits, loTables) = Similarity.lshParamsFor(0.45)
    assert(loBits <= Similarity.DegenerateLshBits)
    val diag = Similarity.degenerateLshDiagnostic(1000000L, loBits, loTables)
    assert(diag.exists(m => m.contains("degenerate") && m.contains("n=1000000")))
    // threshold 0.7 has healthy-LOOKING bits but retains ~30% of all
    // pairs across its 154 tables — the round-5 scale study's 200k-vector
    // spill; the widened fraction-based trigger must catch it
    val (midBits, midTables) = Similarity.lshParamsFor(0.7)
    assert(midBits > Similarity.DegenerateLshBits)
    assert(Similarity.lshRetainedFraction(midBits, midTables) >=
      Similarity.DegenerateLshRetainedFraction)
    assert(Similarity.degenerateLshDiagnostic(200000L, midBits, midTables).nonEmpty)
    // threshold 0.85 stays under the retained-fraction bar → silent
    val (hiBits, hiTables) = Similarity.lshParamsFor(0.85)
    assert(hiBits > Similarity.DegenerateLshBits)
    assert(Similarity.degenerateLshDiagnostic(1000000L, hiBits, hiTables).isEmpty)
    // and the guarded operator's output is unchanged by the guardrail
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.45).collect()
    assert(pairs.nonEmpty)
  }

  test("adaptive near-dup: degenerate regime takes the exact block plan, healthy regime takes LSH") {
    // routing is observable from the plan: the LSH path evaluates
    // lsh_sigs, the block-partitioned exact path never does
    val low = Similarity.nearDupPairsAdaptive(emb, 0.45)
    val lowPlan = low.queryExecution.executedPlan.toString
    assert(!lowPlan.contains("lsh_sigs"), "degenerate threshold still routed to LSH")
    assert(!lowPlan.contains("CartesianProduct") &&
      !lowPlan.contains("BroadcastNestedLoopJoin"),
      "block-partitioned plan fell back to a scale-killer join")
    val hiPlan = Similarity.nearDupPairsAdaptive(emb, 0.85)
      .queryExecution.executedPlan.toString
    assert(hiPlan.contains("lsh_sigs"), "healthy threshold lost the sub-quadratic path")
    // the exact block plan and the recall-sized LSH plan agree on this
    // corpus (LSH miss probability 1e-5 ⇒ identical pair sets)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBlocks = pairs(Similarity.bruteForcePairs(emb, 0.45))
    val viaLsh = pairs(Similarity.nearDupPairs(emb, 0.45))
    assert(viaBlocks == viaLsh,
      s"block plan diverged: only-blocks=${viaBlocks -- viaLsh} only-lsh=${viaLsh -- viaBlocks}")
    // zero vectors never pair (the shared norm guard)
    import spark.implicits._
    val z = Seq((1L, Seq.fill(64)(0.0)), (2L, Seq.fill(64)(0.0)),
        (3L, Seq.tabulate(64)(i => if (i == 0) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    assert(Similarity.bruteForcePairs(z, 0.0).isEmpty)
    // the exact arm is as loud as the LSH arm: the routing WARN names
    // the quadratic shape, the replication factor, and the bounded
    // alternative (n is unknown at plan time, so no job runs to warn)
    val (loB, loT) = Similarity.lshParamsFor(0.45)
    val blockDiag = Similarity.exactBlockDiagnostic(0.45, loB, loT, blocks = 32)
    assert(blockDiag.contains("C(n,2)") && blockDiag.contains("33") &&
      blockDiag.contains("ivfNearDupPairs"))
  }

  test("IVF near-dup: exact-verified subset of brute force with high recall on planted pairs") {
    import spark.implicits._
    // seeded corpus: 360 isotropic vectors + 40 planted near-dups
    // (small perturbations of earlier vectors, cosine ≈ 0.9)
    val rnd = new scala.util.Random(77)
    val vecs = new Array[Array[Float]](400)
    (0 until 400).foreach { i =>
      vecs(i) =
        if (i >= 360) vecs(i - 360).map(x => x + 0.2f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    // ground truth by driver-side brute force
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      i <- 0 until 400; j <- (i + 1) until 400
      if cos(vecs(i), vecs(j)) >= 0.7
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.size >= 30, s"expected planted pairs, got ${truth.size}")
    val got = Similarity.ivfNearDupPairs(df, threshold = 0.7, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verify ⇒ no false positives
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // probed cells catch boundary straddles ⇒ high recall
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"IVF near-dup recall $recall < 0.9 (${got.size}/${truth.size})")
    // semantic dedup accepts the IVF pair source: at generous probing
    // the pair coverage is complete, so kept flags equal the LSH-based
    // default's
    def flags(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val viaLsh = flags(Similarity.semanticDedup(df, 0.7))
    val viaIvf = flags(Similarity.semanticDedup(df, 0.7,
      ivfNlist = Some(8), ivfNprobe = 4))
    assert(viaIvf == viaLsh)

    // ---- incremental twin: new batch (ids ≥ 300, incl. every planted
    // perturbation of a seen base) against the seen corpus (< 300) ----
    val seenDf = df.where(col("vec_id") < 300)
    val newDf = df.where(col("vec_id") >= 300)
    val crossTruth = (for {
      i <- 300 until 400; j <- 0 until 300
      if cos(vecs(i), vecs(j)) >= 0.7
    } yield (i.toLong, j.toLong)).toSet
    assert(crossTruth.size >= 30, s"expected planted cross pairs, got ${crossTruth.size}")
    val inc = Similarity.ivfNearDupIncremental(newDf, seenDf, threshold = 0.7,
        nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cross pairs only (id_a new, id_b seen), exact verify ⇒ no false
    // positives even through the classic one-cell index
    assert(inc.forall { case (a, b) => a >= 300 && b < 300 })
    assert(inc.subsetOf(crossTruth), s"false positives: ${inc -- crossTruth}")
    val incRecall = inc.size.toDouble / crossTruth.size
    assert(incRecall >= 0.9,
      s"incremental IVF recall $incRecall < 0.9 (${inc.size}/${crossTruth.size})")
    // multiple assignment (store indexed into 2 cells) can only WIDEN
    // the candidate set — a superset of the classic index's output,
    // still exact-verified
    val incWide = Similarity.ivfNearDupIncremental(newDf, seenDf, threshold = 0.7,
        nlist = 8, nprobe = 2, assignNprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.subsetOf(incWide) && incWide.subsetOf(crossTruth))

    // ---- hierarchical (two-level) probe: the assignment-cost escape
    // hatch — ⌈√nlist⌉ super-cells, scan only probed supers' members ----
    val cents = Similarity.ivfCentroids(df, 16)
    val nsuper = math.ceil(math.sqrt(16.0)).toInt
    // probing EVERY super-cell scans every centroid ⇒ the two-level
    // ranking must equal the flat probe bit for bit
    def probes(c: org.apache.spark.sql.Column) =
      df.select(col("vec_id"), c.as("p")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val flatP = probes(graft.functions.ivf_probe(col("embedding"), cents, 2))
    val hierFull = probes(graft.functions.ivf_probe_hier(col("embedding"), cents, 2, nsuper))
    assert(hierFull == flatP, "full-coverage hierarchical probe diverged from flat")
    // pruned supers (the scale configuration): exact verify keeps
    // precision 1; planted-pair recall must hold
    val hierPairs = Similarity.ivfNearDupPairs(df, threshold = 0.7, nlist = 16,
        nprobe = 2, superProbe = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hierPairs.subsetOf(truth), s"false positives: ${hierPairs -- truth}")
    val hierRecall = hierPairs.size.toDouble / truth.size
    assert(hierRecall >= 0.9,
      s"hierarchical IVF recall $hierRecall < 0.9 (${hierPairs.size}/${truth.size})")
  }

  test("SDC PQ near-dup: margin-off equals IVF-exact; pruning keeps planted recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vecs = new Array[Array[Float]](400)
    (0 until 400).foreach { i =>
      vecs(i) =
        if (i >= 360) vecs(i - 360).map(x => x + 0.2f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      i <- 0 until 400; j <- (i + 1) until 400
      if cos(vecs(i), vecs(j)) >= 0.7
    } yield (i.toLong, j.toLong)).toSet
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // margin ≥ 1 + t disables the prefilter: identical candidates and
    // identical exact verify ⇒ output equals the plain IVF operator
    val exact = pairs(Similarity.ivfNearDupPairs(df, threshold = 0.7,
      nlist = 8, nprobe = 2))
    val off = pairs(Similarity.ivfPqNearDupPairs(df, threshold = 0.7,
      nlist = 8, nprobe = 2, sdcMargin = 2.0))
    assert(off == exact)
    // pruning regime: exact verify ⇒ zero false positives; the SDC
    // margin must hold planted-pair recall
    val pruned = pairs(Similarity.ivfPqNearDupPairs(df, threshold = 0.7,
      nlist = 8, nprobe = 2, sdcMargin = 0.3))
    assert(pruned.subsetOf(truth), s"false positives: ${pruned -- truth}")
    val recall = pruned.size.toDouble / truth.size
    assert(recall >= 0.85, s"SDC recall $recall (${pruned.size}/${truth.size})")
    // degenerate corpora never crash
    assert(Similarity.ivfPqNearDupPairs(df.limit(0), 0.5).isEmpty)
    assert(Similarity.ivfPqNearDupPairs(df.limit(1), 0.5).isEmpty)
  }

  test("hot-cell guard: planted hot cluster splits, candidates re-bound, recall holds") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    // 5000 vectors, dims 32: 30% form one planted gaussian cluster
    // around base B (the hot Voronoi cell a CLUSTERED corpus hands an
    // IVF index — the regime where Σ C(|cell|,2) silently goes
    // quadratic); 50 near-dup pairs planted INSIDE the cluster.
    val dims = 32
    val n = 5000
    val rnd = new scala.util.Random(99)
    val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
    val bn = math.sqrt(base.map(x => x * x).sum).toFloat
    (0 until dims).foreach(i => base(i) /= bn)
    val vecs = new Array[Array[Float]](n)
    (0 until n).foreach { i =>
      vecs(i) =
        if (i % 10 < 3) base.map(x => x + 0.2f * rnd.nextGaussian().toFloat)
        else Array.fill(dims)(rnd.nextGaussian().toFloat)
    }
    // planted near-dups: 50 cluster ids copy an earlier cluster id
    val planted = (0 until 50).map { p =>
      val src = 10 * p        // i % 10 == 0 → cluster member
      val dst = 10 * (p + 100) // distinct cluster member
      vecs(dst) = vecs(src).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      (src.toLong, dst.toLong)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    // pinned quantizer: cell 0 = the cluster base, 63 isotropic cells —
    // deterministic hot assignment without depending on Lloyd dynamics
    val cRnd = new scala.util.Random(7)
    val cents: Seq[Seq[Double]] = Seq(base.map(_.toDouble).toSeq) ++
      Seq.fill(63)(Seq.fill(dims)(cRnd.nextGaussian()))

    // the guard detects the hot cell and its splits re-bound membership
    val probed = df.select(col("vec_id").as("id"), col("embedding").as("v"),
      explode(graft.functions.ivf_probe(col("embedding"), cents, 2)).as("cell"))
    def cellCounts(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = cellCounts(probed)
    val total = before.values.sum
    val target = math.max(Similarity.HotCellMinTarget, total / 64)
    val cap = (Similarity.DefaultHotCellFactor * target).toLong
    assert(before(0) > cap, s"fixture not hot: cell 0 holds ${before(0)}, cap $cap")
    val splits = Similarity.detectHotSplits(probed, 64, "id", "v", iters = 1,
      factor = Similarity.DefaultHotCellFactor, opName = "spec")
    assert(splits.nonEmpty && splits.head.cell == 0)
    val after = cellCounts(Similarity.applyHotSplits(probed, splits, "v", width = 1))
    assert(!after.contains(0), "hot cell id survived the re-key")
    assert(after.keys.max >= 64, "sub-cells not re-keyed past nlist")
    def projected(m: Map[Int, Long]) =
      m.values.map(c => c.toDouble * (c - 1) / 2).sum
    assert(after.values.max <= before(0) / 2,
      s"hottest after split ${after.values.max} not re-bound vs ${before(0)}")
    assert(projected(after) <= projected(before) / 2,
      s"candidate volume ${projected(after)} not re-bound vs ${projected(before)}")
    // the WARN carries the projected quadratic term
    assert(Similarity.hotCellDiagnostic("spec", before, 64, cap)
      .contains("C(|cell|,2)"))

    // recall through the guard: guard-on pairs ⊆ guard-off pairs (both
    // exact-verified; the guard only re-bounds candidates), planted
    // pairs survive, and overall recall vs the unguarded run holds
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val off = pairs(Similarity.ivfNearDupPairs(df, threshold = 0.95, nlist = 64,
      nprobe = 2, centroids = Some(cents), hotCellFactor = Double.PositiveInfinity))
    val on = pairs(Similarity.ivfNearDupPairs(df, threshold = 0.95, nlist = 64,
      nprobe = 2, centroids = Some(cents)))
    assert(on.subsetOf(off), s"guard invented pairs: ${on -- off}")
    val plantedNorm = planted.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val foundPlanted = plantedNorm.intersect(on).size.toDouble / plantedNorm.size
    assert(foundPlanted >= 0.95,
      s"planted-pair recall through the guard $foundPlanted < 0.95")
    assert(off.nonEmpty && on.size.toDouble / off.size >= 0.9,
      s"guarded recall ${on.size}/${off.size} < 0.9")

    // exhaustive configuration stays EXACT even when the guard splits:
    // nprobe = nlist probes every sub-cell of a split cell
    val qs = df.where(col("vec_id") % 500 === 0)
    def topk(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bf = topk(Similarity.bruteForceTopK(df, qs, k = 5))
    val ivf = topk(Similarity.ivfTopK(df, qs, k = 5, nlist = 64, nprobe = 64))
    assert(ivf == bf, "exhaustive ivfTopK diverged from brute force under hot split")
  }

  test("poly_hash equals the higher-order fold it replaced, row for row") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    val df = Seq("", "a", "spark table merge", "漢字 mixed", "naïve café",
      "  double  spaced  ", "p q r s t u").toDF("s")
    val hof = aggregate(
      transform(split(col("s"), ""), c => ascii(c).cast("long")),
      lit(7L),
      (acc, x) => (acc * 31 + x) % 1000000007L)
    df.select(col("s"), graft.functions.poly_hash(col("s")).as("a"), hof.as("b"))
      .collect().foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"poly_hash('${r.getString(0)}') = ${r.getLong(1)} != HOF ${r.getLong(2)}")
      }
  }

  test("gram_buckets equals the composed explode/ngrams/poly_hash path") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    val m = 512
    val df = Seq("", "solo", "two tokens", "spark table merge window scan",
      "naïve café 漢字", "a a a").toDF("text")
      .select(Dedup.tokens(col("text")).as("w"))
      .localCheckpoint()
    def sortedRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.getSeq[Int](0).sorted).toSeq
    val fused = sortedRows(df.select(graft.functions.gram_buckets(col("w"), m)))
    val composed = sortedRows(df.select(
      transform(
        filter(concat(col("w"), TextAnalysis.ngramsAll(col("w"), 2)),
          g => length(g) > 0),
        g => pmod(graft.functions.poly_hash(g), lit(m.toLong)).cast("int")).as("b")))
    assert(fused == composed, s"fused $fused != composed $composed")
  }

  test("DSIR importance weights: target-like docs outrank off-distribution docs") {
    import spark.implicits._
    // target distribution: spark-y vocabulary; raw corpus holds two
    // target-like docs, two off-distribution docs, one empty doc
    val target = Seq(
      (100L, "spark table merge spark window", "t"),
      (101L, "spark window merge table scan", "t"),
      (102L, "merge table spark scan window", "t")).toDF("doc_id", "text", "source")
    val raw = Seq(
      (1L, "spark table merge window scan", "r"),   // target-like
      (2L, "spark window table merge", "r"),        // target-like
      (3L, "zebra quokka lemur wombat okapi", "r"), // off-distribution
      (4L, "banana kiwi mango papaya", "r"),        // off-distribution
      (5L, "", "r")).toDF("doc_id", "text", "source")
    val w = Sampling.importanceWeights(raw, target, nBuckets = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // empty doc contributes no grams — absent, not zero-scored
    assert(!w.contains(5L), s"empty doc got a weight: $w")
    // gram count = tokens + bigrams = 2·n − 1 for n ≥ 2
    assert(w(1L)._1 == 9L && w(4L)._1 == 7L, s"gram counts off: $w")
    // every target-like doc outranks every off-distribution doc
    val likes = Seq(w(1L)._2, w(2L)._2)
    val offs = Seq(w(3L)._2, w(4L)._2)
    assert(likes.min > offs.max,
      s"target-like docs did not outrank: like=$likes off=$offs")
    // partitioning invariance: the quantized integer sums make the
    // score independent of how the corpus is split
    val w12 = Sampling.importanceWeights(raw.repartition(12), target.repartition(5),
      nBuckets = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w12 == w, "weights changed under repartitioning")
    // deterministic selection: top-2 is exactly the target-like pair
    val top = Sampling.importanceSelect(raw, target, k = 2, nBuckets = 512)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L), s"top-2 selection $top")
    // fit-once/serve-many parity: scoring against a persisted-model
    // frame fit on the SAME (raw, target) pair reproduces the
    // self-contained batch weights exactly
    val lam = Sampling.lambdaFrame(raw, target, nBuckets = 512)
    val served = Sampling.scoreAgainst(raw, lam, nBuckets = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(served == w, s"serve path diverged from batch weights: $served vs $w")
    // the sentinel default covers buckets neither fit corpus touched:
    // an unseen-vocabulary doc still scores (finite, negative here
    // since the raw fit corpus is smaller than none... just: finite)
    val alien = Seq((9L, "xylophone quasar", "r")).toDF("doc_id", "text", "source")
    val aw = Sampling.scoreAgainst(alien, lam, nBuckets = 512).collect()
    assert(aw.length == 1 && aw.head.getLong(1) == 3L,
      s"alien doc not scored through the sentinel: ${aw.toSeq}")
  }

  test("suggestNlist: derived nlist keeps E|cell| on target across corpus sizes") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    // the rule itself: above the floor, E|cell| = n/nlist stays within
    // (target/2, target] — constant as the corpus grows, which is the
    // whole point (Σ C(|cell|,2) then grows ∝ n, not n²)
    val target = Similarity.DefaultIvfCellTarget.toDouble
    Seq(10_000L, 100_000L, 1_000_000L, 1_000_000_000L).foreach { n =>
      val e = n.toDouble / Similarity.suggestNlist(n)
      assert(e > target / 2 && e <= target,
        s"E|cell| $e off target $target at n=$n (nlist ${Similarity.suggestNlist(n)})")
    }
    // tiny corpora floor at 16 cells (join-key parallelism, not cell size)
    assert(Similarity.suggestNlist(0) == 16 && Similarity.suggestNlist(500) == 16)

    // derived behavior: nlist ≤ 0 at an entry point ≡ the explicit rule
    // (ivfCentroids is deterministic, so the plans are identical) —
    // checked on two corpus sizes so the derivation actually moves
    def corpus(n: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(31 + n)
      (0 until n).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    }
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(400, 2000).foreach { n =>
      val df = corpus(n).localCheckpoint()
      val derived = Similarity.suggestNlist(n.toLong)
      assert(pairs(Similarity.ivfNearDupPairs(df, threshold = 0.8, nlist = 0)) ==
        pairs(Similarity.ivfNearDupPairs(df, threshold = 0.8, nlist = derived)),
        s"derived-nlist pairs diverged from the explicit rule at n=$n")
    }
    // and the derived quantizer's MEASURED mean assignment stays within
    // the rule's bounds on the larger corpus (cells can be uneven;
    // the mean over trained cells is what the rule pins)
    val big = corpus(2000).localCheckpoint()
    val cents = Similarity.ivfCentroids(big, Similarity.suggestNlist(2000L))
    val meanCell = 2000.0 / cents.length
    assert(meanCell <= target && cents.length >= 16,
      s"derived quantizer: ${cents.length} cells, mean $meanCell")
  }

  test("IVF-PQ top-k: exact configuration equals brute force; codes deterministic") {
    val queries = emb.where(col("vec_id") < 20)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // all cells probed + rerank above corpus size ⇒ ADC prunes nothing
    // and the exact re-rank IS brute force (the e_pq_topk config)
    val exact = rows(Similarity.bruteForceTopK(emb, queries, k = 5))
    val pq = rows(Similarity.ivfPqTopK(emb, queries, k = 5,
      nlist = 16, nprobe = 16, m = 8, ksub = 16, rerank = 1000000))
    assert(pq == exact)
    // codebook tensor shape m × ksub × dsub; codes pack into ONE long
    // (m=8 × 4-bit codes here) — the 8-byte scan payload the operator
    // exists for, a primitive column instead of a full float vector
    val cbs = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
    assert(cbs.length == 8 && cbs.head.length == 16 && cbs.head.head.length == 8)
    val enc = emb.repartition(7).select(col("vec_id"),
      graft.functions.pq_encode(col("embedding"), cbs).as("packed"),
      graft.functions.pq_unpack(
        graft.functions.pq_encode(col("embedding"), cbs), 8, 16).as("c"))
    assert(enc.schema("packed").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows2 = enc.collect()
    val codes = rows2.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every unpacked code addresses a real codeword
    assert(rows2.forall(_.getSeq[Int](2).forall(x => x >= 0 && x < 16)))
    // 8 codes x 4 bits fill only the low 32 bits
    assert(codes.values.forall(p => (p >>> 32) == 0L))
    // bit-deterministic under any partitioning (fixed-point Lloyd sums)
    val codes3 = emb.repartition(3).select(col("vec_id"),
        graft.functions.pq_encode(col("embedding"), cbs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes3 == codes)
  }

  test("IVF-PQ top-k: pruning config recalls planted neighbors; empty/tiny guards") {
    import spark.implicits._
    // same planted geometry as the IVF near-dup spec: 40 perturbed
    // copies whose true nearest neighbor is their source vector
    val rnd = new scala.util.Random(77)
    val vecs = new Array[Array[Float]](400)
    (0 until 400).foreach { i =>
      vecs(i) =
        if (i >= 360) vecs(i - 360).map(x => x + 0.2f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    val queries = df.where(col("vec_id") >= 360)
    def top1(d: org.apache.spark.sql.DataFrame) =
      d.where(col("rank") === 1).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val truth = top1(Similarity.bruteForceTopK(df, queries, k = 1))
    val got = top1(Similarity.ivfPqTopK(df, queries, k = 1,
      nlist = 8, nprobe = 2, m = 8, ksub = 16, rerank = 10))
    val hits = truth.count { case (q, n) => got.get(q).contains(n) }
    assert(hits.toDouble / truth.size >= 0.8,
      s"PQ top-1 recall ${hits.toDouble / truth.size} < 0.8 ($hits/${truth.size})")
    // guards mirror the flat-IVF family
    assert(Similarity.ivfPqTopK(emb.limit(0), queries, k = 3).isEmpty)
    assert(Similarity.pqCodebooks(emb.limit(0)).isEmpty)
    // tiny corpus: effective ksub clamps to the corpus size
    assert(Similarity.ivfPqTopK(emb.limit(1), emb.where(col("vec_id") < 5),
      k = 1, rerank = 5).count() >= 0)
  }

  test("IVF-PQ residual encoding beats plain encoding on clustered corpora") {
    import spark.implicits._
    // 8 tight clusters: cells align with anchors, so residuals
    // concentrate near the origin — the regime IVFADC exists for. A
    // deliberately starved codebook (ksub = 4) makes plain encoding
    // lossy enough to expose the difference.
    val rnd = new scala.util.Random(123)
    val anchors = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    // 400 cluster members (noise 0.1) + 40 probes that are NEAR-COPIES
    // (noise 0.02) of members 0..39: the probe's true NN is its source
    // at a 10x distance margin over the rest of its cluster — exactly
    // the margin plain PQ collapses (same-cluster members share codes,
    // ADC ties) and residual PQ resolves
    val members = (0 until 400).map { i =>
      anchors(i % 8).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
    }
    val probes = (0 until 40).map { i =>
      members(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    }
    val vecs = members ++ probes
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    val queries = df.where(col("vec_id") >= 400)
    def top1(d: org.apache.spark.sql.DataFrame) =
      d.where(col("rank") === 1).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val truth = top1(Similarity.bruteForceTopK(df, queries, k = 1))
    def recallOf(res: Boolean) = {
      val got = top1(Similarity.ivfPqTopK(df, queries, k = 1,
        nlist = 8, nprobe = 2, m = 8, ksub = 4, rerank = 2, residual = res))
      truth.count { case (q, n) => got.get(q).contains(n) }.toDouble / truth.size
    }
    // measured on this seeded fixture: plain 0.40, residual 1.00 — the
    // 2-bit codebook forces the gap wide open
    val plain = recallOf(res = false)
    val resid = recallOf(res = true)
    assert(resid >= plain + 0.3,
      s"residual recall $resid not clearly above plain $plain on clustered data")
    assert(resid >= 0.9, s"residual recall $resid < 0.9")
    // the exact configuration is exact in residual mode too
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(Similarity.bruteForceTopK(df, queries, k = 3))
    assert(rows(Similarity.ivfPqTopK(df, queries, k = 3, nlist = 8, nprobe = 8,
      m = 8, ksub = 16, rerank = 1000000, residual = true)) == exact)
  }

  test("mutual-kNN graph and semantic clusters recover planted structure") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vecs = new Array[Array[Float]](300)
    (0 until 300).foreach { i =>
      vecs(i) =
        if (i >= 250) vecs(i - 250).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
    // a tight perturbed copy and its source are mutual nearest
    // neighbors: the planted edge must survive mutualization
    val pairs = Similarity.mutualKnnPairs(df, k = 3, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (250 until 300).map(i => ((i - 250).toLong, i.toLong)).toSet
    val hit = planted.count(pairs.contains)
    assert(hit >= 45, s"mutual-kNN kept only $hit/50 planted edges")
    // symmetric by construction: an edge never repeats reversed
    assert(pairs.forall { case (a, b) => a < b })
    // clusters: planted source+copy land in the same component
    val cl = Similarity.semanticClusters(df, k = 3, nlist = 8, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val together = planted.count { case (a, b) =>
      cl.get(a).isDefined && cl.get(a) == cl.get(b) }
    assert(together >= 45, s"only $together/50 planted pairs share a cluster")
    // empty corpus: no graph, no clusters, never a crash
    assert(Similarity.mutualKnnPairs(df.limit(0), k = 3).isEmpty)
    assert(Similarity.semanticClusters(df.limit(0), k = 3).isEmpty)
  }

  test("BM25 top-k: hand-computed scores, matchless docs excluded") {
    import spark.implicits._
    val d = Seq((1L, "spark spark table"), (2L, "spark window"), (3L, "table merge"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(d, Seq("spark", "window"), k = 10)
      .as[(Long, Long)].collect().toSeq
    // replicate the exact expression shape: N=3, sumdl=7, avgdl=7/3
    def sE6(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log((3.0 - df + 0.5) / (df.toDouble + 0.5) + 1.0)
      val tfc = (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + (0.75 * dl.toDouble) / (7.0 / 3.0)))
      BigDecimal.valueOf(idf * tfc * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val d1 = sE6(2, 2, 3)            // spark tf 2, df 2, dl 3
    val d2 = sE6(1, 2, 2) + sE6(1, 1, 2) // spark + window, dl 2
    val expect = Seq((1L, d1), (2L, d2)).sortBy(t => (-t._2, t._1))
    assert(got == expect)
    assert(!got.exists(_._1 == 3L)) // no query term -> not retrieved
  }

  test("quality classifier training: separable signal learned, deterministic, serving separates") {
    import spark.implicits._
    val pos = (1L to 20L).map(i => (i, s"good clean prose number $i"))
      .toDF("doc_id", "text")
    val neg = (101L to 120L).map(i => (i, s"spam junk garbage item $i"))
      .toDF("doc_id", "text")
    val w1 = TextAnalysis.trainQualityClassifier(pos, neg, steps = 2)
    // bit-deterministic: identical reruns, identical weights
    val a = w1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextAnalysis.trainQualityClassifier(pos, neg, steps = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(a.exists(_._2 > 0) && a.exists(_._2 < 0))
    // serving: every positive scores above every negative, keep = s > 0
    val scored = TextAnalysis.classifierScore(pos.union(neg), w1)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val ps = scored.filter(_._1 <= 20L); val ns = scored.filter(_._1 >= 101L)
    assert(ps.map(_._2).min > ns.map(_._2).max)
    assert(ps.forall(_._3) && ns.forall(!_._3))
    // empty training sides survive
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.trainQualityClassifier(empty, empty).collect().isEmpty)
    // trainCap (r13, §G21): classes at/under the cap pass through
    // BIT-identically (one count, no gate), so the default cap cannot
    // perturb the oracle row; an over-cap class samples via the
    // deterministic hash gate — reruns identical, learned sign intact
    val wDefault = TextAnalysis.trainQualityClassifier(pos, neg, steps = 2,
      trainCap = 100000).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(wDefault == a, "under-cap training must be bit-identical to uncapped")
    val posBig = (1L to 300L).map(i => (i, s"good clean prose number $i"))
      .toDF("doc_id", "text")
    val negBig = (1001L to 1300L).map(i => (i, s"spam junk garbage item $i"))
      .toDF("doc_id", "text")
    val c1 = TextAnalysis.trainQualityClassifier(posBig, negBig, steps = 2,
      trainCap = 50).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val c2 = TextAnalysis.trainQualityClassifier(posBig, negBig, steps = 2,
      trainCap = 50).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(c1 == c2, "capped training must be deterministic")
    assert(c1 != TextAnalysis.trainQualityClassifier(posBig, negBig, steps = 2,
      trainCap = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "cap 50 over 300-doc classes should actually sample (gate inert?)")
    val scoredCap = TextAnalysis.classifierScore(posBig.union(negBig),
      spark.createDataFrame(spark.sparkContext.parallelize(
        c1.map(x => org.apache.spark.sql.Row(x._1, x._2))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("w_e6", org.apache.spark.sql.types.LongType)))))
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(scoredCap.filter(_._1 <= 300L).forall(_._2) &&
      scoredCap.filter(_._1 >= 1001L).forall(!_._2),
      "a 50-doc/class sample must still learn the separable signal")
  }

  test("BPE merges: hand-computed Sennrich corpus, deterministic ranks, early stop") {
    import spark.implicits._
    // low x5, lower x2, newest x6, widest x3 — the classic fixture
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(d, numMerges = 4).orderBy("rank")
      .as[(Long, String, String, Long)].collect().toSeq
    // pair counts: (e,s)=9 (s,t)=9 tie -> lexicographic; then (es,t)=9;
    // then (l,o)=(o,w)=7 tie; then (lo,w)=7
    assert(got == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
    // segment counts under those merges: low=1 unit, lower=3,
    // newest=4 (n e w est), widest=4 (w i d est)
    val seg = TextAnalysis.bpeSegmentCounts(d,
      got.map(m => (m._2, m._3))).as[(Long, Long, Long)].collect().head
    assert(seg == ((1L, 16L, 5L * 1 + 2 * 3 + 6 * 4 + 3 * 4)))
    // asking for far more merges than the corpus supports stops at the
    // minPairFreq floor instead of looping or crashing
    val all = TextAnalysis.bpeMerges(d, numMerges = 100)
      .as[(Long, String, String, Long)].collect()
    assert(all.length < 100 && all.forall(_._4 >= 2L))
  }

  test("dimension drift: hand-computed per-dim quantized means") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, -0.5f)), (2L, Seq(0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val b = Seq((3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimensionDrift(a, b).orderBy("dim")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.75, 0.0, 0.75),
      (1L, 2L, 1L, -0.125, 1.0, 1.125)))
  }

  test("cluster-balanced sample: nearest-centroid cells, hash-ordered picks") {
    import spark.implicits._
    val vs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.8f, 0.05f)),
      (10L, Seq(0f, 1f)), (11L, Seq(0.1f, 0.9f)), (12L, Seq(0.02f, 0.7f)))
    val df = vs.toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val got = Similarity.clusterBalancedSample(df, cents, perCell = 2)
      .orderBy("cell", "rk").as[(Long, Long, Long)].collect().toSeq
    def hv(id: Long) = (((id % 1000000007L) * 2654435761L) % 1000000007L) % 97L
    val cell0 = Seq(0L, 1L, 2L).sortBy(id => (hv(id), id)).take(2)
    val cell1 = Seq(10L, 11L, 12L).sortBy(id => (hv(id), id)).take(2)
    assert(got == (cell0.zipWithIndex.map { case (id, i) => (0L, i + 1L, id) } ++
      cell1.zipWithIndex.map { case (id, i) => (1L, i + 1L, id) }))
    // a cell never exceeds perCell even when the corpus is all one cluster
    val lop = Similarity.clusterBalancedSample(
      df.where(col("vec_id") < 3), cents, perCell = 2)
    assert(lop.groupBy("cell").count().collect().forall(_.getLong(1) <= 2))
  }

  test("edge centrality: hand-computed integer power iteration on a path graph") {
    import spark.implicits._
    // path 1—2—3: the bridge node 2 must out-rank the leaves, and every
    // iteration's floored integer arithmetic is replayed by hand
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Similarity.edgeCentrality(edges, iters = 3).orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    // i1: r1=575000 r2=1850000 r3=575000
    // i2: r1=936250 r2=1127500 r3=936250
    // i3: r1=150000+(1127500*17)div40=629187
    //     r2=150000+2*((936250*17)div20)=1741624
    assert(got == Seq((1L, 1L, 629187L), (2L, 2L, 1741624L), (3L, 1L, 629187L)))
    // order-independence: repartitioned input yields identical ranks
    val again = Similarity.edgeCentrality(edges.repartition(7), iters = 3)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("LSH top-k achieves decent recall vs brute force") {
    val queries = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.lshTopK(emb, queries, k = 5, bits = 8, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf intersect ann).size.toDouble / bf.size
    // unclustered random embeddings are LSH's worst case; just require
    // the candidate machinery to beat noise
    assert(recall >= 0.2, s"ANN recall too low: $recall")
  }

  test("IVF top-k: full probe equals brute force; pruned probe retains recall") {
    val queries = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == bf)
    val prunedPairs = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bfPairs = bf.map(t => (t._1, t._3))
    val recall = (bfPairs intersect prunedPairs).size.toDouble / bfPairs.size
    // unclustered random embeddings are the worst case for cell pruning
    assert(recall >= 0.2, s"IVF recall too low: $recall")
  }

  test("filteredTopK: all arms equal brute force over survivors at the exact config") {
    import Similarity.FilteredMode
    val pred = col("label") % 3 === 0
    val queries = emb.where(col("vec_id") < 10)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = rows(Similarity.bruteForceTopK(emb.where(pred), queries, k = 5))
    assert(brute.nonEmpty)
    // exactness envelope: nprobe = nlist, oversample·k ≥ |corpus| = 50
    def arm(m: Similarity.FilteredMode) = rows(Similarity.filteredTopK(
      emb, queries, k = 5, predicate = pred,
      nlist = 16, nprobe = 16, oversample = 20, mode = m))
    assert(arm(FilteredMode.Pre) == brute, "Pre arm diverged from brute")
    assert(arm(FilteredMode.Post) == brute, "Post arm diverged from brute")
    assert(arm(FilteredMode.Auto) == brute, "Auto arm diverged from brute")
    // the routing rule itself: Post iff selectivity >= 2/oversample
    assert(Similarity.filteredRoute(100, 50, 8) == FilteredMode.Post)
    assert(Similarity.filteredRoute(100, 25, 8) == FilteredMode.Post) // boundary
    assert(Similarity.filteredRoute(100, 10, 8) == FilteredMode.Pre)
    assert(Similarity.filteredRoute(0, 0, 8) == FilteredMode.Pre)
  }

  test("filteredTopK: starved queries top-up to the Pre arm; topUp=false returns short") {
    import Similarity.FilteredMode
    // two survivors in the whole corpus — every query starves at k = 3
    val pred = col("vec_id") % 25 === 0
    val queries = emb.where(col("vec_id") < 10)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = rows(Similarity.bruteForceTopK(emb.where(pred), queries, k = 3))
    // oversample = 1: the unfiltered top-3 shortlist cannot hold enough
    // survivors, so the top-up arm must re-answer every starved query
    val topped = rows(Similarity.filteredTopK(emb, queries, k = 3,
      predicate = pred, nlist = 16, nprobe = 16, oversample = 1,
      mode = FilteredMode.Post))
    assert(topped == brute, "top-up did not restore the brute result")
    // documented short-return: survivors that DID make the shortlist
    // keep their relative ranks; every emitted pair is a true survivor
    val short = Similarity.filteredTopK(emb, queries, k = 3,
        predicate = pred, nlist = 16, nprobe = 16, oversample = 1,
        mode = FilteredMode.Post, topUp = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(short.length <= brute.size)
    val brutePairs = brute.map(t => (t._1, t._3))
    assert(short.map(t => (t._1, t._3)).toSet.subsetOf(brutePairs))
    // ranks are contiguous from 1 within each query
    short.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"non-contiguous ranks for query $q")
    }
  }

  test("semanticDecontam: flags equal the brute cross scan; empty benchmark keeps all") {
    val corpus = emb.where(col("vec_id") % 5 =!= 0)
    val bench = emb.where(col("vec_id") % 5 === 0)
    def flags(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val got = flags(Similarity.semanticDecontam(corpus, bench, threshold = 0.45,
      nlist = 16, nprobe = 16))
    // brute cross scan (test-side oracle; the op itself never crossJoins)
    val hit = corpus.select(col("vec_id"), col("embedding").as("ce")).as("c")
      .crossJoin(bench.select(col("embedding").as("be")).as("b"))
      .where(Similarity.cosine(col("ce"), col("be")) >= 0.45)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    val want = corpus.select("vec_id").collect()
      .map(r => r.getLong(0) -> !hit(r.getLong(0))).toMap
    assert(got == want)
    assert(got.values.exists(!_), "expected at least one contaminated doc at 0.45")
    // empty benchmark: no index, everything kept, never a crash
    val none = flags(Similarity.semanticDecontam(corpus, bench.limit(0), 0.45))
    assert(none.values.forall(identity) && none.size == want.size)
    // auto-derived nlist (<= 0) trains on the benchmark side
    val auto = flags(Similarity.semanticDecontam(corpus, bench, threshold = 0.45,
      nlist = 0, nprobe = Int.MaxValue))
    assert(auto == want, "auto-nlist exhaustive probe diverged")
  }

  test("multimodal feature extraction is deterministic and typed") {
    val media = Multimodal.syntheticMedia(docs)
    assert(media.schema == Multimodal.mediaSchema ||
      media.schema.fieldNames.toSeq == Seq("media_id", "media", "meta"))
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.getInt(3) >= 0))
  }

  test("jpeg round trip: exact dims, bounded lossy error; fake decode fails the tolerance") {
    import graft.ops.Multimodal
    val docsS = Tables.documents(spark, sf).limit(40)
    val media = Multimodal.jpegMedia(docsS)
    val feats = Multimodal.jpegFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 40)
    feats.foreach { r =>
      assert(r.getInt(3) == 1, s"jpeg decode out of tolerance for ${r.getLong(0)}")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 16 && r.getLong(2) >= 1 && r.getLong(2) <= 12)
    }
    // the tolerance is an ASSERTION, not a tautology: judging the same
    // bytes against a shifted pattern (what a broken decoder that
    // returns wrong pixels looks like to the checker) must fail —
    // pixel errs would be pattern-sized, not codec-sized
    val shifted = media.withColumn("len", col("len") + lit(7))
    val bad = Multimodal.jpegFeatures(shifted).collect()
    assert(bad.exists(_.getInt(3) == 0), "tolerance check cannot fail — it asserts nothing")
  }

  test("animated gif: frame count from container, per-frame sums EXACT, interlace pinned off") {
    import graft.ops.Multimodal
    val docsS = Tables.documents(spark, sf).limit(40)
    val frames = Multimodal.gifFrameFeatures(Multimodal.gifMedia(docsS))
      .orderBy("media_id", "frame_idx").collect()
    val byId = frames.groupBy(_.getLong(0))
    val lens = docsS.selectExpr("cast(doc_id as long)", "length(text)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byId.foreach { case (id, fr) =>
      val len = lens(id); val seed = len % 256
      val (w, h) = ((len % 16) + 1, (len % 12) + 1)
      assert(fr.length == (len % 4) + 2, s"frame count for $id")
      fr.foreach { r =>
        val f = r.getInt(1)
        assert(r.getLong(2) == w && r.getLong(3) == h)
        // EXACT sum — the lossless contract; this is precisely the
        // assertion the JDK writer's default interlace path broke for
        // heights 2-4 (measured err up to 240) before gifMedia pinned
        // MODE_DISABLED, so any h in 2..4 here is a regression guard
        var want = 0L
        for (y <- 0 until h; x <- 0 until w) want += (seed + f + 31 * x + 17 * y) % 256
        assert(r.getLong(4) == want, s"frame sum for $id frame $f")
      }
    }
    // the guard is live only if the fixture actually covers the buggy heights
    assert(byId.keys.exists(id => Seq(2, 3, 4).contains((lens(id) % 12) + 1)),
      "fixture misses heights 2-4 — the interlace regression guard is inert")
  }

  test("mjpeg-avi video: container mux/demux byte round trip, frame decode within tolerance") {
    import graft.ops.Multimodal
    // 1) the muxer/demuxer pair round-trips PAYLOAD BYTES exactly —
    //    frame boundaries come from the container, so arbitrary binary
    //    (including odd lengths, which exercise RIFF even-padding)
    //    must survive verbatim
    val payloads = Seq(
      Array[Byte](1, 2, 3),                       // odd length → padded
      Array.tabulate[Byte](300)(i => (i * 7).toByte),
      Array[Byte](0x4D, 0x4A))                    // bytes that look like fourcc text
    val avi = Multimodal.writeAvi(payloads, 16, 12)
    val (declared, back) = Multimodal.readAviFrames(avi)
    assert(declared == 3)
    assert(back.map(_.toSeq) == payloads.map(_.toSeq),
      "demuxed frame payloads differ from muxed input")
    // non-AVI bytes refuse loudly
    intercept[IllegalArgumentException] {
      Multimodal.readAviFrames("not a riff container at all".getBytes)
    }
    // 2) end to end over real docs: frame count from the container,
    //    exact dims, per-pixel tolerance per frame (the jpeg contract)
    val docsS = Tables.documents(spark, sf).limit(40)
    val frames = Multimodal.videoFrameFeatures(Multimodal.aviMedia(docsS))
      .orderBy("media_id", "frame_idx").collect()
    val lens = docsS.selectExpr("cast(doc_id as long)", "length(text)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byId = frames.groupBy(_.getLong(0))
    assert(byId.keySet == lens.keySet)
    byId.foreach { case (id, fr) =>
      val len = lens(id)
      assert(fr.length == (len % 4) + 2, s"frame count for $id")
      fr.foreach { r =>
        assert(r.getLong(2) == (len % 16) + 1 && r.getLong(3) == (len % 12) + 1)
        assert(r.getInt(4) == 1, s"frame ${r.getInt(1)} of $id out of tolerance")
      }
    }
    // 3) the tolerance asserts something: judging against a shifted
    //    pattern must fail (same negative control as the jpeg test)
    val shifted = Multimodal.aviMedia(docsS).withColumn("len", col("len") + lit(7))
    assert(Multimodal.videoFrameFeatures(shifted).collect().exists(_.getInt(4) == 0),
      "video tolerance check cannot fail — it asserts nothing")
  }

  test("y4m raw video: byte-exact container round trip; per-frame sums EXACT") {
    import graft.ops.Multimodal
    // container round trip: planes survive verbatim (incl. bytes that
    // look like the FRAME marker text — plane length comes from the
    // header dims, never from scanning)
    val f0 = Array.tabulate[Byte](12)(i => (i * 37).toByte)
    val f1 = "FRAME\nFRAME\n".getBytes("US-ASCII") // 12 bytes of marker-looking data
    val y4m = Multimodal.writeY4m(Seq(f0, f1), 4, 3)
    val (w, h, back) = Multimodal.readY4m(y4m)
    assert(w == 4 && h == 3)
    assert(back.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
    intercept[IllegalArgumentException] { Multimodal.readY4m("not y4m".getBytes) }
    // truncated final frame refuses loudly
    intercept[IllegalArgumentException] {
      Multimodal.readY4m(java.util.Arrays.copyOf(y4m, y4m.length - 3))
    }
    // end to end: exact per-frame sums (the gif contract on raw video)
    val docsS = Tables.documents(spark, sf).limit(40)
    val frames = Multimodal.y4mFrameFeatures(Multimodal.y4mMedia(docsS))
      .orderBy("media_id", "frame_idx").collect()
    val lens = docsS.selectExpr("cast(doc_id as long)", "length(text)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    frames.groupBy(_.getLong(0)).foreach { case (id, fr) =>
      val len = lens(id); val seed = len % 256
      val (ww, hh) = ((len % 16) + 1, (len % 12) + 1)
      assert(fr.length == (len % 4) + 2, s"frame count for $id")
      fr.foreach { r =>
        val f = r.getInt(1)
        assert(r.getLong(2) == ww && r.getLong(3) == hh)
        var want = 0L
        for (y <- 0 until hh; x <- 0 until ww) want += (seed + f + 31 * x + 17 * y) % 256
        assert(r.getLong(4) == want, s"frame sum for $id frame $f")
      }
    }
  }

  test("mp4 (iso-bmff) video: sample-table demux round trip, frame decode within tolerance") {
    import graft.ops.Multimodal
    // 1) mux/demux round-trips payload BYTES exactly at every chunking
    //    shape — one-per-chunk, even runs, a short last chunk, and a
    //    single chunk larger than the sample count — because frames
    //    come from the stsc/stco/stsz tables, never from scanning
    //    (payload 3 spells 'ftyp' to pin that)
    val payloads = Seq(
      Array[Byte](1, 2, 3),
      Array.tabulate[Byte](300)(i => (i * 7).toByte),
      "ftyp".getBytes("US-ASCII"),
      Array.tabulate[Byte](57)(i => (i * 13).toByte),
      Array[Byte](9))
    for (spc <- Seq(1, 2, 3, 7)) {
      val mp4 = Multimodal.writeMp4(payloads, 16, 12, samplesPerChunk = spc)
      val (declared, back) = Multimodal.readMp4Frames(mp4)
      assert(declared == payloads.length, s"spc=$spc: stts total")
      assert(back.map(_.toSeq) == payloads.map(_.toSeq),
        s"spc=$spc: demuxed sample payloads differ from muxed input")
    }
    // non-BMFF and torn files refuse loudly (moov sits at the tail, so
    // a truncation loses the sample tables, not just data)
    intercept[IllegalArgumentException] {
      Multimodal.readMp4Frames("certainly not an iso-bmff file".getBytes)
    }
    val whole = Multimodal.writeMp4(payloads, 16, 12)
    intercept[IllegalArgumentException] {
      Multimodal.readMp4Frames(java.util.Arrays.copyOf(whole, whole.length / 2))
    }
    // 2) end to end over real docs: frame count from the tables, exact
    //    dims, per-pixel tolerance per frame (the video contract)
    val docsS = Tables.documents(spark, sf).limit(40)
    val frames = Multimodal.mp4FrameFeatures(Multimodal.mp4Media(docsS))
      .orderBy("media_id", "frame_idx").collect()
    val lens = docsS.selectExpr("cast(doc_id as long)", "length(text)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byId = frames.groupBy(_.getLong(0))
    assert(byId.keySet == lens.keySet)
    byId.foreach { case (id, fr) =>
      val len = lens(id)
      assert(fr.length == (len % 4) + 2, s"frame count for $id")
      fr.foreach { r =>
        assert(r.getLong(2) == (len % 16) + 1 && r.getLong(3) == (len % 12) + 1)
        assert(r.getInt(4) == 1, s"frame ${r.getInt(1)} of $id out of tolerance")
      }
    }
    // 3) negative control: the tolerance flag must be falsifiable
    val shifted = Multimodal.mp4Media(docsS).withColumn("len", col("len") + lit(7))
    assert(Multimodal.mp4FrameFeatures(shifted).collect().exists(_.getInt(4) == 0),
      "mp4 tolerance check cannot fail — it asserts nothing")
  }

  test("mu-law wav: codec bound EXHAUSTIVE over 16-bit range; container round trip; tolerance falsifiable") {
    import graft.ops.Multimodal
    // 1) the documented per-segment bound holds for EVERY 16-bit input
    //    (65536 cases — the strongest pin a lossy codec can get), and
    //    the codec is not secretly the identity: quantization must
    //    actually lose precision somewhere
    var lossy = false
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val dec = Multimodal.mulawDecode(Multimodal.mulawEncode(s.toShort)).toInt
      val err = math.abs(dec - s)
      assert(err <= Multimodal.mulawTol(s), s"mu-law error $err exceeds bound for $s")
      if (err > 0) lossy = true
      s += 1
    }
    assert(lossy, "mu-law round trip is exact everywhere — codec or bound is wrong")
    // 2) container: fact-declared count enforced, format gated, chunk
    //    walk skips foreign chunks; PCM16 WAVs refuse loudly
    val samples = Array.tabulate[Short](101)(i => ((i * 7919) % 64001 - 32000).toShort)
    val wav = Multimodal.writeWavMulaw(samples)
    val (declared, back) = Multimodal.readWavMulaw(wav)
    assert(declared == 101)
    back.zip(samples).foreach { case (d, orig) =>
      assert(math.abs(d - orig) <= Multimodal.mulawTol(orig.toInt))
    }
    intercept[IllegalArgumentException] {
      Multimodal.readWavMulaw("nothing like a riff".getBytes)
    }
    // 3) end to end + negative control (the lossy-triad contract)
    val docsS = Tables.documents(spark, sf).limit(40)
    val out = Multimodal.mulawFeatures(Multimodal.mulawMedia(docsS))
      .orderBy("media_id").collect()
    val lens = docsS.selectExpr("cast(doc_id as long)", "length(text)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.map(_.getLong(0)).toSet == lens.keySet)
    out.foreach { r =>
      assert(r.getLong(1) == (lens(r.getLong(0)) % 96) + 4, s"sample count for ${r.getLong(0)}")
      assert(r.getInt(2) == 1, s"doc ${r.getLong(0)} out of mu-law tolerance")
    }
    val shifted = Multimodal.mulawMedia(docsS).withColumn("len", col("len") + lit(17))
    assert(Multimodal.mulawFeatures(shifted).collect().exists(_.getInt(2) == 0),
      "mu-law tolerance check cannot fail — it asserts nothing")
  }

  test("resize features: fixed target dims; sums bounded by target grid") {
    import graft.ops.Multimodal
    val media = Multimodal.realMedia(Tables.documents(spark, sf).limit(30))
    val out = Multimodal.resizeFeatures(media, 8, 6, 16).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (fmt, w, h, sum) = (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (fmt == "wav") { assert(w == 16 && h == 1); assert(sum <= 16L * 1000) }
      else { assert(w == 8 && h == 6); assert(sum <= 8L * 6 * 255) }
    }
  }

  test("frame sampling produces bounded frame vectors") {
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.frameSample(media, stride = 16)
      .select(size(col("frame_bytes"))).collect().map(_.getInt(0))
    assert(frames.forall(_ >= 1))
    // the exploded scale shape is bit-identical to frameSample +
    // posexplode (same index grid, same byte extraction) — minus the
    // per-media array and the optimizer's HOF-cloning inferred filter
    val viaArray = Multimodal.frameSample(media, stride = 16)
      .select(col("media_id"),
        posexplode(col("frame_bytes")).as(Seq("frame_idx", "frame_byte")))
      .orderBy("media_id", "frame_idx").collect().map(_.toSeq).toSeq
    val viaRows = Multimodal.frameSampleRows(media, stride = 16)
      .orderBy("media_id", "frame_idx").collect().map(_.toSeq).toSeq
    assert(viaRows == viaArray)
  }

  test("unigram log-prob: hand-computed MLE means, empty docs drop") {
    import spark.implicits._
    // corpus: a:2 b:2 c:1, total 5
    // ln(2/5)*1e6 → -916291, ln(1/5)*1e6 → -1609438
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(d).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got == Seq(
      (1L, 3L, r4(3 * -916291L / 1e6 / 3)),
      (2L, 2L, r4((-916291L - 1609438L) / 1e6 / 2))))
  }

  test("intra-doc line dedup: keep-first, blanks preserved, idempotent") {
    import spark.implicits._
    val text = "menu\nhello world\nmenu\n\nMENU \nbody\n\nhello  world"
    val got = TextAnalysis.dedupLines(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().head
    // 8 lines; dropped: pos-3 "menu", pos-5 "MENU " (normalizes to
    // "menu"), pos-8 "hello  world"; both blank lines survive
    assert(got == ((1L, 8L, 3L, "menu\nhello world\n\nbody\n")))
    val again = TextAnalysis.dedupLines(
      Seq((1L, got._4)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().head
    assert(again._3 == 0L && again._4 == got._4)
  }

  test("source overlap: hand-computed matrix incl. zero-overlap pair") {
    import spark.implicits._
    val d = Seq(
      (1L, "srcA", "alpha beta"), (2L, "srcA", "gamma"), (3L, "srcA", "ALPHA   beta"),
      (4L, "srcB", "alpha beta"), (5L, "srcB", "delta"),
      (6L, "srcC", "epsilon")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(d).orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // srcA's distinct norms are {alpha beta, gamma} — doc 3 normalizes
    // into doc 1; the A∩B overlap is the one shared norm
    assert(got == Seq(
      ("srcA", "srcB", 2L, 2L, 1L, 0.3333),
      ("srcA", "srcC", 2L, 1L, 0L, 0.0),
      ("srcB", "srcC", 2L, 1L, 0L, 0.0)))
  }

  test("bigram log-prob: hand-computed interpolated MLE, short docs drop") {
    import spark.implicits._
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(d).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val lam = 0.7; val beta = 1.0 - lam
    def lpE6(bf: Long, cf: Long, uf: Long, tot: Long): Long =
      BigDecimal.valueOf(math.log((lam * bf) / cf + (beta * uf) / tot) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r4(x: Double): Double =
      BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // corpus: a:3 b:2 c:1, total 6; bigrams (a,a):1 (a,b):1 (b,c):1;
    // contexts c(a,·)=2 c(b,·)=1; doc 3 has one token → no row
    val laa = lpE6(1, 2, 3, 6); val lab = lpE6(1, 2, 2, 6); val lbc = lpE6(1, 1, 1, 6)
    assert(got == Seq(
      (1L, 2L, r4((laa + lab) / 1e6 / 2)),
      (2L, 1L, r4(lbc / 1e6 / 1))))
    // garbled text with IDENTICAL unigrams scores strictly below the
    // fluent original once real bigram structure exists to lose
    val fluent = (1 to 30).map(i => (i.toLong, "the cat sat on the mat")) :+
      (31L, "mat the on sat cat the")
    val scored = TextAnalysis.bigramLogProb(fluent.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scored(31L) < scored(1L))
    // empty corpus survives
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bigramLogProb(empty).collect().isEmpty)
  }

  test("packing: bucketed prefix sum is exact across bucket boundaries") {
    import spark.implicits._
    val d = Seq(
      (0L, "x x x"), (1L, "x x x x"), (2L, "x x x x x"),
      (3L, "x x"), (4L, "x x x x x x x"), (5L, "x")
    ).toDF("doc_id", "text")
    val got = Packing.packAssignments(d, contextLen = 10L, bucketSize = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // token counts 3,4,5,2,7,1 → starts 0,3,7,12,14,21
    assert(got == Seq(
      (0L, 3L, 0L, 0L, 0L), (1L, 4L, 3L, 0L, 3L), (2L, 5L, 7L, 0L, 7L),
      (3L, 2L, 12L, 1L, 2L), (4L, 7L, 14L, 1L, 4L), (5L, 1L, 21L, 2L, 1L)))
    // distributed path ≡ the single-bucket (serial) prefix sum
    val serial = Packing.packAssignments(d, contextLen = 10L, bucketSize = 1000000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == serial)
  }

  test("packing summary: starts per window, last window partially filled") {
    import spark.implicits._
    val d = Seq(
      (0L, "x x x"), (1L, "x x x x"), (2L, "x x x x x"),
      (3L, "x x"), (4L, "x x x x x x x"), (5L, "x")
    ).toDF("doc_id", "text")
    val asg = Packing.packAssignments(d, contextLen = 10L, bucketSize = 2L)
    val got = Packing.packSummary(asg, contextLen = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    // stream is 22 tokens: packs 0 and 1 full, pack 2 holds 2 tokens
    assert(got == Seq((0L, 3L, 10L), (1L, 2L, 10L), (2L, 1L, 2L)))
  }

  test("packing refuses non-integral ids; unigram log-prob survives an empty corpus") {
    import spark.implicits._
    val bad = Seq(("x", "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Packing.packAssignments(bad, contextLen = 10L)
    }
    assert(e.getMessage.contains("integral"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.unigramLogProb(empty).collect().isEmpty)
  }

  test("packing: start offsets tile the corpus stream on real docs") {
    val asg = Packing.packAssignments(docs, contextLen = 512L, bucketSize = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = asg.map(_._2).sum
    // each doc starts exactly where the previous one ended
    asg.sortBy(_._1).foldLeft(0L) { case (expectStart, (_, n, start)) =>
      assert(start == expectStart)
      start + n
    } match { case end => assert(end == total) }
  }

  test("pmi pairs: hand-computed association scores, vocab cap filters pairs") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"), (5L, "a b c")
    ).toDF("doc_id", "text")
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val got = TextAnalysis.pmiPairs(d, vocabSize = 10, minPairDocs = 1L)
      .as[(String, String, Long, Double)].collect().toSeq
    // df: a=4 b=4 c=3, N=5; df_ab: (a,b)=3 (a,c)=2 (b,c)=2
    assert(got == Seq(
      ("a", "b", 3L, r4(math.log(15.0 / 16))),
      ("a", "c", 2L, r4(math.log(10.0 / 12))),
      ("b", "c", 2L, r4(math.log(10.0 / 12)))))
    // vocabSize=2 keeps {a, b} (df ties break token-asc): only (a,b) remains
    val capped = TextAnalysis.pmiPairs(d, vocabSize = 2, minPairDocs = 1L)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(capped.map(p => (p._1, p._2)) == Seq(("a", "b")))
  }

  test("knn label agreement: majority vote with deterministic tie-break") {
    import spark.implicits._
    // 1-d embeddings: vec 0 (label 1) sits nearest 1,2,3 (labels 1,1,2)
    val rows = Seq(
      (0L, Seq(1.00f), 1), (1L, Seq(1.01f), 1), (2L, Seq(0.99f), 1),
      (3L, Seq(1.02f), 2), (4L, Seq(-5f), 9))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelAgreement(emb, emb.where(col("vec_id") === 0), k = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 1, 1, 2L, true)))
    // k=4 pulls in the anti-parallel vec 4 (label 9, sim -1): the
    // majority is unchanged
    val got4 = Similarity.knnLabelAgreement(emb, emb.where(col("vec_id") === 0), k = 4)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(got4 == Seq((0L, 1, 1, 2L, true)))
  }

  test("shard/sample hash spreads strided and even-only ids (A = 1 mod 2^k trap)") {
    import spark.implicits._
    // ids striding by 16: the single-mod formula mapped ALL of them to
    // shard (id mod 16) = 0; the mod-P reduction must spread them
    val strided = (0 until 320 by 16).map(_.toLong).toDF("doc_id")
    val shards = CorpusShards.assign(strided, nShards = 16)
      .select("shard").as[Long].collect().toSet
    assert(shards.size > 4, s"strided ids collapsed to shards $shards")
    // even-only ids must reach odd shards too
    val even = (0L until 400L by 2).toDF("doc_id")
    val evenShards = CorpusShards.assign(even, nShards = 16)
      .select("shard").as[Long].collect().toSet
    assert(evenShards.exists(_ % 2 == 1), "even ids never reached an odd shard")
    // ids striding by 97 must not collapse into one sampling bucket
    val s97 = (0 until 97 * 50 by 97).map(_.toLong).toDF("doc_id")
    val buckets = s97.select(Sampling.detHash(col("doc_id")).as("b"))
      .as[Long].collect().toSet
    assert(buckets.size > 4, s"stride-97 ids collapsed to buckets $buckets")
  }

  test("contract/funnel labels with quotes don't break the generated SQL") {
    import spark.implicits._
    val df = Seq((1L, Some(2L), "view")).toDF("event_id", "user_id", "event_type")
    val rep = Contracts.report(df,
      Seq(Contracts.notNull("user isn't null", col("user_id"))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rep == Seq(("user isn't null", 0L, 1L, true)))
    val ev = Seq((1L, "add'to'cart", 1L), (1L, "buy", 2L)).toDF("user_id", "event_type", "ts")
    val funnel = EventAnalytics.funnel(ev, Seq("add'to'cart", "buy"))
      .as[(String, Long)].collect().toSeq
    assert(funnel == Seq("1_add'to'cart" -> 1L, "2_buy" -> 1L))
  }

  test("snapshot diff classifies added, removed, changed, unchanged") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val neu = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(old, neu).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"), (4L, "added")))
    val sum = SnapshotDiff.summary(old, neu).as[(String, Long)].collect().toMap
    assert(sum == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
    // whitespace-only edits are unchanged under the normalized digest
    val ws = Seq((1L, "  alpha  ")).toDF("doc_id", "text")
    assert(SnapshotDiff.diff(old.where(col("doc_id") === 1), ws)
      .as[(Long, String)].collect().toSeq == Seq((1L, "unchanged")))
    // NULL text means NULL digest — presence must still classify by side
    val nullOld = Seq((7L, Option.empty[String]), (8L, Some("x"))).toDF("doc_id", "text")
    val nullNew = Seq((8L, Option.empty[String])).toDF("doc_id", "text")
    assert(SnapshotDiff.diff(nullOld, nullNew).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq ==
      Seq((7L, "removed"), (8L, "changed")))
  }

  test("contracts report: per-check violation counts, uniqueness as excess rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), "view"), (2L, None, "view"),
      (3L, Some(11L), "weird"), (3L, Some(12L), "click")
    ).toDF("event_id", "user_id", "event_type")
    val got = Contracts.report(df,
      Seq(
        Contracts.notNull("user_not_null", col("user_id")),
        Contracts.inSet("type_known", col("event_type"), Seq("view", "click"))),
      uniqueKeys = Seq("id_unique" -> "event_id"))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("id_unique", 1L, 4L, false),
      ("type_known", 1L, 4L, false),
      ("user_not_null", 1L, 4L, false)))
    // all-clean frame passes everything
    val clean = Seq((1L, Some(1L), "view")).toDF("event_id", "user_id", "event_type")
    assert(Contracts.report(clean,
      Seq(Contracts.notNull("user_not_null", col("user_id"))),
      uniqueKeys = Seq("id_unique" -> "event_id"))
      .as[(String, Long, Long, Boolean)].collect().forall(_._4))
  }

  test("sentence stats: trims blanks, handles no-terminator and empty docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "One two. Three!  Four?"),     // 3 sentences: 7, 5, 4 chars
      (2L, "no terminator here"),          // 1 sentence, 18 chars
      (3L, "..."), (4L, "")                // 0 sentences each
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceStats(d).orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Some(math.rint((7 + 5 + 4) / 3.0 * 1e4) / 1e4)),
      (2L, 1L, Some(18.0)),
      (3L, 0L, None), (4L, 0L, None)))
  }

  test("fingerprint is stable under whitespace normalization") {
    import spark.implicits._
    val df = Seq((1L, "hello  world"), (2L, " hello world "), (3L, "different doc"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("bloom incremental dedup equals the plain anti-join on every route") {
    import spark.implicits._
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val newB = docs.where(col("doc_id") % 3 =!= 0)
    val seenB = docs.where(col("doc_id") % 3 === 0)
    val plain = asSet(Dedup.exactIncremental(newB, seenB))
    // bloom route
    assert(asSet(Dedup.exactIncrementalBloom(newB, seenB)) == plain)
    // forced fallback (seen set over the cap) must agree too
    assert(asSet(Dedup.exactIncrementalBloom(newB, seenB, maxSeenItems = 1L)) == plain)
    // empty seen set: everything is new; both shapes agree
    val none = docs.where(lit(false))
    assert(asSet(Dedup.exactIncrementalBloom(newB, none)) ==
      asSet(Dedup.exactIncremental(newB, none)))
    // duplicates across the batch boundary are actually dropped: a doc
    // re-submitted verbatim under a new id must not survive
    val seenDocs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val newDocs = Seq((10L, "alpha beta gamma"), (11L, "zeta eta"), (12L, "zeta eta"))
      .toDF("doc_id", "text")
    val out = Dedup.exactIncrementalBloom(newDocs, seenDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((11L, 2L))) // 10 was seen; 11/12 collapse to one group
  }

  test("boilerplate removal drops repeated lines, keeps unique bodies and blanks") {
    import spark.implicits._
    val pages = Seq(
      (1L, "HEADER\nbody one\n\nfooter shared"),
      (2L, "HEADER\nbody two\n\nfooter shared"),
      (3L, "header\nbody three\n\nfooter shared"), // normalization: header ≡ HEADER
      (4L, "no header here\nbody four")).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(pages, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // header (df=3 after normalization) and footer (df=3) go; blank
    // lines and unique bodies stay
    assert(out(1L) == ((4L, 2L, "body one\n")))
    assert(out(2L) == ((4L, 2L, "body two\n")))
    assert(out(3L) == ((4L, 2L, "body three\n")))
    assert(out(4L) == ((2L, 0L, "no header here\nbody four")))
  }

  test("boilerplate removal: literal-lexicon path equals the positional-join path") {
    import spark.implicits._
    val pages = (0L until 40L).map { i =>
      (i, s"SHARED TOP LINE\nunique body $i\nSHARED BOTTOM ${i % 4}\nCOMMON FOOT")
    }.toDF("doc_id", "text")
    def rows(maxLexicon: Int) =
      TextAnalysis.removeBoilerplate(pages, minDocs = 3, maxLexicon = maxLexicon)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows(100000) == rows(0)) // lexicon folded in-plan vs drop-position join
    // idempotence: a second pass over cleaned pages removes nothing
    val once = TextAnalysis.removeBoilerplate(pages, minDocs = 3)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = TextAnalysis.removeBoilerplate(once, minDocs = 3)
    assert(twice.agg(sum("n_removed")).head().getLong(0) == 0L)
  }

  test("semantic dedup keeps exactly the min id of each cosine cluster") {
    import spark.implicits._
    // All vectors live on a circle inside a RANDOM (non-axis-aligned)
    // 2-D subspace of R^16: the ±1 LSH hyperplanes project onto it as
    // many distinct cut directions, so the 1−θ/π collision model holds.
    // (Axis-aligned toy vectors would collapse the Rademacher planes to
    // two cut directions and deterministically separate 25°-apart
    // pairs — a small-dims artifact, not a property of the operator.)
    val rnd = new scala.util.Random(7)
    val a = Array.fill(16)(rnd.nextGaussian())
    val u1 = { val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n) }
    val b0 = Array.fill(16)(rnd.nextGaussian())
    val d = b0.indices.map(i => b0(i) * u1(i)).sum
    val b = b0.indices.map(i => b0(i) - d * u1(i)).toArray
    val u2 = { val n = math.sqrt(b.map(x => x * x).sum); b.map(_ / n) }
    def at(deg: Double): Array[Float] = {
      val t = math.toRadians(deg)
      u1.indices.map(i => (u1(i) * math.cos(t) + u2(i) * math.sin(t)).toFloat).toArray
    }
    // clusters by angle: {0°, 5°}, {90°, 95°}, singleton 225°, and the
    // chain {270°, 295°, 320°} — adjacent cos 25° ≈ 0.906 ≥ 0.85, ends
    // cos 50° ≈ 0.64: transitivity must still merge all three
    val emb8 = Seq(0L -> at(0), 1L -> at(5), 2L -> at(90), 3L -> at(95),
      4L -> at(225), 5L -> at(270), 6L -> at(295), 7L -> at(320))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(emb8, threshold = 0.85, dims = 16)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> true, 6L -> false, 7L -> false))
  }

  test("near-dup pairs: zero vectors never pair (cosine undefined)") {
    import spark.implicits._
    val z = Array.fill(4)(0.0f)
    val u = Array(1.0f, 0f, 0f, 0f)
    val e = Seq((0L, u), (1L, u), (2L, z), (3L, z)).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(e, threshold = 0.9, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical unit vectors pair; zero vectors pair with nothing, not
    // even each other (the degenerate 0 >= 0 predicate must not fire)
    assert(pairs == Set((0L, 1L)))
  }

  test("misra-gries summary: presence above n/(cap+1), est <= true, bounded error") {
    import spark.implicits._
    // 40×a, 12×b, 5×c, 3×d as one-token docs: n = 60, capacity 3 ⇒
    // error bound 60/4 = 15; only 'a' (40 > 15) is guaranteed present
    val stream = List.fill(40)("a") ++ List.fill(12)("b") ++
      List.fill(5)("c") ++ List.fill(3)("d")
    val docs5 = stream.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mg = TextAnalysis.heavyHitters(docs5, capacity = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("a" -> 40L, "b" -> 12L, "c" -> 5L, "d" -> 3L)
    assert(mg.size <= 3)
    assert(mg.contains("a"))
    mg.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
      assert(truth(t) - est <= 15L, s"$t error past the bound: ${truth(t) - est}")
    }
  }

  test("d_heavy_hitters emits exactly the above-threshold tokens, all in-bound") {
    val out = graft.queries.PipelineQueries.heavyHittersQ(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), "a summary estimate broke the MG bound")
    val toks = docs.select(explode(Dedup.tokens(col("text"))).as("token"))
    val n = toks.count()
    val expect = toks.groupBy("token").count()
      .where(col("count") * 65 > n).collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet == expect)
  }

  test("postings: cap truncates the list but never df; one exchange total") {
    import spark.implicits._
    val d = Seq((1L, "x"), (2L, "x y"), (3L, "x"), (4L, "x y"), (5L, "x z"),
      (6L, "x"), (7L, "x x")).toDF("doc_id", "text")
    val p = TextAnalysis.postings(d, maxPostings = 3, minDf = 1L)
    val rows = p.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    // doc 7's repeated "x" counts once (array_distinct); df stays 7
    // while the posting list is capped to the 3 smallest doc ids
    assert(rows("x") == ((7L, Seq(1L, 2L, 3L))))
    assert(rows("y") == ((2L, Seq(2L, 4L))))
    assert(rows("z") == ((1L, Seq(5L))))
    // window df + window rn + groupBy all share one token partitioning;
    // a non-adaptive child session yields a plain plan to count on
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val d2 = s2.createDataFrame(Seq((1L, "x"), (2L, "x y")))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.postings(d2, maxPostings = 3).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, s"expected one exchange:\n$plan")
  }

  test("approx quantiles: HDR answers land inside their quantization envelope") {
    val out = graft.queries.PipelineQueries.approxQuantilesQ(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"sketch quantile outside its envelope: $r")
    }
  }

  test("hashed linear score: bounded, deterministic, equal for equal texts") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "different words here entirely"), (4L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(d)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // blank doc has no tokens → drops
    assert(out(1L) == out(2L))            // same text ⇒ same score and verdict
    out.values.foreach { case (w, keep) =>
      assert(w >= -0.5 && w < 0.5, s"score $w outside [-0.5, 0.5)")
      assert(keep == (w > 0) || math.abs(w) < 1e-4) // rounded display vs raw sign
    }
  }

  test("mixture plan: rates are budget/tokens capped at 1, exact on hand corpus") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j", "A"),  // 10 tokens
      (2L, "k l m n o p q r s t", "B"),  // 10 tokens
      (3L, "x", "C")                     // 1 token
    ).toDF("doc_id", "text", "source")
    val plan = Sampling.mixturePlan(d, Map("A" -> 50, "B" -> 30), defaultPct = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // total 21 tokens, budget 50% ⇒ group budget = 21·pct·50/10000
    assert(plan("A") == ((10L, 50L, 0.525)))  // 21·50·50/10000/10
    assert(plan("B") == ((10L, 30L, 0.315)))
    assert(plan("C") == ((1L, 5L, 0.525)))
    // a giant share on a tiny group hits the rate cap
    val capped = Sampling.mixturePlan(d, Map("C" -> 100), defaultPct = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(capped("C") == 1.0)
    // a group whose docs all tokenize empty must get a DEFINED rate
    // (1.0), not NaN/Infinity from the 0-token division
    val withEmpty = d.union(Seq((4L, "", "D")).toDF("doc_id", "text", "source"))
    val zero = Sampling.mixturePlan(withEmpty, Map("A" -> 50), defaultPct = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(zero("D") == ((0L, 1.0)), s"zero-token group rate: ${zero("D")}")
  }

  test("leakage-safe split: cluster members never straddle the split") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
      (3L, "completely unrelated content about something else")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairsAdaptive(d, k = 3, threshold = 0.5)
    val out = Dedup.leakageSafeSplit(d, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L) // shared representative
    assert(byId(1L)._3 == byId(2L)._3)             // ⇒ same side
    assert(byId(3L)._2 == 3L)                      // singleton reps itself
    // corpus-level invariant: one split value per representative
    val full = Dedup.leakageSafeSplit(docs,
      Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5))
    val straddlers = full.groupBy("rep")
      .agg(countDistinct(col("split")).as("nsplits"))
      .where(col("nsplits") > 1).count()
    assert(straddlers == 0L)
  }

  test("repeated spans: cross-doc verbatim windows flagged, short docs collapse") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h unique1 tail1"), // 10 toks → 3 spans, 1st shared
      (2L, "a b c d e f g h other2 end2"),
      (3L, "tiny doc"),                       // < 8 toks → one whole-doc span
      (4L, "tiny doc")                        // …shared verbatim with doc 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpans(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((3L, 1L, 0.3333)))
    assert(out(3L) == ((1L, 1L, 1.0)))
    assert(out(4L) == ((1L, 1L, 1.0)))
  }

  test("span dedup: keep-first excision, within-doc repeats, short-doc collapse") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h unique1 tail1"),  // first occurrence of span "a..h"
      (2L, "a b c d e f g h other2 end2"),    // later copy → tokens 1-8 excised
      (3L, "tiny doc"),                       // short doc, first copy survives
      (4L, "tiny doc"),                       // later copy → fully excised
      (5L, "p q r s t u v w p q r s t u v w") // second half repeats the first
    ).toDF("doc_id", "text")
    val out = TextAnalysis.spanDedup(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, 0L, "a b c d e f g h unique1 tail1")))
    assert(out(2L) == ((10L, 8L, "other2 end2")))
    assert(out(3L) == ((2L, 0L, "tiny doc")))
    assert(out(4L) == ((2L, 2L, "")))
    // (id, pos) order applies within a doc too: only the later repeat goes
    assert(out(5L) == ((16L, 8L, "p q r s t u v w")))
    // invariant: excised token counts reconcile with survivor text
    out.values.foreach { case (n, rem, txt) =>
      val kept = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(kept == n - rem)
    }
  }

  test("quality calibration: per-source cutoffs tag the top fraction") {
    val out = TextAnalysis.qualityCalibration(docs, keepFrac = 0.3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    // cutoffs must equal the per-source percentile of the 4-dp scores,
    // and keep must be exactly score >= (unrounded) cutoff
    val scored = docs.select(col("source"),
      round(TextAnalysis.qualityScoreOf(Dedup.tokens(col("text")), col("text")), 4)
        .as("score"))
    val cuts = scored.groupBy("source")
      .agg(expr("percentile(score, 0.7)").as("cut"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { case (_, src, score, cutoff, keep) =>
      assert(cutoff == math.round(cuts(src) * 10000.0) / 10000.0)
      assert(keep == (score >= cuts(src)))
    }
    // every source keeps roughly its target fraction (ties widen only)
    out.groupBy(_._2).foreach { case (src, rs) =>
      val kept = rs.count(_._5).toDouble / rs.length
      assert(kept >= 0.25 && kept <= 0.45,
        s"source $src kept fraction $kept far from 0.3 target")
    }
    // keepFrac = 1 keeps everything (cutoff is the minimum score)
    val all = TextAnalysis.qualityCalibration(docs, keepFrac = 1.0).collect()
    assert(all.forall(_.getBoolean(4)))
    // a NULL group is a group like any other — a plain equi-join on the
    // group column would silently drop its documents
    import spark.implicits._
    val nullDocs = Seq(
      (1L, "a",  "the a of and to in is for on with more good text"),
      (2L, null, "the quick brown fox jumps over a lazy dog for fun"),
      (3L, null, "x")
    ).toDF("doc_id", "source", "text")
    val outN = TextAnalysis.qualityCalibration(nullDocs, keepFrac = 0.5)
    assert(outN.count() == 3L, "null-source documents were dropped")
    assert(outN.where(col("source").isNull && col("keep")).count() >= 1L)
  }

  test("training-run prep: permutation bijective, shards balanced, ids = curated set") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val asg = graft.ops.TrainingRun.prepare(corpus, bench, nShards = 4, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = asg.length
    assert(asg.map(_._2).sorted.toSeq == (0L until n).toSeq) // pos bijection
    val sizes = asg.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"stripe imbalance: $sizes") // mod-stripe
    val curated = Curation.curate(corpus, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(asg.map(_._1).toSet == curated)
    val sm = graft.ops.TrainingRun.summary(corpus, bench, nShards = 4, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sm.map(_._2).sum == n.toLong && sm.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // packed stream: offsets tile the SHUFFLED order exactly
    val packs = graft.ops.TrainingRun.packed(corpus, bench,
        contextLen = 512L, seed = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    packs.sortBy(_._1).foldLeft(0L) { case (expect, (_, nt, start)) =>
      assert(start == expect); start + nt
    }
    assert(packs.map(_._1).toSet == asg.map(_._2).toSet) // same permutation
  }

  test("curation mixture tail equals temperatureSample of the cleaned corpus") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val p = Curation.Params(sourceAlpha = Some(0.5), mixTargetFrac = 0.4)
    val (curated, funnelDf) = Curation.run(corpus, bench, p)
    val funnel = funnelDf.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // stage 6 IS temperatureSample of stage 5's survivors
    val clean = Curation.curate(corpus, bench,
      Curation.Params()) // default params share every upstream knob
    val expect = graft.ops.Sampling
      .temperatureSample(clean, 0.5, 0.4, "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, s"mixture tail diverged: ${got.size} vs ${expect.size}")
    assert(funnel("6_mixture") == got.size.toLong)
    assert(funnel("6_mixture") <= funnel("5_decontaminated"))
  }

  test("curation quality stage accepts a trained classifier gate") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    // train on the corpus's own split (src0 exemplars vs the rest) —
    // what matters here is facade ≡ manual composition, not quality
    val w = TextAnalysis.trainQualityClassifier(
      corpus.where(col("source") === "src0"),
      corpus.where(col("source") =!= "src0"), steps = 2)
    val funnel = Curation.funnel(corpus, bench,
        Curation.Params(classifierWeights = Some(w)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = TextAnalysis.classifierScore(corpus, w)
      .where(col("keep")).count()
    assert(funnel("2_quality") == expect,
      s"classifier stage kept ${funnel("2_quality")}, serving op keeps $expect")
    assert(funnel("2_quality") >= funnel("3_exact_dedup") &&
      funnel("4_near_dup") >= funnel("5_decontaminated"))
  }

  test("curation quality stage can calibrate per-source keep fractions") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val funnel = Curation.funnel(corpus, bench,
        Curation.Params(qualityKeepFrac = Some(0.5)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage 2 must match the standalone calibration op's keep set
    val expect = TextAnalysis.qualityCalibration(corpus, keepFrac = 0.5)
      .where(col("keep")).count()
    assert(funnel("2_quality") == expect,
      s"calibrated stage kept ${funnel("2_quality")}, calibration op keeps $expect")
    // funnel stays monotone through the downstream stages
    assert(funnel("2_quality") >= funnel("3_exact_dedup") &&
      funnel("3_exact_dedup") >= funnel("4_near_dup") &&
      funnel("4_near_dup") >= funnel("5_decontaminated"))
    // every source survives the QUALITY gate itself (the failure mode
    // an absolute threshold has and calibration exists to avoid) —
    // downstream dedup/decontam stages may still thin a source
    val keptBySrc = TextAnalysis.qualityCalibration(corpus, keepFrac = 0.5)
      .groupBy("source").agg(
        count(lit(1)).as("n"), sum(col("keep").cast("long")).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(keptBySrc.forall { case (_, n, k) => n == 0 || k >= 1 })
  }

  test("epoch shuffle is a seeded engine-reproducible permutation") {
    def posOf(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.epochShuffle(d, seed).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val p1 = posOf(docs, 1L)
    // bijection onto [0, n)
    assert(p1.values.toSeq.sorted == (0L until n).toSeq)
    // deterministic under any partitioning
    assert(posOf(docs.repartition(7), 1L) == p1)
    // the two-level prefix path must equal the naive global order
    val ref = docs.select(col("doc_id"),
        Sampling.detHashMod(pmod(col("doc_id"), lit(1000000007L)) + lit(1L), 8192L).as("b"),
        Sampling.detHashMod(pmod(col("doc_id"), lit(1000000007L)) + lit(2L), 1000000007L).as("k"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("b").asc, col("k").asc, col("doc_id").asc)) - 1)
      .collect().map(r => r.getLong(0) -> r.getInt(3).toLong).toMap
    assert(p1 == ref)
    // a different epoch seed permutes differently
    assert(posOf(docs, 2L) != p1)
  }

  test("keep-K dedup caps clusters without touching singletons") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "x y z w"), // one cluster
      (4L, "something else entirely here")               // singleton
    ).toDF("doc_id", "text")
    val clusters = Dedup.dupClusters(
      Dedup.jaccardPairsAdaptive(d, k = 3, threshold = 0.5))
    val cap2 = Dedup.capClusters(d, clusters, keepPerCluster = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(cap2 == Seq(1L, 2L, 4L)) // two lowest ids survive, singleton kept
    // K = 1 degenerates to the exact applyClusters semantics
    val cap1 = Dedup.capClusters(d, clusters, keepPerCluster = 1)
      .collect().map(_.getLong(0)).sorted.toSeq
    val applied = Dedup.applyClusters(d, clusters)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(cap1 == applied && cap1 == Seq(1L, 4L))
    // a cap above the largest cluster keeps everything
    assert(Dedup.capClusters(d, clusters, keepPerCluster = 5).count() == 4L)
  }

  test("span decontamination excises benchmark windows only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma x y"),
      (2L, "alpha beta gamma x y"), // intra-corpus repeat — NOT excised
      (3L, "clean text here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateSpans(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the benchmark window goes from BOTH copies; the duplication
    // between docs 1 and 2 is untouched (that's spanDedup's job)
    assert(out(1L) == ((5L, 3L, "x y")))
    assert(out(2L) == ((5L, 3L, "x y")))
    assert(out(3L) == ((3L, 0L, "clean text here")))
    // empty benchmark: nothing excised
    val none = TextAnalysis.decontaminateSpans(corpus, bench.limit(0), n = 3)
      .collect().map(r => r.getLong(2)).sum
    assert(none == 0L)
  }

  test("curation optional span-excision stage rewrites text between near-dup and decontam") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val p = Curation.Params(exciseSpans = true)
    def stagesOf(pp: Curation.Params) = Curation.funnel(corpus, bench, pp)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val m = stagesOf(p)
    // excision rewrites text, never drops documents; tokens only shrink
    assert(m("4b_span_excise")._1 == m("4_near_dup")._1)
    assert(m("4b_span_excise")._2 <= m("4_near_dup")._2)
    // the upstream stages are byte-identical to the default funnel
    val m0 = stagesOf(Curation.Params())
    Seq("1_total", "2_quality", "3_exact_dedup", "4_near_dup")
      .foreach(s => assert(m(s) == m0(s), s"stage $s diverged"))
    // the funnel's token bookkeeping survives the rewrite: stage-5
    // token sum equals re-tokenizing the curated output
    val curated = Curation.curate(corpus, bench, p)
    assert(curated.count() == m("5_decontaminated")._1)
    val tokSum = curated
      .select(sum(size(Dedup.tokens(col("text"))).cast("long")).as("t"))
      .collect()(0).getLong(0)
    assert(tokSum == m("5_decontaminated")._2)
  }

  test("quality calibration plans the cutoff frame as a broadcast build side") {
    // the cutoff aggregate is |sources| rows — a shuffle join here
    // would re-shuffle the whole scored corpus for a handful of rows
    val df = TextAnalysis.qualityCalibration(docs)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast cutoff join:\n$plan")
  }

  test("incremental span dedup equals the full run restricted to the new batch") {
    import spark.implicits._
    val d = Seq(
      (1L, "p q r s t u"),        // seen
      (2L, "m n o"),              // seen, short doc (whole-doc gram)
      (3L, "p q r zz ww"),        // new: opening gram seen → excised
      (4L, "a1 a2 a3 a4"),        // new: fresh, then repeated by 5
      (5L, "a1 a2 a3 tail"),      // new: intra-batch dup of 4's gram
      (6L, "m n o")               // new: short dup of seen doc 2 → ''
    ).toDF("doc_id", "text")
    val seen = d.where(col("doc_id") < 3)
    val fresh = d.where(col("doc_id") >= 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val full = rows(TextAnalysis.spanDedup(d, n = 3)).filter(_._1 >= 3)
    val inc = rows(TextAnalysis.spanDedupIncremental(fresh,
      TextAnalysis.spanGramStore(seen, n = 3), n = 3))
    // seen ids all precede new ids ⇒ the incremental plan must match
    // the full run exactly on the new rows
    assert(inc == full)
    assert(inc(3L) == ((5L, 3L, "zz ww")))
    assert(inc(6L) == ((3L, 3L, "")))
    // empty store degenerates to plain within-batch span dedup
    assert(rows(TextAnalysis.spanDedupIncremental(fresh,
        TextAnalysis.spanGramStore(seen.limit(0), n = 3), n = 3))
      == rows(TextAnalysis.spanDedup(fresh, n = 3)))
  }

  test("containment report: shared shingle fraction over the benchmark set") {
    import spark.implicits._
    val corpus = Seq((1L, "x y z w")).toDF("doc_id", "text")
    val bench = Seq((2L, "x y z q")).toDF("doc_id", "text")
    // bench shingles {x y z, y z q}; corpus holds only the first
    val r = Dedup.containmentReport(corpus, bench).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 1L, 0.5)))
    // empty benchmark: zero shingles, containment 0 (no divide-by-zero)
    val empty = Dedup.containmentReport(corpus, bench.limit(0)).collect()(0)
    assert((empty.getLong(0), empty.getLong(1), empty.getDouble(2)) == ((0L, 0L, 0.0)))
  }

  test("containment report plans the bench set as a LeftSemi build side") {
    // pins the review fix: a left-outer with bench on the stream side
    // could never broadcast-build the small set; the corpus must probe
    // a semi-join against bench
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val docs2 = Tables.documents(s2, sf)
    val plan = Dedup.containmentReport(
      docs2.where(col("doc_id") % 10 =!= 0), docs2.where(col("doc_id") % 10 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    assert(!plan.contains("LeftOuter"), s"bench must not be an outer stream side:\n$plan")
  }

  test("postings minDf prunes output rows only") {
    import spark.implicits._
    val d = Seq((1L, "x y"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.postings(d, maxPostings = 5, minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("x"))
  }

  test("simhashPairs: pigeonhole candidates find exactly the brute-force pair set") {
    // 64-bit default config on the corpus — the scale arm; the pigeonhole
    // blocks must surface EVERY pair within maxHamming (recall = 1)
    val d = 6
    val got = Dedup.simhashPairs(docs, maxHamming = d)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = Dedup.simhash(docs)
    val want = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Dedup.hamming(col("a.simhash"), col("b.simhash")).cast("long").as("h"))
      .where(col("h") <= d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must exercise at least one pair")
  }

  test("incremental simhash finds exactly the cross pairs of the full pair set") {
    val d = 6
    val full = Dedup.simhashPairs(docs, maxHamming = d)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newB = docs.where(col("doc_id") >= 25)
    val seen = docs.where(col("doc_id") < 25)
    val inc = Dedup.simhashPairsIncremental(newB, seen, maxHamming = d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id_a is always the new doc; the full run orders pairs id_a < id_b
    val wantCross = full.collect {
      case (a, b) if a >= 25 && b < 25 => (a, b)
      case (a, b) if b >= 25 && a < 25 => (b, a)
    }
    assert(inc == wantCross)
    assert(inc.forall { case (a, b) => a >= 25 && b < 25 })
  }

  test("lexiconFlags: token-exact hits, rate policy, empty docs unflagged") {
    import spark.implicits._
    val d = Seq(
      (1L, "slow slow query on a large table"), // 2/7 hits
      (2L, "the lass ran fast"),                // "lass" must NOT hit "class" list
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.lexiconFlags(d, Seq("slow", "class"),
      maxHitRate = 0.2).orderBy("doc_id").collect()
    assert((out(0).getLong(1), out(0).getLong(2)) == ((7L, 2L)))
    assert(out(0).getLong(3) == 285714L && out(0).getBoolean(4))
    assert(out(1).getLong(2) == 0L && !out(1).getBoolean(4))
    assert(out(2).getLong(1) == 0L && !out(2).getBoolean(4))
  }

  test("sourceCard: volumes, dup attribution global, dominant lang ties break low") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "en", "five words of english text"),
      (2L, "a", "en", "five words of english text"),  // dup of 1 (global first wins)
      (3L, "b", "fr", "five words of english text"),  // dup of 1, OTHER source
      (4L, "b", "de", "fresh german words entirely here"),
      (5L, "b", "fr", "encore des mots differents ici"))
      .toDF("doc_id", "source", "lang", "text")
    val out = graft.ops.Reports.sourceCard(d).orderBy("source").collect()
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 2L)
    assert(out(0).getString(4) == "en")
    assert(out(0).getLong(5) == 500000L) // doc 2 is the dup; doc 1 came first
    assert(out(1).getString(0) == "b" && out(1).getLong(1) == 3L)
    assert(out(1).getLong(5) == 333333L) // doc 3 dups source a's doc 1
    assert(out(1).getString(4) == "fr")  // 2 fr vs 1 de
    assert(out(0).getLong(2) == 10L)     // 5 tokens × 2 docs
  }

  test("dedupRateBySource: exact losers counted once, near losers exclude them") {
    import spark.implicits._
    // a: 1,2 identical (exact loser 2); b: 3 near-dups 1 (cluster {1,3},
    // loser 3 — near, not exact); c: clean
    val d = Seq(
      (1L, "a", "same text here"), (2L, "a", "same text here"),
      (3L, "b", "same text here mostly"), (4L, "c", "all fresh words")).toDF("doc_id", "source", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.dedupRateBySource(d, pairs).orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((2L, 1L, 0L, 500000L))) // doc 2 exact, NOT double-counted near
    assert(out("b") == ((1L, 0L, 1L, 1000000L)))
    assert(out("c") == ((1L, 0L, 0L, 0L)))
  }

  test("pairAgreement: counts and quantized ratios, zero-denominator guards") {
    import spark.implicits._
    val ref = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val cand = Seq((1L, 2L), (3L, 4L), (9L, 10L)).toDF("id_a", "id_b")
    val r = Eval.pairAgreement(cand, ref).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 2L)))
    assert(r.getLong(3) == 666666L) // 2/3
    assert(r.getLong(4) == 500000L) // 2/4
    val empty = Eval.pairAgreement(cand.limit(0), ref.limit(0)).collect()(0)
    assert((empty.getLong(3), empty.getLong(4)) == ((0L, 0L)))
  }

  test("hardNegatives: same-label neighbors excluded BEFORE ranking; ivf arm exact at full probe") {
    import spark.implicits._
    // query 0 (label 0) sits inside a tight same-label cluster; its k
    // negatives must be the far different-label vectors, not an empty set
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0.98f, 0.02f), 0), (3L, Array(0.97f, 0.03f), 0),
      (10L, Array(0.5f, 0.5f), 1), (11L, Array(0.4f, 0.6f), 1),
      (12L, Array(0.0f, 1.0f), 1))
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(e, e.where(col("vec_id") === 0), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 10L), (0L, 2L, 11L)))
    // exhaustive IVF arm ≡ exact arm on the real corpus
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.hardNegatives(emb, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.hardNegatives(emb, q, k = 3,
      nlist = Some(4), nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == exact)
  }

  test("ivfTopK superProbe: two-level assignment keeps high recall vs flat") {
    val q = emb.where(col("vec_id") < 20)
    val flat = Similarity.ivfTopK(emb, q, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hier = Similarity.ivfTopK(emb, q, k = 5, nlist = 16, nprobe = 4,
      superProbe = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = hier.intersect(flat).size.toDouble / flat.size
    assert(recall >= 0.6, s"hier assignment recall vs flat: $recall")
    // every query still gets k rows
    assert(hier.groupBy(_._1).values.forall(_.size == 5))
  }

  test("ivfTopK pinned centroids: serve path equals the self-training path") {
    val q = emb.where(col("vec_id") < 20)
    val cents = Similarity.ivfCentroids(emb, nlist = 16)
    val self = Similarity.ivfTopK(emb, q, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pinned = Similarity.ivfTopK(emb, q, k = 5, nlist = 16, nprobe = 4,
      centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pinned == self)
  }

  test("dimPrefixTopK: exhaustive config equals brute force bit-for-bit even at a narrow prefix") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nprobe = nlist + corpus-sized rerank: the prefix shortlist covers
    // everything, so the full-width rerank IS brute force regardless of
    // the probe geometry
    val served = Similarity.dimPrefixTopK(emb, q, 5, prefix = 16,
      nlist = 16, nprobe = 16, rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == exact)
  }

  test("dimPrefixTopK pruned config: k rows per query, recall tracks the prefix curve") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val served = Similarity.dimPrefixTopK(emb, q, 5, prefix = 32,
      nlist = 16, nprobe = 16, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(served.groupBy(_._1).values.forall(_.size == 5))
    // exhaustive probe + prefix-32 shortlist of 50 on this corpus: the
    // full-width rerank recovers most of the exact set (the residual
    // loss is candidates the prefix ranking dropped past rerank=50 —
    // the quantity e_dim_prefix_recall measures per width)
    val recall = served.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"prefix-32 shortlist recall: $recall")
  }

  test("anisotropy: collapsed cloud reads ~1e6, symmetric cloud reads 0") {
    import spark.implicits._
    val same = Seq.tabulate(8)(i => (i.toLong, Array(0.6f, -0.3f, 0.1f)))
      .toDF("vec_id", "embedding")
    val collapsed = Similarity.anisotropy(same).collect()(0)
    assert(collapsed.getLong(4) == 1000000L,
      s"identical vectors must read anisotropy 1e6, got $collapsed")
    val sym = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val iso = Similarity.anisotropy(sym).collect()(0)
    assert(iso.getLong(2) == 0L && iso.getLong(4) == 0L)
    assert(iso.getLong(3) == 4000000L) // 4 unit vectors × 1000²
  }

  test("lengthOutliers: planted extremes flagged, bulk untouched; sketch arm agrees here") {
    import spark.implicits._
    val d = (Seq.tabulate(20)(i => (i.toLong, 100L + i)) ++
      Seq((90L, 5000L), (91L, 1L))).toDF("doc_id", "n_chars")
    val flags = TextAnalysis.lengthOutliers(d, exact = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags(90L) && flags(91L))
    assert((0L until 20L).forall(i => !flags(i)))
    val approx = TextAnalysis.lengthOutliers(d, exact = false)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(approx == flags)
  }

  test("prepareUpsampled: dense permutation over replicas, copies follow epoch counts") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // pick a source that actually SURVIVES curation on this tiny corpus
    val baseline = graft.ops.TrainingRun.prepareUpsampled(
      corpus, bench, epochs = Map.empty, nShards = 4, seed = 1L).collect()
    val upSrc = srcOf(baseline.map(_.getLong(0)).min)
    val out = graft.ops.TrainingRun.prepareUpsampled(
      corpus, bench, epochs = Map(upSrc -> 2.0), nShards = 4, seed = 1L)
      .collect()
    // positions are a dense bijection over the upsampled stream
    assert(out.map(_.getLong(2)).sorted.toSeq == out.indices.map(_.toLong))
    // every upSrc survivor appears exactly twice (integer epochs)
    val copies = out.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length }
    copies.foreach { case (id, n) =>
      assert(n == (if (srcOf(id) == upSrc) 2 else 1), s"doc $id copies $n")
    }
    assert(copies.exists { case (id, _) => srcOf(id) == upSrc },
      "fixture must exercise an upsampled source")
  }

  test("budgetSelect: exact running-sum cut, no overshoot, default budget applies") {
    import spark.implicits._
    // src a: priorities 9, 8, 7 with 40, 50, 30 tokens; budget 90 keeps
    // the first two (40 + 50 = 90) and NOT the third (would hit 120)
    val d = Seq(
      (1L, "a", 9.0, 40L), (2L, "a", 8.0, 50L), (3L, "a", 7.0, 30L),
      (4L, "b", 5.0, 100L), // default budget 0: nothing kept
      (5L, "c", 1.0, 10L), (6L, "c", 1.0, 10L)) // tie → doc_id order
      .toDF("doc_id", "source", "pr", "tok")
    val out = Sampling.budgetSelect(d, Map("a" -> 90L, "c" -> 10L),
      priority = col("pr"), tokenCount = col("tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((40L, true)) && out(2L) == ((90L, true)))
    assert(out(3L) == ((120L, false)))
    assert(!out(4L)._2)
    assert(out(5L) == ((10L, true)) && out(6L) == ((20L, false)))
  }

  test("upsampleByEpochs: whole epochs replicate exactly, fractions gate by id hash, 0 drops") {
    import spark.implicits._
    val d = Seq.tabulate(60)(i =>
      (i.toLong, if (i < 20) "a" else if (i < 40) "b" else "c"))
      .toDF("doc_id", "source")
    val out = Sampling.upsampleByEpochs(d,
      Map("a" -> 3.0, "b" -> 1.5, "c" -> 0.0))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") == 60L) // 20 docs × exactly 3 copies
    assert(bySrc.get("c").isEmpty)
    assert(bySrc("b") >= 20L && bySrc("b") <= 40L) // 1 or 2 copies each
    // copy indices are dense 0..n-1 per doc
    val copies = out.where(col("source") === "a").groupBy("doc_id")
      .agg(sort_array(collect_list("copy")).as("cs")).collect()
    assert(copies.forall(_.getSeq[Long](1) == Seq(0L, 1L, 2L)))
    // determinism: same input, same output set
    val again = Sampling.upsampleByEpochs(d,
      Map("a" -> 3.0, "b" -> 1.5, "c" -> 0.0))
    assert(out.select("doc_id", "copy").collect().toSet ==
      again.select("doc_id", "copy").collect().toSet)
  }

  test("stripMarkup: tags out, entities unescaped once, whitespace collapsed") {
    import spark.implicits._
    val d = Seq(
      (1L, "<html><p>Hello   <b>world</b></p>&amp; co</html>"),
      (2L, "spelled &lt;script&gt; stays literal"),
      (3L, "no markup at all")).toDF("doc_id", "text")
    val out = TextAnalysis.stripMarkup(d).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "Hello world & co")
    assert(out(0).getLong(2) == 6L)
    // the entity-spelled tag must NOT be stripped — unescape runs last
    assert(out(1).getString(1) == "spelled <script> stays literal")
    assert(out(1).getLong(2) == 0L)
    assert(out(2).getString(1) == "no markup at all")
  }

  test("fertilityByGroup: exact ratio on a hand corpus; zero-word group reads 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "en", "don't stop"),   // 2 words; bpe: don ' t stop = 4
      (2L, "en", "ok"),           // 1 word; 1 bpe
      (3L, "xx", "")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.fertilityByGroup(d).orderBy("lang").collect()
    assert(out(0).getString(0) == "en" && out(0).getLong(1) == 2L)
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 5L)
    assert(out(0).getLong(4) == 5L * 1000000L / 3L)
    assert(out(1).getString(0) == "xx" && out(1).getLong(4) == 0L)
  }

  test("zipfSlope: uniform frequencies read 0; the corpus reads negative") {
    import spark.implicits._
    val uniform = Seq((1L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val flat = TextAnalysis.zipfSlope(uniform, topN = 8).collect()(0)
    assert(flat.getLong(0) == 8L && flat.getDouble(1) == 0.0)
    // degenerate single-type corpus: n = 1 zeroes the least-squares
    // denominator — the guard reports 0.0, not NaN
    val one = Seq((1L, "same same same")).toDF("doc_id", "text")
    val deg = TextAnalysis.zipfSlope(one, topN = 8).collect()(0)
    assert(deg.getLong(0) == 1L && deg.getDouble(1) == 0.0)
    val corpus = TextAnalysis.zipfSlope(docs).collect()(0)
    // the sf0.001 synthetic corpus is template-heavy (head tokens near
    // uniform), so its slope is shallow — assert direction, not depth
    assert(corpus.getDouble(1) < 0.0,
      s"natural text must slope down, got ${corpus.getDouble(1)}")
  }

  test("packing efficiency report: pad/trunc/fill/split arithmetic on a hand fixture") {
    import spark.implicits._
    // token counts 3, 5, 2, 0 — stream offsets 0, 3, 8, 10
    val d = Seq(
      (0L, "a b c"), (1L, "d e f g h"), (2L, "i j"), (3L, "")
    ).toDF("doc_id", "text")
    val out = graft.ops.Packing.efficiencyReport(d, Seq(4L, 8L), bucketSize = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // L=4: pad = 1+0+2+4 = 7; trunc = 0+1+0+0 = 1; kept = 3+4+2+0 = 9
    // fill = 9e6 div 16 = 562500; packed = ceil(10/4) = 3
    // splits: doc1 spans offsets 3..7 → windows 0 and 1 → split; others not
    assert(out(0) == (4L, 4L, 7L, 1L, 562500L, 3L, 1L), s"${out(0)}")
    // L=8: pad = 5+3+6+8 = 22; trunc = 0; kept = 10; fill = 10e6 div 32
    // = 312500; packed = ceil(10/8) = 2; doc2 spans 8..9 → window 1 only
    assert(out(1) == (8L, 4L, 22L, 0L, 312500L, 2L, 0L), s"${out(1)}")
  }

  test("dim-prefix recall: full width is exact, informative prefixes order sensibly") {
    graft.functions.ensureRegistered(spark)
    val q = emb.where(col("vec_id") < 10)
    val out = Similarity.dimPrefixRecall(emb, q, k = 5, prefixes = Seq(8, 64))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(8, 64))
    // the full-width prefix IS the ground-truth ranking
    assert(out(1)._3 == 1000000L, s"full-dim recall must be exact: ${out(1)}")
    // an 8-of-64 prefix on isotropic vectors keeps little of the
    // signal — strictly below full-width, recall properly in (0, 1]
    assert(out(0)._3 < 1000000L && out(0)._3 >= 0L, s"${out(0)}")
    assert(out(0)._2 <= out(1)._2)
  }

  test("OPQ rotation: orthogonal, dot-preserving, and recall-positive on anisotropic data") {
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    // anisotropic fixture — ALL signal in dims 0..7, noise elsewhere:
    // plain PQ gives that one block 16 codewords for the entire signal
    // while seven blocks quantize noise; OPQ's rotation spreads the
    // signal across every subspace (the Ge et al. win case)
    val rnd = new scala.util.Random(4)
    val vecs = Array.fill(400)(Array.tabulate(64)(d =>
      if (d < 8) rnd.nextGaussian().toFloat else 0.05f * rnd.nextGaussian().toFloat))
    val corpus = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding")
      .localCheckpoint()
    val rot = Similarity.opqRotation(corpus, m = 8, ksub = 16)
    // R is orthogonal: RᵀR = I to 1e-9
    val d = rot.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => rot(k)(i) * rot(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"RtR[$i][$j] = $dot")
    }
    // rotation preserves pairwise dots (orthogonality, end to end
    // through the codegen'd expression)
    val pair = corpus.where(col("vec_id") < 2)
      .select(Similarity.dot(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    val pairRot = Similarity.rotated(corpus.where(col("vec_id") < 2), rot)
      .select(Similarity.dot(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    pair.zip(pairRot).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"rotation changed a self-dot: $a vs $b") }
    // recall at fixed m·ksub with NO rerank slack (rerank = k, coarse
    // stage exhaustive) — the PQ ADC ranking is the only approximation
    val queries = corpus.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(c: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) = {
      val got = Similarity.ivfPqTopK(c, q, k = 5, nlist = 4, nprobe = 4,
        m = 8, ksub = 16, rerank = 5)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val plain = recallOf(corpus, queries)
    val opq = recallOf(Similarity.rotated(corpus, rot).localCheckpoint(),
      Similarity.rotated(queries, rot))
    assert(opq >= plain + 0.1,
      s"OPQ recall $opq did not beat plain PQ $plain by the expected margin")
    // rotation composes with residual (IVFADC) mode: global isometry
    // leaves residual geometry unchanged, so the exhaustive config
    // stays exact through BOTH transforms
    val resRot = Similarity.ivfPqTopK(
      Similarity.rotated(corpus, rot).localCheckpoint(),
      Similarity.rotated(queries, rot), k = 5, nlist = 4, nprobe = 4,
      m = 8, ksub = 16, rerank = 1000000, residual = true)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(resRot == truth, "rotated residual mode broke exhaustive exactness")
    // rank-deficient training: a sample with FEWER vectors than dims
    // makes M = Y·Xᵀ rank-deficient, and the zero-singular-value
    // completion must still return a fully orthogonal R (a V-column
    // copy would not be — it spans the row null space)
    val tiny = corpus.where(col("vec_id") < 20)
    val rotTiny = Similarity.opqRotation(tiny, m = 8, ksub = 16)
    for (i <- 0 until 64; j <- 0 until 64) {
      val dotc = (0 until 64).map(k => rotTiny(k)(i) * rotTiny(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dotc - want) < 1e-8,
        s"rank-deficient RtR[$i][$j] = $dotc")
    }
  }
}
