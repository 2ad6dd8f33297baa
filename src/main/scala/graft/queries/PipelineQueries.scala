package graft.queries

import graft.Tables
import graft.ops.{Dedup, Eval, Multimodal, Retrieval, Sampling, Similarity, TextAnalysis}
import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators exposed as driver queries over
  * `documents` and `embeddings`. Oracle SQL mirrors each formula with
  * DuckDB list lambdas; float-sensitive outputs (cosine) compare ranks
  * or ids only, never raw similarity values.
  */
object PipelineQueries {

  /** Curation params for EVERY oracle query that runs the facade's
    * near-dup stage: the pair source is pinned to exact Jaccard
    * because that is what the SQL oracle replays — `Params()` now
    * auto-selects MinHash above [[graft.ops.Curation
    * .AutoMinHashSurvivors]] survivors (the round-11 scale-safe
    * default), and an oracle row must not change shape with corpus
    * size. */
  private val OracleCurationParams = graft.ops.Curation.Params(
    pairSource = graft.ops.Curation.PairSource.Exact)

  /** Normalized-text shingle set and token pipeline shared with the
    * oracle SQL below. */
  private val NormSql = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private val ToksSql = s"list_filter(string_split($NormSql, ' '), x -> len(x) > 0)"

  /** DuckDB distinct k=3 word-shingle set from a token-list column `w` —
    * the SQL twin of `functions.word_shingles` (short docs collapse to
    * one whole-text shingle). Interpolated by every shingle-based
    * oracle below so the semantics live in exactly one place. */
  private val ShinglesSql =
    """CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |             ELSE list_distinct(list_transform(range(1, len(w) - 1),
      |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END""".stripMargin

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir)).orderBy("keep_id")

  // adaptive: measures the inverted index's candidate volume and picks
  // plain join (this corpus: low collision, max df 25) or the PPJoin
  // prefix filter (hot-shingle corpora) — identical output either way
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsAdaptive(Tables.documents(spark, dir), k = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** LSH-accelerated near-dup pairs, exact-verified. Bands sized so a
    * true pair at J = 0.8 (the corpus's weakest real duplicate) is
    * missed with probability (1 − 0.8³)³² ≈ 1e-10 — candidate recall is
    * effectively 1, making the output equal the exact-Jaccard oracle. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), numHashes = 96, bands = 32)
      .orderBy("id_a", "id_b")

  /** SimHash in the SQL-reproducible configuration: polynomial token
    * hash (< 2^30), 30 signature bits — DuckDB replicates it exactly. */
  def simhashSigs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(spark, dir),
      tokenHash = TextAnalysis.polyHash, bits = 30).orderBy("id")

  /** Incremental exact dedup: docs ≥ 250 are "tonight's batch", docs
    * < 250 the already-ingested corpus. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.exactIncremental(
      docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250))
      .orderBy("keep_id")
  }

  /** Incremental exact dedup through the bloom pre-filter route (docs
    * with doc_id % 3 == 0 play the already-ingested corpus) — the
    * output must equal the plain anti-join shape bit-for-bit; only the
    * plan differs (bloom routing + broadcast residual joins instead of
    * a full seen-side shuffle). */
  def dedupBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.exactIncrementalBloom(
      docs.where(col("doc_id") % 3 =!= 0), docs.where(col("doc_id") % 3 === 0))
      .orderBy("keep_id")
  }

  /** Boilerplate stripping: every document rendered as a "page" with a
    * shared header/nav/social block and a per-source footer; the
    * operator must find and remove exactly those repeated lines (every
    * body line is unique to its document and survives). */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pages = docs.select(col("doc_id"),
      concat(
        lit("Example Site - All About Data\nHome | Products | About\n"),
        col("text"),
        lit("\nFollow Us On SocialNet\nCopyright 2026 "), col("source")).as("text"))
    TextAnalysis.removeBoilerplate(pages, minDocs = 3).orderBy("doc_id")
  }

  /** Incremental near-dup: docs ≥ 250 are "tonight's batch" checked
    * against the < 250 corpus. Bands sized exactly like d_minhash_lsh
    * (miss ≈ 1e-10 at J = 0.8) so the output equals the exact
    * cross-Jaccard oracle. */
  def minhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.minhashLshIncremental(
      docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250),
      numHashes = 96, bands = 32)
      .orderBy("id_a", "id_b")
  }

  /** Decontamination: every 10th doc plays the benchmark set. */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.contamination(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      k = 3, minShared = 2)
      .orderBy("doc_id")
  }

  def textStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(Tables.documents(spark, dir)).orderBy("doc_id")

  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), Dedup.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        round(TextAnalysis.qualityScoreOf(col("w"), col("text")), 4).as("quality"))
      .orderBy("doc_id")

  /** Per-source quality cutoffs at a 30% keep target. */
  def qualityCalibrationQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityCalibration(Tables.documents(spark, dir), keepFrac = 0.3)
      .orderBy("doc_id")

  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 20), k = 5)
      .orderBy("q_id", "rank")
  }

  /** ANN top-k with tables/bits sized from an assumed minimum neighbor
    * similarity of 0.25 (a corpus property: the weakest true top-5
    * neighbor here scores ≈ 0.26): per-neighbor miss ≤ 1e-4, so the
    * candidate set contains every true top-5 neighbor and the ranked
    * output equals brute force — which is what the oracle checks. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val (bits, tables) = Similarity.lshParamsFor(0.25, targetMiss = 1e-4)
    Similarity.lshTopK(emb, emb.where(col("vec_id") < 20), k = 5, bits = bits,
      dims = 64, tables = tables)
      .orderBy("q_id", "rank")
  }

  /** IVF ANN in its exactness configuration (nprobe = nlist): the
    * cell-partition/probe/join plumbing is the 100 TB-shaped plan; on
    * this unclustered corpus any pruned probe loses borderline
    * neighbors (see Similarity.ivfTopK), so the oracle-checked query
    * probes every cell and must equal brute force. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      nlist = 16, nprobe = 16)
      .orderBy("q_id", "rank")
  }

  /** Mutual-kNN edges at the oracle-exact probe configuration, over a
    * bounded corpus slice (the e_ivf_topk restriction pattern — the
    * exact config is quadratic by definition; §G3's e_knn_graph_real
    * measures the pruned config on the full scale corpus). */
  def knnGraphQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.mutualKnnPairs(
      Tables.embeddings(spark, dir).where(col("vec_id") < 1000), k = 5,
      nlist = 16, nprobe = 16)
      .orderBy("id_a", "id_b")

  /** Connected components over the mutual-kNN graph (min-id labels). */
  def semanticClustersQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticClusters(
      Tables.embeddings(spark, dir).where(col("vec_id") < 1000), k = 5,
      nlist = 16, nprobe = 16)
      .orderBy("vec_id")

  /** End-to-end training-run prep: the d_curation_funnel corpus split
    * curated, epoch-shuffled (seed 1), striped into 4 shards — the
    * oracle replays the WHOLE composition (funnel prefix + permutation
    * + stripe + counts). */
  def trainingPrepQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.summary(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      nShards = 4, seed = 1L,
      // oracle configs pin the exact-recall pair source: the SQL
      // replay is exact Jaccard, and Params() now auto-selects
      p = OracleCurationParams)
  }

  /** Upsampled training order: curation → per-source epoch upsampling
    * (2 epochs of src0, 1.5 of src1) → seeded shuffle over the replica
    * key → striping — the multi-epoch mix end-to-end. */
  def trainingUpsampleQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.prepareUpsampled(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      epochs = Map("src0" -> 2.0, "src1" -> 1.5), nShards = 4, seed = 1L,
      p = OracleCurationParams)
      .orderBy("doc_id", "copy")
  }

  /** DoReMi-driven training order — the deployment loop closed:
    * curate → iterative doremiWeights (K = 2) on the curated corpus →
    * learned mixture to per-source epoch counts → upsample → replica
    * shuffle → stripe. The oracle replays EVERY stage, including both
    * unrolled reweighting rounds. */
  def trainingDoremiQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.prepareDoremi(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      nShards = 4, rounds = 2, seed = 1L, p = OracleCurationParams)
      .orderBy("doc_id", "copy")
  }

  /** DoReMi × curriculum — weighted epochs, curriculum order within
    * each epoch. The oracle reuses d_training_doremi's replay through
    * the replica frame, then ranks epoch-major by the composed
    * difficulty key instead of the hash permutation; a mismatch
    * isolates the composition tail from the (separately pinned) fit
    * and curriculum stages. */
  def trainingDoremiCurrQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.prepareDoremiCurriculum(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      nShards = 4, rounds = 2, seed = 1L, p = OracleCurationParams)
      .orderBy("doc_id", "copy")
  }

  /** The training-prep manifest with the mixture stage engaged — the
    * SEVEN-operator composition (quality → exact → near-dup →
    * decontam → temperature mix → epoch shuffle → stripe), every step
    * replayed by the oracle. */
  def trainingMixtureQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.summary(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      nShards = 4, seed = 1L,
      OracleCurationParams.copy(sourceAlpha = Some(0.5), mixTargetFrac = 0.4))
  }

  /** The packed token stream in epoch order (contextLen 512, seed 1):
    * curate → shuffle → concat-then-chunk, the writer's exact frame. */
  def trainingPacksQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.packed(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      contextLen = 512L, seed = 1L, p = OracleCurationParams)
  }

  /** BM25 retrieval for the literal query {spark, query, window}:
    * top-10 docs by quantized-integer BM25 (k1 = 1.2, b = 0.75). */
  def bm25Q(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(Tables.documents(spark, dir),
      Seq("spark", "query", "window"), k = 10)

  /** Quality-classifier TRAINING: 2 full-batch logistic steps, src0 as
    * the curated positive set vs the rest of the corpus — the oracle
    * replays both steps (step 1 constant-folds to err = ±500000 since
    * w₀ = 0 ⇒ σ(0) = ½ exactly). */
  def qualityTrainQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.trainQualityClassifier(
      docs.where(col("source") === "src0"),
      docs.where(col("source") =!= "src0"), steps = 2)
      .orderBy("bucket")
  }

  /** BPE tokenizer training: the first 8 learned merges over the
    * corpus. No SQL oracle (the training loop is iterative-argmax, not
    * SQL-expressible) — the driver records the rows-only check; the
    * merge sequence itself is pinned by a hand-computed spec on the
    * Sennrich corpus, and is fully deterministic here. */
  def bpeMergesQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMerges(Tables.documents(spark, dir), numMerges = 8)
      .orderBy("rank")

  /** Per-dimension embedding drift between the even- and odd-id halves
    * of the embeddings table (two stand-in corpus snapshots). */
  def dimensionDriftQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.dimensionDrift(
      emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1))
      .orderBy("dim")
  }

  /** ANN recall measured in-engine, oracle-checked: the IVF arm at a
    * PRUNING config (nprobe 2 of 8 pinned literal centroids — the
    * assignment is SQL-replayable, as e_cluster_sample) scored against
    * brute-force top-5 over 50 queries. One row (n_exact, n_hits,
    * recall_e6): the honest "what does pruning cost on THIS corpus"
    * number an ANN deployment reports next to its speedup. Guard
    * disabled so the plan is the pinned assignment exactly. */
  def annRecallQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.where(col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val q = emb.where(col("vec_id") < 50)
    val ann = Similarity.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 2,
      centroids = Some(cents), hotCellFactor = Double.PositiveInfinity)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
    val nHits = ann.select("q_id", "n_id")
      .join(exact.select("q_id", "n_id"), Seq("q_id", "n_id"))
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(nHits)) // audited single-row attach
      .select(col("n_exact"), col("n_hits"),
        expr("CASE WHEN n_exact = 0 THEN 0 " +
          "ELSE n_hits * 1000000 div n_exact END").as("recall_e6"))
  }

  /** Hard-negative mining (exact arm): top-5 most-similar vectors with
    * a different label, per query — the contrastive-training batch
    * builder. Same rank-only output contract as e_cosine_topk. */
  def hardNegativesQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.hardNegatives(emb, emb.where(col("vec_id") < 20), k = 5)
      .orderBy("q_id", "rank")
  }

  /** Corpus anisotropy on e3-quantized components — exact integers. */
  def anisotropyQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.anisotropy(Tables.embeddings(spark, dir))

  /** SimHash near-dup pairs in the SQL-reproducible configuration
    * (30-bit polyHash signatures), pigeonhole candidates + exact
    * hamming verify at ≤ 1 differing bit. */
  def simhashPairsQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), maxHamming = 1,
      tokenHash = TextAnalysis.polyHash, bits = 30)
      .orderBy("id_a", "id_b")

  /** Candidate-recall audit: SimHash hamming ≤ 2 as the approximate
    * pair proxy, scored against the exact-Jaccard ≥ 0.5 reference —
    * the honest "how much does the cheap proxy miss" row. */
  def dedupEvalQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Eval.pairAgreement(
      Dedup.simhashPairs(docs, maxHamming = 2,
        tokenHash = TextAnalysis.polyHash, bits = 30),
      Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5))
  }

  /** Robust length trim: median ± 3·MAD on n_chars (exact-percentile
    * oracle arm; the default arm sketches at 1e4 accuracy). */
  def lengthOutliersQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthOutliers(Tables.documents(spark, dir), k = 3.0,
      exact = true).orderBy("doc_id")

  /** Zipf slope over the top-100 vocabulary — corpus naturalness. */
  def zipfSlopeQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfSlope(Tables.documents(spark, dir), topN = 100)

  /** Epoch upsampling: 2.5 epochs of src0, 1.2 of src1, 0.4 of src2
    * (the sub-1 path), 1 epoch elsewhere — deterministic fractional
    * copies. */
  def upsampleMixQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.upsampleByEpochs(Tables.documents(spark, dir),
      Map("src0" -> 2.5, "src1" -> 1.2, "src2" -> 0.4))
      .select(col("doc_id"), col("source"), col("copy"))
      .orderBy("doc_id", "copy")

  /** Markup stripping over every document rendered as an HTML page
    * with entities — the extraction step of a crawl pipeline. */
  def stripMarkupQ(spark: SparkSession, dir: String): DataFrame = {
    val pages = Tables.documents(spark, dir).select(col("doc_id"),
      concat(
        lit("<html><body><h1>Doc</h1><p>"), col("text"),
        lit("</p><a href=\"http://x\">"), col("source"),
        lit("</a> &amp; more &lt;raw&gt;</body></html>")).as("text"))
    TextAnalysis.stripMarkup(pages).orderBy("doc_id")
  }

  /** Tokenizer fertility (BPE pretokens per word) by language. */
  def fertilityQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fertilityByGroup(Tables.documents(spark, dir))
      .orderBy("lang")

  /** Incremental SimHash near-dup: docs ≥ 250 are tonight's batch
    * checked against the < 250 corpus — cross pairs only, in the
    * SQL-reproducible 30-bit polyHash configuration. */
  def simhashIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.simhashPairsIncremental(
      docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250),
      maxHamming = 1, tokenHash = TextAnalysis.polyHash, bits = 30)
      .orderBy("id_a", "id_b")
  }

  /** Lexicon screening at a 2% hit-rate policy over a 3-word list. */
  def lexiconFlagsQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexiconFlags(Tables.documents(spark, dir),
      lexicon = Seq("slow", "error", "crash"), maxHitRate = 0.02)
      .orderBy("doc_id")

  /** Embeddings-table data contract: null/dims/NaN/label-domain row
    * checks plus vec_id uniqueness. */
  def embContract(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Contracts
    val emb = Tables.embeddings(spark, dir)
    Contracts.report(emb,
      Seq(
        Contracts.notNull("embedding_not_null", col("embedding")),
        Contracts.Check("dims_64",
          col("embedding").isNull || size(col("embedding")) =!= 64),
        Contracts.Check("no_nan",
          col("embedding").isNull || exists(col("embedding"), x => isnan(x))),
        Contracts.inRange("label_domain", col("label"), lit(0), lit(9))),
      uniqueKeys = Seq("vec_id_unique" -> "vec_id"))
  }

  /** Token-budget selection: best-quality docs per source until the
    * source's token budget is spent (exact running-sum cut). */
  def budgetSelectQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        Dedup.tokens(col("text")).as("w"))
    Sampling.budgetSelect(docs,
      budgets = Map("src0" -> 600L, "src1" -> 300L),
      priority = round(TextAnalysis.qualityScoreOf(col("w"), col("text")), 4),
      tokenCount = size(col("w")),
      defaultBudget = 400L)
      .select(col("doc_id"), col("source"), col("cum_tokens"), col("kept"))
      .orderBy("doc_id")
  }

  /** Per-source quality percentile ranks (ties share a rank) — the
    * quantile-transform view mixture planners threshold against. */
  def qualityRanksQ(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("source"),
        round(TextAnalysis.qualityScoreOf(col("w"), col("text")), 4)
          .as("quality"))
      .withColumn("pctl", percent_rank().over(w))
      .orderBy("doc_id")
  }

  /** Per-source dataset card: volume, median quality, dominant lang,
    * exact-dup share — the release summary table. */
  def sourceCardQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Reports.sourceCard(Tables.documents(spark, dir))
      .orderBy("source")

  /** Order-invariant per-source content checksums — the release
    * integrity manifest. */
  def releaseManifestQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Reports.releaseManifest(Tables.documents(spark, dir))
      .orderBy("source")

  /** Token-overlap F1 with each doc's 20-token prefix as the
    * "prediction" against its full text — the summary-vs-source eval
    * shape (precision pinned at 1, recall = prefix share). */
  def overlapF1Q(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir).select(col("doc_id"),
      array_join(slice(Dedup.tokens(col("text")), 1, 20), " ").as("pred"),
      col("text").as("ref"))
    Eval.textOverlapF1(pairs).orderBy("doc_id")
  }

  /** Per-source dedup-rate report over the exact-Jaccard pair graph. */
  def dedupRateQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.dedupRateBySource(docs,
      Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5))
      .orderBy("source")
  }

  /** Documents↔embeddings coverage: how much of the corpus has a
    * vector (and how many vectors are orphaned) — the alignment gate
    * before any embedding-dependent stage (semantic dedup, ANN) runs
    * on a partially-embedded corpus. Single row of exact counts; the
    * joins carry ids only. */
  def embCoverageQ(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    val e = Tables.embeddings(spark, dir).select(col("vec_id"))
    val nd = d.agg(count(lit(1)).as("n_docs"))
    val ne = e.agg(count(lit(1)).as("n_vecs"))
    val nm = d.join(e, col("doc_id") === col("vec_id"))
      .agg(count(lit(1)).as("n_matched"))
    nd.crossJoin(broadcast(ne)).crossJoin(broadcast(nm)) // single-row attaches
      .select(col("n_docs"), col("n_vecs"), col("n_matched"),
        expr("CASE WHEN n_docs = 0 THEN 0 ELSE n_matched * 1000000 div n_docs END")
          .as("doc_coverage_e6"),
        (col("n_vecs") - col("n_matched")).as("n_orphan_vecs"))
  }

  /** Duplicate-cluster size histogram over the exact-Jaccard pair
    * graph — the release report row after any dedup pass. */
  def clusterSizesQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
      Dedup.jaccardPairsAdaptive(Tables.documents(spark, dir), k = 3,
        threshold = 0.5))
      .groupBy("cluster_id").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("size")

  /** JL sign projection to 16 dims over 1e-3-quantized components —
    * exact integer output, one row per (vec, out_dim). */
  def signProjectQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.signProject(Tables.embeddings(spark, dir))
      .orderBy("vec_id", "out_dim")

  /** Top-5 centroid outliers per label — integer-exact distances. */
  def centroidOutliersQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutliers(Tables.embeddings(spark, dir))
      .orderBy("label", "rk")

  /** Cluster-balanced sample: the first 4 embeddings serve as pinned
    * centroids (cell ≡ centroid vec_id), 25 lowest-hash picks per
    * cell — the oracle replays assignment as a rank-1 cosine join and
    * the pick as the d_stratified_sample hash window. */
  def clusterSampleQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.where(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    Similarity.clusterBalancedSample(emb, cents, perCell = 25)
      .orderBy("cell", "rk")
  }

  /** Integer-exact PageRank centrality over the same pinned mutual-kNN
    * graph as e_knn_graph (1000-vector slice, full-coverage probe so
    * IVF ≡ brute force); 3 power steps, damping 17/20 in floored
    * integer arithmetic — the oracle replays every iteration exactly. */
  def knnCentralityQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnCentrality(
      Tables.embeddings(spark, dir).where(col("vec_id") < 1000), k = 5,
      nlist = 16, nprobe = 16)
      .orderBy("vec_id")

  /** IVF-PQ ANN in its oracle-exact configuration: all cells probed,
    * rerank bound above the corpus size, so ADC prunes nothing and the
    * exact re-rank equals brute force. Realistic (pruning) configs are
    * spec-checked for recall instead — see SimilaritySpec. */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      nlist = 16, nprobe = 16, m = 8, ksub = 16, rerank = 1000000)
      .orderBy("q_id", "rank")
  }

  /** IVFADC (residual-encoded) twin of [[pqTopK]], same exact
    * configuration — the recall edge of residual codes is spec-pinned
    * on clustered fixtures (OpsSpec); here the oracle checks the
    * whole residual plumbing end-to-end. */
  def pqResidualTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      nlist = 16, nprobe = 16, m = 8, ksub = 16, rerank = 1000000,
      residual = true)
      .orderBy("q_id", "rank")
  }

  /** Build-then-serve through the PERSISTED IVF-PQ index
    * ([[graft.ops.PqIndexStore]]): train + encode once into a
    * versioned on-disk store, then answer top-k by scanning the
    * persisted 8-byte code rows — the encode-at-ingest/serve-per-query
    * shape a 100 TB deployment runs, with ZERO training jobs on the
    * serve path (job-count spec-pinned, PqIndexStoreSpec). Exact
    * configuration ⇒ equals brute-force cosine, so the oracle is the
    * same SQL as [[pqTopK]]'s. The index builds ONCE per
    * (session, sfDir) and serves thereafter ([[PqServeStores]] — the
    * tier-cache convention; results are build-count-invariant because
    * training is bit-deterministic and the version stamp never enters
    * the result, spec-pinned). */
  def pqIndexServe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val store = PqServeStores.ensure(spark, dir)
    store.topK(emb, emb.where(col("vec_id") < 20), k = 5, nprobe = 16,
      rerank = 1000000)
      .orderBy("q_id", "rank")
  }

  def quantizeEmb(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(spark, dir)).orderBy("vec_id")

  /** Threshold 0.45 sits in the degenerate-LSH regime (the sizing
    * retains ~233% of all pairs incl. cross-table repeats), so the
    * adaptive router takes the exact block-partitioned plan — same
    * all-pairs oracle, recall exactly 1, none of the 149-table LSH
    * fan-out. At real near-dup thresholds the same call routes to
    * sub-quadratic LSH (spec-pinned both ways). */
  def embNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsAdaptive(Tables.embeddings(spark, dir), threshold = 0.45)
      .orderBy("id_a", "id_b")

  /** The IVF-bucketed twin of [[embNearDups]] — the bucket-bounded
    * scale path (candidates = Σ C(|cell|,2), not a fixed fraction of
    * all pairs). nprobe = 4 of 8 cells: this corpus' 0.45-threshold
    * pairs are FAR pairs (no cosine above 0.6 exists), so boundary
    * straddles need generous probing for the exact-match oracle; at
    * real near-dup thresholds (≥ 0.7, tight pairs) nprobe = 2
    * suffices (spec-measured). */
  def embNearDupsIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfNearDupPairs(Tables.embeddings(spark, dir), threshold = 0.45,
        nlist = 8, nprobe = 4)
      .orderBy("id_a", "id_b")

  /** SDC-prefiltered PQ near-dup pairs in the oracle-exact
    * configuration: same probe geometry as e_ivf_near_dup with the
    * symmetric-PQ prefilter DISABLED (margin ≥ 1 + t), so every
    * cell-pair candidate verifies exactly and the output equals the
    * brute-force oracle. The pruning regime is spec-checked for recall
    * instead (SDC margin on planted near-dups). */
  def embNearDupsPq(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqNearDupPairs(Tables.embeddings(spark, dir), threshold = 0.45,
        nlist = 8, nprobe = 4, sdcMargin = 2.0)
      .orderBy("id_a", "id_b")

  /** Incremental embedding near-dup: vec_id ≥ 250 is "tonight's batch"
    * checked against the < 250 already-indexed corpus — the vector
    * analog of d_minhash_incremental. Same symmetric 4-of-8 probe
    * geometry as e_ivf_near_dup (store indexed with multiple
    * assignment 4, batch probes 4): this corpus' 0.45 pairs are FAR
    * pairs near the all-pairs boundary, so the exact-match oracle
    * needs generous two-sided probing (measured: one-sided assignment
    * misses boundary straddles up to nprobe = 6); planted near-dups at
    * real thresholds pair at assignNprobe = 1, nprobe = 2
    * (spec-measured). */
  def embNearDupsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfNearDupIncremental(
      emb.where(col("vec_id") >= 250), emb.where(col("vec_id") < 250),
      threshold = 0.45, nlist = 8, nprobe = 4, assignNprobe = 4)
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup over the embeddings table at the same threshold the pair
    * demo uses: every vec_id flagged kept/dropped, min id per cosine
    * cluster surviving. The oracle recomputes the closure with a
    * recursive CTE over brute-force cosine pairs. */
  def semanticDedupQ(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(spark, dir), threshold = 0.45)
      .orderBy("vec_id")

  /** Semantic decontamination: vec_id % 5 = 0 plays the benchmark,
    * the rest the corpus; every corpus id flagged kept unless some
    * benchmark vector reaches cosine 0.45. Exactness configuration
    * (nprobe = nlist: every corpus vector probes every cell of the
    * benchmark index), so the flags equal the brute cross scan the
    * oracle runs. */
  def semanticDecontamQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.semanticDecontam(
      emb.where(col("vec_id") % 5 =!= 0), emb.where(col("vec_id") % 5 === 0),
      threshold = 0.45, nlist = 16, nprobe = 16)
      .orderBy("vec_id")
  }

  /** Metadata-filtered ANN: top-5 among label % 3 = 0 vectors (~40% of
    * the corpus), Post arm pinned at the exactness configuration —
    * nprobe = nlist AND oversample·k ≥ |sf0.01 corpus| = 500, so the
    * full-index shortlist is the complete brute ranking and the
    * survivor re-rank equals brute force over the filtered corpus.
    * The Pre arm and Auto routing are spec-pinned equal instead (one
    * oracle row isolates the shared shortlist/semi-join/re-rank
    * machinery). */
  def filteredTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.filteredTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      predicate = col("label") % 3 === 0,
      nlist = 16, nprobe = 16, oversample = 100,
      mode = Similarity.FilteredMode.Post)
      .orderBy("q_id", "rank")
  }

  /** Metadata-filtered serve from the PERSISTED PQ index (the shape
    * where Post-filtering earns its keep — §G20) at the exactness
    * configuration: nprobe = nlist = 16, oversample·k = 500 ≥ |sf0.01
    * corpus| and rerank auto-sized to the shortlist, so the shortlist
    * is the full exact ranking and top-5-of-survivors equals brute
    * force over the filtered corpus. Predicate label % 3 = 1 — a
    * DIFFERENT survivor set than e_filtered_topk, so the two rows
    * cannot mask each other's filters. Serves from the SAME
    * once-per-process store as [[pqIndexServe]] ([[PqServeStores]]):
    * both rows read the index immutably, so sharing is safe, and the
    * serve paths they exercise (plain topK vs the filtered escalation
    * ladder) stay distinct. */
  def pqFilteredServe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val store = PqServeStores.ensure(spark, dir)
    store.filteredTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      predicate = col("label") % 3 === 1, nprobe = 16, oversample = 100)
      .orderBy("q_id", "rank")
  }

  /** Misra–Gries heavy hitters at capacity 64 — emitted in the
    * deterministic, oracle-checkable shape: only tokens whose EXACT
    * frequency clears the guarantee line n/(capacity+1) (all provably
    * present in the summary, on any merge order), each with its exact
    * count and a boolean asserting the summary honored the MG bound
    * (present, est ≤ exact, exact − est ≤ n/(capacity+1)). The oracle
    * recomputes the qualifying set and pins ok = true. */
  def heavyHittersQ(spark: SparkSession, dir: String): DataFrame = {
    val cap = 64
    val docs = Tables.documents(spark, dir)
    val mg = TextAnalysis.heavyHitters(docs, capacity = cap)
      .withColumnRenamed("est", "__est")
    // lazily checkpointed: the n-scalar probe below materializes the
    // tokenize+groupBy once and the returned plan reuses the blocks —
    // without it the corpus would be tokenized and shuffled twice
    val exact = docs
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      // lazy-safe: materialized single-site by the n-scalar head() below
      .sharedCheckpoint(eager = false)
    // measured scalar (same pattern as the adaptive dedup plans): one
    // count job instead of a vocab-wide global window or a 1-row
    // nested-loop cross join
    val n = { val r = exact.agg(sum(col("freq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) }
    exact
      .where(col("freq") * (cap + 1) > lit(n))
      .join(broadcast(mg), Seq("token"), "left")
      .select(col("token"), col("freq"),
        (col("__est").isNotNull && col("__est") <= col("freq") &&
          (col("freq") - col("__est")) * (cap + 1) <= lit(n)).as("ok"))
      .orderBy("token")
  }

  /** Approximate per-language token-count quantiles via the SAME HDR
    * sketch aggregate the metrics engine runs on — the sketch path is
    * how quantiles survive 100 TB (map-side mergeable partials, a few
    * hundred bytes per group, no full sort). Emitted in the invariant
    * shape (cf. d_hll_users): the exact discrete quantile (rank
    * round-half-up of p·n — HDR's own rank rule) plus a boolean
    * asserting the sketch landed inside its quantization envelope
    * [lowestEquivalentValue(v), v] — width 1 below 2048, one
    * 2^(⌊log2 v⌋−10) sub-bucket above. The oracle recomputes the exact
    * quantiles and pins the booleans true. */
  def approxQuantilesQ(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ensureRegistered(spark)
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, dir)
      .select(col("lang"), size(Dedup.tokens(col("text"))).cast("long").as("v"))
    val sk = base.groupBy("lang")
      .agg(graft.functions.hdr_summary(graft.functions.hdr_sketch(col("v"))).as("s"))
      .select(col("lang"), col("s.p50").as("a50"), col("s.p99").as("a99"))
    val w = Window.partitionBy("lang").orderBy("v")
    val ranked = base
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
    def rankOf(p: Double) =
      greatest(lit(1L), floor(lit(p) * col("cnt") + 0.5).cast("long"))
    val exact = ranked.groupBy("lang").agg(
      max(when(col("rn") === rankOf(0.50), col("v"))).as("p50_exact"),
      max(when(col("rn") === rankOf(0.99), col("v"))).as("p99_exact"))
    // HDR returns the bucket's highestEquivalentValue: the true sample
    // at that rank lies in [v − (2^bi − 1), v], bi = 0 below 2048
    def lowEq(c: Column): Column = {
      val bi = when(c < 2048L, lit(0.0)).otherwise(floor(log2(c)) - 10.0)
      c - (pow(lit(2.0), bi).cast("long") - 1L)
    }
    exact.join(sk, "lang")
      .select(col("lang"), col("p50_exact"), col("p99_exact"),
        col("p50_exact").between(lowEq(col("a50")), col("a50")).as("p50_ok"),
        col("p99_exact").between(lowEq(col("a99")), col("a99")).as("p99_ok"))
      .orderBy("lang")
  }

  /** Hashed-linear quality classifier scores over the documents
    * table: 4096 hash buckets, deterministic per-bucket weights (the
    * oracle replays the polynomial hash + weight formula in SQL). */
  def qualityClfQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashedLinearScore(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** DSIR importance weights: src0 is the high-quality TARGET set, the
    * other 19 sources are the raw corpus to be re-weighted toward it. */
  def dsirWeightsQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Sampling.importanceWeights(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"))
      .orderBy("doc_id")
  }

  /** Deterministic DSIR selection: the 50 most target-like raw docs. */
  def dsirSelectQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Sampling.importanceSelect(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"), k = 50)
      .orderBy("doc_id")
  }

  /** Token-budget mixture plan: spend 50% of the corpus's tokens with
    * source shares src0 50 / src1 30 / default 5 (percent). */
  def mixturePlanQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixturePlan(Tables.documents(spark, dir),
      sharesPct = Map("src0" -> 50, "src1" -> 30), defaultPct = 5)
      .orderBy("source")

  /** Leakage-safe split over the exact-Jaccard duplicate graph the
    * d_dup_clusters query exposes: cluster members always land on the
    * same side; ~10/97 of representatives go to test. */
  def splitAssignQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.leakageSafeSplit(docs,
      Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5))
      .orderBy("doc_id")
  }

  /** The hybrid text+vector curation funnel: the 5-stage text pipeline
    * plus a semantic (embedding-cosine) dedup tail over survivors'
    * aligned embeddings (vec_id ≡ doc_id in the fixtures). Stage 6
    * rides the IVF-bucketed pair source — the measured scale path
    * (BASELINE.md §G: bucket-bounded candidates where recall-sized LSH
    * at this threshold retains ~30% of ALL pairs) — in e_ivf_near_dup's
    * oracle-exact geometry; CurationSpec pins funnel equality against
    * the LSH tail on this corpus. */
  def curationSemantic(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.runWithSemantic(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      Tables.embeddings(spark, dir),
      OracleCurationParams.copy(semanticIvfNlist = Some(8), semanticIvfNprobe = 4))._2
  }

  /** Per-document drop attribution through the 5-stage funnel: one row
    * per corpus doc with the FIRST stage that dropped it (or 'kept') —
    * the audit trail behind d_curation_funnel's aggregate counts. Same
    * oracle configuration (Exact pair source). */
  def curationAuditQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.audit(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams)
      .orderBy("doc_id")
  }

  /** The 7-stage hybrid funnel with the embedding-space decontamination
    * tail: vec_id % 7 = 0 plays the benchmark EMBEDDING set (the
    * paraphrased-eval gate — a different split than the % 10 = 0 text
    * benchmark, so the two decontamination stages cannot mask each
    * other). nprobe = nlist = 8: both the semantic-dedup and decontam
    * indexes probe every cell, so the funnel equals the brute cosine
    * replay the oracle runs. */
  def curationSemDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    graft.ops.Curation.runWithSemantic(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      emb,
      OracleCurationParams.copy(semanticIvfNlist = Some(8), semanticIvfNprobe = 8),
      benchEmb = Some(emb.where(col("vec_id") % 7 === 0)))._2
  }

  /** Cross-document repeated 8-token spans (exact-substring-dedup
    * signal): per-doc span counts and shared ratio. */
  def repeatedSpansQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repeatedSpans(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** Exact-substring excision over the full corpus: keep-first span
    * dedup at the same 8-token window [[repeatedSpansQ]] detects. */
  def spanDedupQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.spanDedup(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** Incremental span excision: the d_dedup_incremental split (new =
    * doc_id ≥ 250) against the seen corpus's persisted gram store. */
  def spanIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.spanDedupIncremental(
      docs.where(col("doc_id") >= 250),
      TextAnalysis.spanGramStore(docs.where(col("doc_id") < 250)))
      .orderBy("doc_id")
  }

  /** Span-level decontamination against the every-10th-doc benchmark
    * split [[containmentReportQ]] uses. */
  def decontamSpansQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.decontaminateSpans(
      docs.where(col("doc_id") % 10 =!= 0),
      docs.where(col("doc_id") % 10 === 0))
      .orderBy("doc_id")
  }

  /** Corpus-level benchmark containment, same every-10th-doc split the
    * curation funnel uses as its held-out benchmark. */
  def containmentReportQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.containmentReport(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0))
  }

  /** Inverted-index postings: df ≥ 5 tokens with their first 10 doc
    * ids (comma-joined so the driver hash compares a plain string). */
  def postingsQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.postings(Tables.documents(spark, dir), maxPostings = 10, minDf = 5L)
      .select(col("token"), col("df"),
        concat_ws(",", col("doc_ids")).as("doc_ids"))
      .orderBy("token")

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.syntheticMedia(Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** Real codec round trip: encode each doc as an actual PNG/BMP (JDK
    * ImageIO) or RIFF/PCM16 WAV, then fully decode the bytes and emit
    * pixel/sample statistics. Content derives from the text's char
    * length, so the oracle recomputes the decoded stats in SQL. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.realMedia(Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** Decode → nearest-neighbor resize (8×6 images, 16-sample audio) →
    * features, over the real codec bytes; the oracle replays the NN
    * source-index arithmetic on the synthetic pixel/sample formulas. */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeFeatures(
      Multimodal.realMedia(Tables.documents(spark, dir)),
      targetW = 8, targetH = 6, targetSamples = 16)
      .orderBy("media_id")

  /** Frame sampling over the synthetic media bytes (every 4th byte as
    * a "frame" feature) — the video-sampling batch shape with the
    * decoder stubbed at the documented seam; byte↔char bijection makes
    * the oracle a character-position replay. Output is EXPLODED to one
    * (media_id, frame_idx, frame_byte) row per sampled frame: the gate
    * hashes primitive cells, and an array-typed column is opaque to it
    * (the r7 driver artifact could not adjudicate the array shape). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSampleRows(
      Multimodal.syntheticMedia(Tables.documents(spark, dir)), stride = 4)
      .orderBy("media_id", "frame_idx")

  /** LOSSY codec round trip (the r12 "where most real bytes live"
    * seam, closed): every doc encoded as a REAL JPEG (ImageIO, gray,
    * quality 1.0) and fully decoded back. Lossy sums aren't
    * SQL-predictable, so the deterministic claims are exact dimensions
    * plus a per-pixel |err| ≤ 2 tolerance flag — measured headroom 2×
    * over the observed ≤ 1 envelope, and an all-gray fake decode fails
    * it outright. */
  def multimodalJpeg(spark: SparkSession, dir: String): DataFrame =
    Multimodal.jpegFeatures(
      Multimodal.jpegMedia(Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** ANIMATED container round trip: every doc encoded as a real
    * multi-frame GIF ((len % 4) + 2 full-size gray frames through the
    * sequence writer), every frame decoded back — one row per frame
    * with its EXACT pixel sum (gray-palette GIF is lossless), so the
    * oracle replays frame count, dims, and per-frame content in SQL. */
  def multimodalGif(spark: SparkSession, dir: String): DataFrame =
    Multimodal.gifFrameFeatures(
      Multimodal.gifMedia(Tables.documents(spark, dir)))
      .orderBy("media_id", "frame_idx")

  /** REAL VIDEO container round trip (the r13 verdict's top missing
    * item): every doc encoded as an MJPEG-in-AVI — (len % 4) + 2
    * quality-1.0 JPEG frames muxed into a genuine RIFF/AVI with stream
    * headers and index — then demuxed by walking the container's
    * '00dc' chunks and decoded frame-by-frame through the real JPEG
    * reader. Lossy frames aren't sum-predictable, so the oracle pins
    * frame count (from the container, cross-checked against avih),
    * exact dims, and the per-pixel |err| ≤ 2 tolerance flag per frame
    * (the d_multimodal_jpeg contract, per video frame). */
  def multimodalVideo(spark: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(
      Multimodal.aviMedia(Tables.documents(spark, dir)))
      .orderBy("media_id", "frame_idx")

  /** RAW video container round trip: the same frame geometry through
    * Y4M (YUV4MPEG2, Cmono) — uncompressed planes survive EXACTLY, so
    * unlike the MJPEG tolerance contract this gets the full SQL-value
    * oracle (per-frame pixel sums), the gif contract on a genuine
    * video container. */
  def multimodalY4m(spark: SparkSession, dir: String): DataFrame =
    Multimodal.y4mFrameFeatures(
      Multimodal.y4mMedia(Tables.documents(spark, dir)))
      .orderBy("media_id", "frame_idx")

  /** ISO-BMFF (MP4) container round trip — the dominant real-world
    * video container (r14 verdict's next-container item): every doc
    * muxed as motion-JPEG samples behind full moov/trak/stbl sample
    * tables (stsd 'jpeg', stts/stsc/stsz/stco; per-doc chunking so the
    * corpus exercises the stsc chunk-run mapping), then demuxed by the
    * real box walk and decoded frame-by-frame under the
    * d_multimodal_video tolerance contract. */
  def multimodalMp4(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mp4FrameFeatures(
      Multimodal.mp4Media(Tables.documents(spark, dir)))
      .orderBy("media_id", "frame_idx")

  /** LOSSY AUDIO round trip (completes the image/video/audio lossy
    * triad): every doc companded through the real ITU-T G.711 μ-law
    * codec into a format-7 WAV (18-byte fmt, mandatory fact chunk),
    * then demuxed by the chunk walk and judged sample-by-sample within
    * each segment's μ-law quantization bound — the JPEG tolerance
    * contract on audio. */
  def multimodalMulaw(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mulawFeatures(
      Multimodal.mulawMedia(Tables.documents(spark, dir)))
      .orderBy("media_id")

  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("b"))
      .select(
        col("doc_id"),
        size(col("b")).cast("long").as("n_bpe"),
        size(array_distinct(col("b"))).cast("long").as("n_bpe_distinct"))
      .orderBy("doc_id")

  def langIdPredictions(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // materialize the token array first: langIdOf references it once
      // per marker set and HOF subtrees are not CSE'd — inline tokens()
      // would run the tokenizer 4x per row
      .select(col("doc_id"), col("lang"), Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langIdOf(col("w")).as("predicted"))
      .select(
        col("doc_id"),
        col("predicted"),
        (col("predicted") === col("lang")).cast("int").as("matches_label"))
      .orderBy("doc_id")

  /** Corpus vocabulary: the 100 most frequent normalized tokens with a
    * deterministic tie-break — the frequency table a BPE/vocab build
    * starts from. One explode + one count shuffle carrying (token hash,
    * count) partials; top-k is a driver-size result. */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(100)
  }

  /** Sessionization: split each user's event stream on >30 min gaps —
    * the canonical behavioral-data prep step. One shuffle (window by
    * user), session id = cumulative gap-break count; emits per-session
    * bounds and size. */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"))
      .withColumn("gap", col("ts_ms") - lag("ts_ms", 1).over(byUser))
      .withColumn("brk", when(col("gap").isNull || col("gap") > 1800000L, 1L).otherwise(0L))
      .withColumn("session", sum("brk").over(byUser))
      .groupBy("user_id", "session")
      .agg(min("ts_ms").as("session_start"), max("ts_ms").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session")
  }

  /** As-of join on the events stream: each error event paired with the
    * same user's most recent purchase at-or-before it. */
  def asofPurchaseGap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"), col("event_id").as("purchase_id"))
    graft.ops.AsOf.asofJoin(errors, purchases, "user_id", "ts_ms", Seq("purchase_id"))
      .where(col("ts_ms_asof").isNotNull)
      .select(col("event_id"), col("purchase_id_asof").as("purchase_id"),
        (col("ts_ms") - col("ts_ms_asof")).as("gap_ms"))
      .orderBy("event_id")
  }

  /** HLL distinct with an oracle-checkable invariant: emits the exact
    * count plus a boolean asserting the HLL++ estimate lands within 5%
    * of it. DuckDB cannot reproduce Spark's HLL bytes, but it CAN
    * assert the invariant — the oracle emits the exact count and a
    * literal TRUE, so any estimator drift beyond the advertised error
    * hash-mismatches. rsd = 0.01 makes the 5% check a 5-sigma bound
    * (the default 0.05 is a 1-sigma sketch and fails it ~1/3 of the
    * time — observed at sf0.1); the cost is a ~16 KiB register array
    * per group, flat in row count. The estimate itself is excluded
    * from the output on purpose (it is implementation-defined). */
  def hllUsers(spark: SparkSession, dir: String): DataFrame =
    // dedupe (event_type, user_id) first, then count + sketch the
    // distinct frame: HLL insertion is idempotent, so the estimate is
    // identical to sketching the raw stream, and the plan avoids the
    // Expand (row-doubling) a mixed exact+approx distinct agg needs —
    // map-side partial dedupe does the heavy lifting at scale
    Tables.events(spark, dir)
      // drop NULL users before counting: count(*) over the distinct
      // frame would count a (type, NULL) row that both the HLL sketch
      // and the oracle's COUNT(DISTINCT) ignore
      .select(col("event_type"), col("user_id"))
      .where(col("user_id").isNotNull)
      .distinct()
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("event_type")

  /** ~10% deterministic id-hash sample (10 of 97 buckets). */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.hashSample(Tables.documents(spark, dir), keepBuckets = 10)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Up to 5 docs per language, deterministically pseudo-random. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(spark, dir), "lang", k = 5)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")

  /** Mixture sampling: per-language keep fractions (en 100%, de 50%,
    * fr 20%, everything else 10%) — deterministic hash thresholds, so
    * the oracle reproduces the selection bit-for-bit. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(Tables.documents(spark, dir), "lang",
      Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.2), defaultFraction = 0.1)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  def repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramRepetition(Tables.documents(spark, dir)).orderBy("doc_id")

  def redactDocs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.redact(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Duplicate clusters: connected components over the exact-Jaccard
    * pair graph at threshold 0.5 (the same pair set d_jaccard_pairs
    * emits), each doc labelled with its component's min id. The oracle
    * recomputes the closure with a recursive CTE. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
      Dedup.jaccardPairsAdaptive(Tables.documents(spark, dir), k = 3, threshold = 0.5))
      .orderBy("doc_id")

  /** Keep-2 soft dedup over the [[dupClusters]] graph: ids surviving
    * the per-cluster cap. */
  def dedupCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.capClusters(docs,
        Dedup.dupClusters(Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5)),
        keepPerCluster = 2)
      .select("doc_id").orderBy("doc_id")
  }

  /** Seeded deterministic corpus permutation (epoch 1). */
  def epochShuffleQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochShuffle(Tables.documents(spark, dir), seed = 1L)
      .orderBy("doc_id")

  /** Curation funnel: quality → exact dedup → near-dup clusters →
    * decontamination over the documents table (every 10th doc plays
    * the held-out benchmark), reporting survivors per stage. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.funnel(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams)
  }

  /** The curation funnel through the DEFAULT pair source
    * ([[graft.ops.Curation.PairSource.Auto]]) — the round-11 scale-safe
    * default on the driver correctness surface: at this corpus size the
    * survivor count sits below [[graft.ops.Curation
    * .AutoMinHashSurvivors]], so Auto must resolve to exact Jaccard and
    * the funnel must equal d_curation_funnel bit-for-bit (the SQL
    * oracle IS the same funnel replay). A regression here means the
    * auto-threshold routing broke, not the stage math. */
  def curationAutoQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.funnel(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams.copy(pairSource = graft.ops.Curation.PairSource.Auto()))
  }

  /** Curriculum training order: curate → short-to-long token-count
    * order with a seeded within-length shuffle → stripe. The oracle
    * replays the funnel prefix, the three-part sort key, and the
    * striping. */
  def trainingCurriculumQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TrainingRun.prepareCurriculum(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      nShards = 4, seed = 1L, p = OracleCurationParams)
      .orderBy("doc_id")
  }

  /** The (doc_id, score, y) frame shared by the three quality-vs-
    * Gopher evals — the Scala twin of the oracle-side
    * [[QualityLabelCtes]], so a threshold or tokenizer tweak lands in
    * exactly one place on each side. */
  private def qualityVsGopher(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("text"), Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        round(TextAnalysis.qualityScoreOf(col("w"), col("text")), 4).as("score"))
    val labels = TextAnalysis.gopherRules(docs, minWords = 20L, maxWords = 80L)
      .select(col("doc_id"), col("keep").cast("long").as("y"))
    scored.join(labels, "doc_id")
  }

  /** ROC-AUC of the heuristic quality score against the Gopher-rule
    * keep label — "does the cheap score rank rule-passing docs above
    * failing ones", the calibration diagnostic run before trusting a
    * quality threshold. Tie-averaged ranks in exact integers. */
  def qualityAucQ(spark: SparkSession, dir: String): DataFrame =
    Eval.rocAuc(qualityVsGopher(spark, dir), "score", "y")

  /** Precision–recall curve of the quality score against the
    * Gopher-rule keep label — one operating point per distinct score,
    * the frame a minQuality threshold decision is read off. */
  def qualityPrQ(spark: SparkSession, dir: String): DataFrame =
    Eval.prCurve(qualityVsGopher(spark, dir), "score", "y")

  /** Calibration bins of the quality score against the Gopher keep
    * label — empirical positive rate per score decile, the "is the
    * score a probability" reliability diagram. */
  def qualityBinsQ(spark: SparkSession, dir: String): DataFrame =
    Eval.calibrationBins(qualityVsGopher(spark, dir), nBins = 10, "score", "y")

  /** MMR diverse top-k (λ = 0.7) over the exact brute-force shortlist:
    * the greedy pick-by-pick rerank replayed by the oracle in exact
    * integers (1e6-floored cosines — probed bit-identical between the
    * engines; all downstream arithmetic integer). */
  def mmrTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Retrieval.mmrTopK(emb, emb.where(col("vec_id") < 20),
      k = 5, depth = 12, lambdaE6 = 700000L)
  }

  /** The production MMR composition on the oracle surface:
    * [[Retrieval.mmrTopKIvf]] = IVF shortlist → in-task local rerank.
    * At nprobe = nlist the shortlist degenerates to an exact full scan
    * (the e_ivf_topk pattern), so the oracle is the SAME unrolled
    * k-round greedy replay as e_mmr_topk — a mismatch here isolates
    * the local-rerank arm or the shortlist routing from the greedy
    * math (§G18 additionally verifies local ≡ global at 200k
    * vectors). */
  def mmrIvfQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Retrieval.mmrTopKIvf(emb, emb.where(col("vec_id") < 20),
      k = 5, depth = 12, lambdaE6 = 700000L, nlist = 16, nprobe = 16)
  }

  /** Ordered view → click → purchase conversion funnel. Cascade
    * comparisons run on epoch-ms (`ts_ms`), the engine's native time
    * unit, so the oracle's epoch_ms(ts) sees identical values. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.funnel(
      Tables.events(spark, dir), Seq("view", "click", "purchase"), tsCol = "ts_ms")

  /** The same funnel with a 2 h conversion window per transition —
    * the greedy-earliest bounded cascade. */
  def eventFunnelWithin(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.funnel(
      Tables.events(spark, dir), Seq("view", "click", "purchase"),
      tsCol = "ts_ms", withinMs = Some(7200000L))

  /** Sessionized funnel: conversions counted per 30-min-gap VISIT. */
  def sessionFunnelQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.sessionFunnel(
      Tables.events(spark, dir), Seq("view", "click", "purchase"),
      tsCol = "ts_ms")

  /** Session topline: count, bounce rate, duration percentiles. */
  def sessionStatsQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.sessionStats(Tables.events(spark, dir),
      tsCol = "ts_ms")

  /** Data-contract gate over the documents table — the corpus-side
    * twin of e_data_contract (the check a crawl-drop promotion job
    * asserts before curation even starts). */
  def docContract(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Contracts
    val docs = Tables.documents(spark, dir)
    Contracts.report(docs,
      Seq(
        Contracts.notNull("text_not_null", col("text")),
        Contracts.notNull("lang_not_null", col("lang")),
        Contracts.Check("source_shaped",
          col("source").isNull || !col("source").startsWith("src")),
        Contracts.Check("n_chars_consistent",
          col("n_chars").isNull || col("n_chars") =!= length(col("text")))),
      uniqueKeys = Seq("doc_id_unique" -> "doc_id"))
  }

  /** Weekly retention cohorts over the events table (cohort = Monday
    * week of a user's first event). */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.retentionCohorts(Tables.events(spark, dir))

  /** Deterministic 16-way shard assignment over the documents table
    * (the write-side layout is spec-tested; this pins the assignment
    * function bit-for-bit against the oracle). */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusShards.assign(Tables.documents(spark, dir), nShards = 16)
      .select(col("doc_id"), col("shard"))
      .orderBy("doc_id")

  /** Top-20 3-step event sequences (per-user time order, ties broken
    * by event_id) — the classic user-journey n-gram. */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(20)
  }

  /** Hourly per-type event-rate anomalies: count vs trailing-24h
    * mean + 2σ, exact integer window sums so the float math is one
    * fixed expression in both engines. */
  def rateAnomalies(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.rateAnomalies(Tables.events(spark, dir))

  /** Per-doc mean token log-prob under the corpus unigram MLE — the
    * cheap LM-quality signal; exact-integer sums (ln quantized to 1e-6)
    * so DuckDB reproduces it bit-for-bit. */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Interpolated bigram LM scoring (λ = 0.7) — the perplexity-filter
    * rung above the unigram signal; the oracle replays the exact
    * λ/backoff double literals. */
  def bigramLogProb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The Gopher heuristic rule battery: per-rule booleans + keep, all
    * integer-ratio exact. Bounds tuned to the driver corpus's 10–99
    * word docs so every rule discriminates. */
  def gopherRulesQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(Tables.documents(spark, dir),
      minWords = 20L, maxWords = 80L).orderBy("doc_id")

  /** CCNet-style perplexity terciles per source over the bigram LM
    * score — head/middle/tail bucket ids, NTILE-deterministic. */
  def ppxBucketsQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** Per-doc unigram entropy — the information-density quality signal
    * (keyword-stuffed pages score low, natural prose high); a pure
    * per-row projection, no shuffle. */
  def tokenEntropyQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Per-source token-distribution KL against the corpus marginal —
    * quantized-integer exact, the drift/domain-shift magnitude. */
  def sourceKlQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceTokenKl(Tables.documents(spark, dir)).orderBy("source")

  /** Batch-vs-reference drift: odd docs scored against the even half's
    * token counts — signed mean log-ratio + OOV mass, one row. */
  def tokenDriftQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.tokenDrift(
      docs.where(col("doc_id") % 2 === 1),
      TextAnalysis.tokenCounts(docs.where(col("doc_id") % 2 === 0)))
  }

  /** Concat-then-chunk packing of the corpus into 512-token contexts
    * via the two-level distributed prefix sum (see [[graft.ops.Packing]]);
    * small bucket size so the sf corpora actually exercise the
    * bucket-offset path. */
  def packContexts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packAssignments(Tables.documents(spark, dir),
      contextLen = 512L, bucketSize = 64L)

  /** Context-length tradeoff curve over four candidate lengths — the
    * pad/truncate/split cost report a trainer reads before picking L
    * (see [[graft.ops.Packing.efficiencyReport]]). */
  def packEfficiencyQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.efficiencyReport(Tables.documents(spark, dir),
      contextLens = Seq(64L, 128L, 256L, 512L), bucketSize = 64L)

  /** One-shot DoReMi-style hard-domain reweighting off the corpus's
    * own bigram-LM excess loss (see [[Sampling.hardDomainWeights]]). */
  def domainReweightQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.hardDomainWeights(Tables.documents(spark, dir))

  /** ITERATIVE DoReMi (2 rounds): round 2 re-fits the bigram reference
    * on the round-1-reweighted mixture before re-scoring — see
    * [[Sampling.doremiWeights]]; the oracle unrolls both rounds. */
  def doremiWeightsQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.doremiWeights(Tables.documents(spark, dir), rounds = 2)

  /** Matryoshka dim-prefix recall: serve quality at 1/8 .. 1/1 of the
    * vector bytes (see [[Similarity.dimPrefixRecall]]). */
  def dimPrefixRecallQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.dimPrefixRecall(emb, emb.where(col("vec_id") < 20), k = 5,
      prefixes = Seq(8, 16, 32, 64))
  }

  /** Dim-prefix IVF SERVE ([[Similarity.dimPrefixTopK]]) in its
    * exactness envelope: the probe stage runs entirely on the first 16
    * of 64 dims, but `nprobe = nlist` + corpus-sized rerank makes the
    * shortlist exhaustive, so the full-width rerank equals brute-force
    * cosine bit-for-bit — the oracle is the same SQL as
    * [[ivfTopK]]'s (e_ivf_topk's pattern: the machinery under test is
    * the prefix probe + rerank plumbing; recall of the PRUNED config
    * follows e_dim_prefix_recall's curve, spec-measured). */
  def dimPrefixTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.dimPrefixTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      prefix = 16, nlist = 16, nprobe = 16, rerank = 1000000)
      .orderBy("q_id", "rank")
  }

  /** §G14b promoted to the driver surface (r10 verdict stretch): the
    * dim-prefix serve at d = 512 — the regime MRL serving is designed
    * for and the one plan ScaleBench measured winning 11.8× at
    * 500k×512d. Vectors are the 64-d table TILED 8× (cosine is
    * invariant under tiling: dot and both norms scale by 8, so the
    * ranking and the recall semantics are identical to the 64-d rows
    * while the byte/flop scaling is honestly 512-d); the probe stage
    * runs on the 64-d prefix, and the same exactness envelope as
    * [[dimPrefixTopKQ]] (nprobe = nlist, corpus-sized rerank) makes
    * the result equal brute-force cosine bit-for-bit. The oracle
    * replays the tiling explicitly. */
  def dimPrefixW512Q(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "flatten(array_repeat(embedding, 8)) AS embedding")
    Similarity.dimPrefixTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      prefix = 64, nlist = 16, nprobe = 16, rerank = 1000000)
      .orderBy("q_id", "rank")
  }

  /** Document-level PMI over the top-100 vocabulary (pairs seen in ≥ 5
    * docs) — pair space capped at C(100,2) whatever the corpus size. */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiPairs(Tables.documents(spark, dir))

  /** Per-source corpus mix report: doc/token counts, corpus token
    * share, and exact-duplicate rate by source — the table a data-
    * mixing decision reads first. Dup flags ride a digest-partitioned
    * row_number (the same digest key as [[Dedup.exact]]); the share
    * denominator is a window over the already-aggregated per-source
    * frame (a handful of rows), so nothing wide is single-partition. */
  /** Intra-document repeated-line dedup: keep-first per normalized
    * non-blank line, blank lines preserved as structure. */
  def dedupLinesQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupLines(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Pairwise source content-overlap matrix (mirror detection). */
  def sourceOverlapQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.sourceOverlap(Tables.documents(spark, dir))
      .orderBy("source_a", "source_b")

  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val flagged = docs
      .select(col("source"), col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_toks"),
        sha2(Dedup.normText(col("text")), 256).as("dg"))
      .withColumn("is_dup",
        (row_number().over(Window.partitionBy("dg").orderBy("doc_id")) > 1).cast("long"))
    val bySource = flagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("is_dup").as("n_dups"))
    bySource
      .withColumn("token_share",
        round(col("n_tokens").cast("double") /
          sum("n_tokens").over(Window.partitionBy()).cast("double"), 4))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_dups"),
        col("token_share"))
      .orderBy("source")
  }

  /** Token frequency-of-frequencies (Zipf spectrum): for each corpus
    * frequency, how many distinct tokens occur exactly that often —
    * the vocabulary-health curve. Two cascaded counts, both with
    * map-side partials. */
  def freqSpectrum(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_tokens"))
      .orderBy("freq")

  /** Document-length histogram in power-of-two bins (bin = bit length
    * of n_chars — pure integer arithmetic, so any engine bins
    * identically; log2+floor would be one ulp from disagreeing at
    * exact powers of two). */
  def lenHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(length(bin(col("n_chars"))).cast("long").as("len_bin"),
        col("n_chars"))
      .groupBy("len_bin")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("len_bin")

  /** Embedding-space label audit: each query vector's label vs the
    * majority label of its 5 nearest neighbors. */
  def knnLabels(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.knnLabelAgreement(emb, emb.where(col("vec_id") < 20), k = 5)
  }

  /** Snapshot diff between a simulated previous corpus version
    * (doc_id % 10 ≠ 3) and tonight's crawl (doc_id % 13 ≠ 5, docs at
    * doc_id % 17 = 0 edited) — every change kind exercised. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = docs.where(col("doc_id") % 10 =!= 3)
    val neu = docs.where(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    graft.ops.SnapshotDiff.diff(old, neu).orderBy("doc_id")
  }

  /** Exact rolling DAU/WAU + stickiness per day — events reduce to
    * distinct (user, day) before anything wide. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.activeUsers(Tables.events(spark, dir))

  /** Data-contract gate over the events table: row checks in one
    * scan + a key-uniqueness check; the report a batch-promotion job
    * asserts on. */
  def dataContract(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Contracts
    val ev = Tables.events(spark, dir)
    Contracts.report(ev,
      Seq(
        Contracts.notNull("user_id_not_null", col("user_id")),
        Contracts.inSet("event_type_known", col("event_type"),
          Seq("view", "click", "purchase", "error", "signup")),
        Contracts.Check("value_non_negative", col("value").isNull || col("value") < 0),
        Contracts.notNull("ts_present", col("ts"))),
      uniqueKeys = Seq("event_id_unique" -> "event_id"))
  }

  /** Per-doc sentence count and mean sentence length. */
  def sentenceStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sentenceStats(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Views within ±5 min of an error event, per error: a point-in-
    * interval range join rewritten as a time-bin equi-join (no
    * nested-loop node; see [[graft.ops.RangeJoin]]), then one count
    * aggregate. */
  def errorWindowViews(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val errs = e.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (col("ts_ms") - 300000L).as("w_start"),
        (col("ts_ms") + 300000L).as("w_end"))
    val views = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts_ms").as("v_ts"))
    graft.ops.RangeJoin
      .pointInInterval(views, errs, "v_ts", "w_start", "w_end", binWidth = 600000L)
      .groupBy("error_id").agg(count(lit(1)).as("n_views"))
      .orderBy("error_id")
  }

  /** Top-3 TF-IDF terms per document — deterministic rank (rounded
    * score desc, token asc). */
  def tfidfTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(Tables.documents(spark, dir), k = 3)
      .orderBy("doc_id", "rnk")

  /** Exact token-count quantiles per language (linear interpolation —
    * Spark `percentile` ≡ DuckDB `quantile_cont`). */
  def tokenLenQuantiles(spark: SparkSession, dir: String): DataFrame =
    tokenLenQuantiles0(Tables.documents(spark, dir))

  private[graft] def tokenLenQuantiles0(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), size(Dedup.tokens(col("text"))).as("n_toks"))
      .groupBy("lang")
      .agg(
        round(expr("percentile(n_toks, 0.25)"), 4).as("p25"),
        round(expr("percentile(n_toks, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_toks, 0.75)"), 4).as("p75"),
        round(expr("percentile(n_toks, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Hybrid retrieval: BM25 for {spark, query, window} fused (RRF,
    * kRrf = 60, floor-quantized contributions) with the
    * exact-configuration IVF dense ranking for query vector 0 — both
    * arms cut at depth 20, fused top-10. The oracle replays both
    * rankings and the fusion. */
  def hybridTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val dense = Similarity.ivfTopK(emb, emb.where(col("vec_id") === 0), k = 20,
      nlist = 16, nprobe = 16)
    Retrieval.hybridTopK(docs, dense, Seq("spark", "query", "window"),
      k = 10, depth = 20)
      .orderBy("rank")
  }

  /** Count-min sketch accuracy report for the top-30 vocabulary
    * (depth 4 × width 1024): est ≥ freq always; the oracle replays
    * every salted bucket and the min-over-rows estimate. */
  def cmsEstimatesQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cmsTopEstimates(Tables.documents(spark, dir), k = 30)
      .orderBy(col("freq").desc, col("token").asc)

  /** Temperature (α = ½) source-mix sampling at a 30% corpus target:
    * kept docs with their source's quantized keep rate. */
  def temperatureMixQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureSample(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("rate_e6"))
      .orderBy("doc_id")

  /** Duplication-aware loss weights over the d_dup_clusters graph:
    * weight_e6 = 1e6 div |cluster|, 1e6 for unpaired docs. */
  def dupWeightsQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.dupWeights(docs,
      Dedup.dupClusters(Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5)))
      .orderBy("doc_id")
  }

  /** Daily activity ROLLUP: (type, day) cells, per-type subtotals,
    * grand total — one grouping-sets aggregate, integer epoch-days. */
  def dailyRollupQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.dailyRollup(Tables.events(spark, dir))
      .orderBy("event_type", "day_idx")

  /** Token-aligned containment lookup for the literal phrase
    * "value fast spark" (present at every test SF): the memorization /
    * attribution probe. The oracle is the space-padded contains over
    * normalized text — different machinery, same token-aligned
    * semantics. */
  def spanLookupQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.spanLookup(Tables.documents(spark, dir), "value fast spark")
      .orderBy("doc_id")

  /** Keep-best-copy dedup over the d_dup_clusters graph: the cluster
    * survivor is the member with the highest rounded quality score
    * (ties by id), not the min id. */
  def dedupBestQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docsW = docs.select(col("doc_id"), col("text"),
      Dedup.tokens(col("text")).as("w"))
    Dedup.keepBest(docsW,
      Dedup.dupClusters(Dedup.jaccardPairsAdaptive(docs, k = 3, threshold = 0.5)),
      round(TextAnalysis.qualityScoreOf(col("w"), col("text")), 4))
      .select(col("doc_id")).orderBy("doc_id")
  }

  /** Overlapping 16-token chunks at stride 8 (2× overlap) — the RAG
    * indexing split; sized so the 10..100-token corpus docs exercise
    * multi-chunk and partial-tail paths. */
  def chunkDocsQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocs(Tables.documents(spark, dir), size = 16, stride = 8)
      .orderBy("doc_id", "chunk_id")

  /** Retrieval eval: recall@5 + reciprocal rank of the exact-config
    * IVF ranking against label-sharing relevance (each query's
    * relevant set = every other vector with its label). */
  def rankMetricsQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val ranking = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 20), k = 5,
      nlist = 16, nprobe = 16)
    val lab = emb.select(col("vec_id"), col("label"))
    val qrels = lab.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label"))
      .join(lab.select(col("vec_id").as("n_id"), col("label")), "label")
      .where(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    graft.ops.Eval.rankMetrics(ranking, qrels, k = 5).orderBy("q_id")
  }

  /** Classifier eval: train src0-vs-rest exactly as d_quality_train,
    * serve the whole corpus, confusion + P/R/F1 against the source
    * labels — keep ⟺ Σc·w > 0 is an exact integer predicate, so the
    * oracle replays training AND serving AND the metrics. */
  def clfMetricsQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = TextAnalysis.trainQualityClassifier(
      docs.where(col("source") === "src0"),
      docs.where(col("source") =!= "src0"), steps = 2)
    val preds = TextAnalysis.classifierScore(docs, w)
    val labels = docs.select(col("doc_id"),
      (col("source") === "src0").cast("long").as("y"))
    graft.ops.Eval.binaryClassification(
      preds.select(col("doc_id"), col("keep")), labels)
  }

  /** Gram novelty of the odd-id half against the even-id half's gram
    * store — the re-crawl/newness signal. */
  def noveltyQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.gramNovelty(
      docs.where(col("doc_id") % 2 === 1),
      TextAnalysis.spanGramStore(docs.where(col("doc_id") % 2 === 0)))
      .orderBy("doc_id")
  }

  /** The curation facade with the stage-6 temperature-mixture tail
    * (α = ½, 40% of the CLEANED corpus) — the full five-stage funnel
    * prefix plus the rate/gate math, all replayed in SQL. */
  def curationMixtureQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.curate(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams.copy(sourceAlpha = Some(0.5), mixTargetFrac = 0.4))
      .select("doc_id").orderBy("doc_id")
  }

  /** The curation facade with the stage-1b novelty gate: the seen-gram
    * store is built from the doc_id%5=1 slice of the full table (all of
    * which sit inside the corpus, so exact re-crawls score novelty 0
    * and drop), threshold 20% — then the usual four stages. */
  def curationNoveltyQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.curate(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams.copy(
        minNovelty = Some(200000L),
        noveltyGrams = Some(TextAnalysis.spanGramStore(docs.where(col("doc_id") % 5 === 1)))))
      .select("doc_id").orderBy("doc_id")
  }

  /** Curation with the stage-1d entropy gate: low-information docs
    * (unigram entropy < 2.5 nats) drop before quality/dedup — the
    * keyword-stuffing screen ahead of the full four-stage chain. */
  def curationEntropyQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.curate(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams.copy(minEntropyE6 = Some(2500000L)))
      .select("doc_id").orderBy("doc_id")
  }

  /** Curation with the stage-1c lexicon policy gate: blockword docs
    * (hit rate > 5% on the 3-word list) drop before quality/dedup. */
  def curationLexiconQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Curation.curate(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      OracleCurationParams.copy(
        lexicon = Some(Seq("slow", "error", "crash")),
        lexiconMaxHitRate = 0.05))
      .select("doc_id").orderBy("doc_id")
  }

  /** CUBE daily activity: every grouping set incl. per-day totals
    * across types. */
  def dailyCubeQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.dailyCube(Tables.events(spark, dir))
      .orderBy("event_type", "day_idx")

  /** Top-3 quality exemplars per source (rounded score desc, id asc) —
    * the per-domain inspection sample a labeling pass starts from. */
  def bestPerSourceQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs
      .select(col("source"), col("doc_id"), Dedup.tokens(col("text")).as("w0"),
        col("text"))
      .select(col("source"), col("doc_id"),
        round(TextAnalysis.qualityScoreOf(col("w0"), col("text")), 4).as("quality"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("source", "rk", "doc_id", "quality")
      .orderBy("source", "rk")
  }

  /** Vocabulary coverage curve: cumulative corpus-token share of the
    * top-N vocab at rank cut-offs — the "how big must the tokenizer
    * vocab be" signal. Exact integers: cum/total token counts per cut,
    * share quantized by div. Scale shape: the rank/cumsum window runs
    * over the TakeOrdered top-`maxCut` frame (bounded by the requested
    * BUDGET, never the vocabulary), and the grand total attaches as
    * the audited single-row broadcast. */
  def vocabCoverageQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cuts = Seq(1L, 2L, 4L, 8L, 16L, 24L, 31L)
    val maxCut = cuts.max.toInt
    val freq = Tables.documents(spark, dir)
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .sharedCheckpoint(eager = true) // top cut + grand total share one count pass
    val total = freq.agg(sum("freq").as("total"))
    val top = freq.orderBy(col("freq").desc, col("token").asc).limit(maxCut)
    top
      .withColumn("rnk", row_number()
        .over(Window.partitionBy().orderBy(col("freq").desc, col("token").asc))
        .cast("long"))
      .withColumn("cum", sum("freq")
        .over(Window.partitionBy().orderBy(col("rnk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("rnk").isInCollection(cuts))
      .crossJoin(broadcast(total))
      .select(col("rnk").as("vocab_size"), col("cum").as("n_tokens_covered"),
        col("total").as("n_tokens_total"),
        expr("cum * 1000000 div total").as("coverage_e6"))
      .orderBy("vocab_size")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_best_per_source"   -> (bestPerSourceQ _),
    "d_vocab_coverage"    -> (vocabCoverageQ _),
    "e_cube_daily"        -> (dailyCubeQ _),
    "d_curation_mixture"  -> (curationMixtureQ _),
    "d_curation_novelty"  -> (curationNoveltyQ _),
    "d_curation_lexicon"  -> (curationLexiconQ _),
    "d_novelty"           -> (noveltyQ _),
    "e_rank_metrics"      -> (rankMetricsQ _),
    "d_clf_metrics"       -> (clfMetricsQ _),
    "d_doc_chunks"        -> (chunkDocsQ _),
    "d_span_lookup"       -> (spanLookupQ _),
    "d_dedup_best"        -> (dedupBestQ _),
    "d_hybrid_topk"       -> (hybridTopKQ _),
    "d_cms_counts"        -> (cmsEstimatesQ _),
    "d_temperature_mix"   -> (temperatureMixQ _),
    "d_dup_weights"       -> (dupWeightsQ _),
    "e_rollup_daily"      -> (dailyRollupQ _),
    "e_event_funnel"      -> (eventFunnel _),
    "e_funnel_within"     -> (eventFunnelWithin _),
    "e_session_funnel"    -> (sessionFunnelQ _),
    "e_session_stats"     -> (sessionStatsQ _),
    "d_doc_contract"      -> (docContract _),
    "d_training_mixture"  -> (trainingMixtureQ _),
    "d_sim_spectrum"      -> ((s: SparkSession, dir: String) =>
      Dedup.jaccardSpectrum(Tables.documents(s, dir)).orderBy("bin")),
    "e_retention_cohorts" -> (retentionCohorts _),
    "e_window_join"       -> (errorWindowViews _),
    "e_event_paths"       -> (eventPaths _),
    "e_anomaly_hourly"    -> (rateAnomalies _),
    "d_gopher_rules"      -> (gopherRulesQ _),
    "d_ppx_buckets"       -> (ppxBucketsQ _),
    "d_source_kl"         -> (sourceKlQ _),
    "d_token_drift"       -> (tokenDriftQ _),
    "d_unigram_logprob"   -> (unigramLogProb _),
    "d_bigram_logprob"    -> (bigramLogProb _),
    "d_pack_contexts"     -> (packContexts _),
    "d_pack_efficiency"   -> (packEfficiencyQ _),
    "d_domain_reweight"   -> (domainReweightQ _),
    "d_doremi_weights"    -> (doremiWeightsQ _),
    "e_dim_prefix_recall" -> (dimPrefixRecallQ _),
    "e_dim_prefix_topk" -> (dimPrefixTopKQ _),
    "e_dim_prefix_w512" -> (dimPrefixW512Q _),
    "d_pmi_pairs"         -> (pmiPairs _),
    "d_source_mix"        -> (sourceMix _),
    "d_source_overlap"    -> (sourceOverlapQ _),
    "d_line_dedup"        -> (dedupLinesQ _),
    "d_freq_spectrum"     -> (freqSpectrum _),
    "d_len_hist"          -> (lenHist _),
    "e_knn_labels"        -> (knnLabels _),
    "e_active_users"      -> (activeUsers _),
    "e_data_contract"     -> (dataContract _),
    "d_sentence_stats"    -> (sentenceStats _),
    "d_snapshot_diff"     -> (snapshotDiff _),
    "d_shard_assign"      -> (shardAssign _),
    "d_tfidf_topk"        -> (tfidfTerms _),
    "d_token_quantiles"   -> (tokenLenQuantiles _),
    "d_curation_funnel"   -> (curationFunnel _),
    "d_curation_auto"     -> (curationAutoQ _),
    "d_quality_auc"       -> (qualityAucQ _),
    "d_quality_pr"        -> (qualityPrQ _),
    "d_quality_bins"      -> (qualityBinsQ _),
    "d_token_entropy"     -> (tokenEntropyQ _),
    "e_mmr_topk"          -> (mmrTopKQ _),
    "e_mmr_ivf"           -> (mmrIvfQ _),
    "d_curation_entropy"  -> (curationEntropyQ _),
    "d_dup_clusters"      -> (dupClusters _),
    "d_dedup_cap"         -> (dedupCap _),
    "d_epoch_shuffle"     -> (epochShuffleQ _),
    "d_hash_sample"       -> (hashSample _),
    "d_stratified_sample" -> (stratifiedSample _),
    "d_mixture_sample"    -> (mixtureSample _),
    "d_repetition"        -> (repetition _),
    "d_redact"            -> (redactDocs _),
    "d_dedup_exact"     -> (dedupExact _),
    "d_dedup_incremental" -> (dedupIncremental _),
    "d_dedup_bloom"     -> (dedupBloom _),
    "d_boilerplate"     -> (boilerplateStrip _),
    "d_contamination"   -> (contaminationCheck _),
    "d_jaccard_pairs"   -> (jaccardPairs _),
    "d_minhash_lsh"     -> (minhashLsh _),
    "d_minhash_incremental" -> (minhashIncremental _),
    "d_simhash"         -> (simhashSigs _),
    "d_text_stats"      -> (textStats _),
    "d_quality"         -> (qualityScores _),
    "d_quality_calibration" -> (qualityCalibrationQ _),
    "e_cosine_topk"     -> (cosineTopK _),
    "e_lsh_topk"        -> (lshTopK _),
    "e_ivf_topk"        -> (ivfTopK _),
    "e_pq_topk"         -> (pqTopK _),
    "e_pq_residual"     -> (pqResidualTopK _),
    "e_pq_index_serve"  -> (pqIndexServe _),
    "e_knn_graph"       -> (knnGraphQ _),
    "e_knn_centrality"  -> (knnCentralityQ _),
    "e_cluster_sample"  -> (clusterSampleQ _),
    "e_dimension_drift" -> (dimensionDriftQ _),
    "e_hard_negatives"  -> (hardNegativesQ _),
    "e_ann_recall"      -> (annRecallQ _),
    "e_anisotropy"      -> (anisotropyQ _),
    "d_simhash_pairs"   -> (simhashPairsQ _),
    "d_dedup_eval"      -> (dedupEvalQ _),
    "d_length_outliers" -> (lengthOutliersQ _),
    "d_zipf_slope"      -> (zipfSlopeQ _),
    "d_upsample_mix"    -> (upsampleMixQ _),
    "d_strip_markup"    -> (stripMarkupQ _),
    "d_fertility"       -> (fertilityQ _),
    "d_cluster_sizes"   -> (clusterSizesQ _),
    "d_simhash_incremental" -> (simhashIncrementalQ _),
    "d_lexicon_flags"   -> (lexiconFlagsQ _),
    "e_emb_contract"    -> (embContract _),
    "d_budget_select"   -> (budgetSelectQ _),
    "d_quality_ranks"   -> (qualityRanksQ _),
    "d_dedup_rate"      -> (dedupRateQ _),
    "e_emb_coverage"    -> (embCoverageQ _),
    "d_training_upsample" -> (trainingUpsampleQ _),
    "d_training_doremi"   -> (trainingDoremiQ _),
    "d_training_doremi_curr" -> (trainingDoremiCurrQ _),
    "d_source_card"     -> (sourceCardQ _),
    "d_release_manifest" -> (releaseManifestQ _),
    "d_overlap_f1"      -> (overlapF1Q _),
    "e_sign_project"    -> (signProjectQ _),
    "e_centroid_outliers" -> (centroidOutliersQ _),
    "d_bpe_merges"      -> (bpeMergesQ _),
    "d_quality_train"   -> (qualityTrainQ _),
    "d_bm25_topk"       -> (bm25Q _),
    "d_training_prep"   -> (trainingPrepQ _),
    "d_training_curriculum" -> (trainingCurriculumQ _),
    "d_training_packs"  -> (trainingPacksQ _),
    "e_semantic_clusters" -> (semanticClustersQ _),
    "e_near_dup_pairs"  -> (embNearDups _),
    "e_ivf_near_dup"    -> (embNearDupsIvf _),
    "e_pq_near_dup"     -> (embNearDupsPq _),
    "e_ivf_incremental" -> (embNearDupsIncremental _),
    "e_semantic_dedup"  -> (semanticDedupQ _),
    "e_semantic_decontam" -> (semanticDecontamQ _),
    "e_filtered_topk"   -> (filteredTopKQ _),
    "e_pq_filtered_serve" -> (pqFilteredServe _),
    "d_heavy_hitters"   -> (heavyHittersQ _),
    "d_postings"        -> (postingsQ _),
    "d_approx_quantiles" -> (approxQuantilesQ _),
    "d_quality_clf"     -> (qualityClfQ _),
    "d_dsir_weights"    -> (dsirWeightsQ _),
    "d_dsir_select"     -> (dsirSelectQ _),
    "d_mixture_plan"    -> (mixturePlanQ _),
    "d_split_assign"    -> (splitAssignQ _),
    "d_repeated_spans"  -> (repeatedSpansQ _),
    "d_span_dedup"      -> (spanDedupQ _),
    "d_span_incremental" -> (spanIncrementalQ _),
    "d_decontam_spans"  -> (decontamSpansQ _),
    "d_containment_report" -> (containmentReportQ _),
    "d_curation_semantic" -> (curationSemantic _),
    "d_curation_semdecontam" -> (curationSemDecontam _),
    "d_curation_audit"  -> (curationAuditQ _),
    "e_quantize_int8"   -> (quantizeEmb _),
    "d_multimodal_meta" -> (multimodalMeta _),
    "d_multimodal_decode" -> (multimodalDecode _),
    "d_multimodal_jpeg"   -> (multimodalJpeg _),
    "d_multimodal_gif"    -> (multimodalGif _),
    "d_multimodal_video"  -> (multimodalVideo _),
    "d_multimodal_y4m"    -> (multimodalY4m _),
    "d_multimodal_mp4"    -> (multimodalMp4 _),
    "d_multimodal_mulaw"  -> (multimodalMulaw _),
    "d_multimodal_frames" -> (multimodalFrames _),
    "d_multimodal_resize" -> (multimodalResize _),
    "d_hll_users"       -> (hllUsers _),
    "d_bpe_tokens"      -> (bpeTokenStats _),
    "d_langid"          -> (langIdPredictions _),
    "e_asof_join"       -> (asofPurchaseGap _),
    "d_vocab_topk"      -> (vocabTopK _),
    "e_user_sessions"   -> (userSessions _),
  )

  /** BM25 CTE chain (tokenize → stats → query-term tf → df → quantized
    * per-doc score_e6) for the literal {spark, query, window} query —
    * shared by d_bm25_topk and the lexical arm of d_hybrid_topk so the
    * formula lives in one place (k1/b constants interpolated from the
    * SAME Scala doubles the operator plans with). */
  private val Bm25Ctes: String =
    s"""t AS (SELECT doc_id, $ToksSql AS w FROM documents),
       |base AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl FROM t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM base),
       |tf AS (SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, dl, unnest(w) AS token FROM base)
       |       WHERE token IN ('spark', 'query', 'window') GROUP BY 1, 2, 3),
       |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id,
       |         CAST(SUM(CAST(round(
       |           ln((CAST(n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
       |           ((CAST(tf AS DOUBLE) * ${1.2 + 1.0}) /
       |            (CAST(tf AS DOUBLE) + 1.2 * (${1.0 - 0.75} +
       |             (0.75 * CAST(dl AS DOUBLE)) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))) *
       |           1000000.0) AS BIGINT)) AS BIGINT) AS score_e6
       |       FROM tf JOIN dfq USING (token) CROSS JOIN st GROUP BY 1)""".stripMargin

  /** The d_quality_train CTE chain (featurize → step 1 → step 2 → w2),
    * shared verbatim with the d_clf_metrics serve+confusion oracle so
    * training semantics live in exactly one place. */
  private val QualityTrainCtes: String =
    s"""t AS (SELECT doc_id, source, $ToksSql AS w FROM documents),
       |g AS (SELECT doc_id, source, unnest(w ||
       |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
       |             ELSE list_transform(generate_series(1, len(w) - 1),
       |                    i -> w[i] || ' ' || w[i + 1]) END) AS gm
       |      FROM t),
       |h AS (SELECT doc_id, source,
       |        list_reduce(list_prepend(CAST(7 AS BIGINT),
       |          list_transform(string_split(gm, ''), c -> CAST(ascii(c) AS BIGINT))),
       |          (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS bucket
       |      FROM g WHERE len(gm) > 0),
       |fb AS (SELECT doc_id, MAX(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS y,
       |         bucket, CAST(COUNT(*) AS BIGINT) AS c
       |       FROM h GROUP BY doc_id, bucket),
       |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM fb GROUP BY 1),
       |f AS (SELECT fb.doc_id, y, bucket, c, n,
       |        CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS f_e6
       |      FROM fb JOIN tot ON fb.doc_id = tot.doc_id),
       |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nn FROM f),
       |g1 AS (SELECT bucket, CAST(SUM((500000 - y * 1000000) * f_e6) AS BIGINT) AS gg
       |       FROM f GROUP BY 1),
       |w1 AS (SELECT bucket,
       |         CAST(0 - floor(CAST(gg AS DOUBLE) * 1.0 / (nn * 1000000.0)) AS BIGINT) AS w
       |       FROM g1 CROSS JOIN nd),
       |s2 AS (SELECT f.doc_id, MAX(y) AS y, MAX(n) AS n,
       |         CAST(SUM(c * COALESCE(w1.w, 0)) AS BIGINT) AS swc
       |       FROM f LEFT JOIN w1 USING (bucket) GROUP BY f.doc_id),
       |e2 AS (SELECT doc_id,
       |         CAST(round((1.0 / (1.0 + exp(-(CAST(swc AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))))
       |           - CAST(y AS DOUBLE)) * 1000000.0) AS BIGINT) AS err
       |       FROM s2),
       |g2 AS (SELECT bucket, CAST(SUM(err * f_e6) AS BIGINT) AS gg
       |       FROM f JOIN e2 USING (doc_id) GROUP BY 1),
       |w2 AS (SELECT w1.bucket,
       |         CAST(w1.w - floor(CAST(g2.gg AS DOUBLE) * 1.0 / (nn * 1000000.0)) AS BIGINT) AS w
       |       FROM w1 JOIN g2 ON w1.bucket = g2.bucket CROSS JOIN nd)""".stripMargin

  /** Token-level polynomial hash (seed 7, ×31, mod 1e9+7) — mirrors
    * TextAnalysis.polyHash. */
  private val TokPolySql =
    """list_reduce(list_prepend(CAST(7 AS BIGINT),
      |    list_transform(string_split(tk, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  /** Shared CTE chain of the DSIR oracles — the SQL twin of
    * Sampling.importanceWeights at the driver config (target = src0,
    * nBuckets = 4096, α = 1): unigram+bigram grams with the ngramsAll
    * short-doc collapse, polyHash bucketing, smoothed log-ratio
    * quantized to 1e-6 integers, exact per-doc sums. */
  private val DsirCte =
    s"""WITH t AS (SELECT doc_id, source, $ToksSql AS w FROM documents),
       |g AS (SELECT doc_id, source, unnest(w ||
       |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
       |             ELSE list_transform(generate_series(1, len(w) - 1),
       |                    i -> w[i] || ' ' || w[i + 1]) END) AS gm
       |      FROM t),
       |h AS (SELECT doc_id, source,
       |        list_reduce(list_prepend(CAST(7 AS BIGINT),
       |          list_transform(string_split(gm, ''), c -> CAST(ascii(c) AS BIGINT))),
       |          (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS bucket
       |      FROM g WHERE len(gm) > 0),
       |db AS (SELECT doc_id, bucket, COUNT(*) AS c FROM h
       |       WHERE source <> 'src0' GROUP BY 1, 2),
       |qb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS cq FROM db GROUP BY 1),
       |pb AS (SELECT bucket, COUNT(*) AS cp FROM h WHERE source = 'src0' GROUP BY 1),
       |qt AS (SELECT CAST(COALESCE(SUM(cq), 0) AS BIGINT) AS tq FROM qb),
       |pt AS (SELECT CAST(COALESCE(SUM(cp), 0) AS BIGINT) AS tp FROM pb),
       |lam AS (SELECT qb.bucket,
       |          CAST(round((ln((CAST(COALESCE(pb.cp, 0) AS DOUBLE) + 1.0) /
       |                         (CAST(tp AS DOUBLE) + 4096.0)) -
       |                      ln((CAST(qb.cq AS DOUBLE) + 1.0) /
       |                         (CAST(tq AS DOUBLE) + 4096.0))) * 1000000.0)
       |            AS BIGINT) AS lam_e6
       |        FROM qb LEFT JOIN pb USING (bucket) CROSS JOIN pt CROSS JOIN qt),
       |sm AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       |         CAST(SUM(c * lam_e6) AS BIGINT) AS s
       |       FROM db JOIN lam USING (bucket) GROUP BY 1)""".stripMargin

  private val SimhashOracle: String = {
    val bitSums = (0 until 30).map(b =>
      s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(",\n  ")
    val assemble = (0 until 30).map(b =>
      s"(CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
       |e AS (SELECT doc_id, unnest(w) AS tk FROM t),
       |h AS (SELECT doc_id, $TokPolySql AS hv FROM e),
       |b AS (SELECT doc_id,
       |  $bitSums
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id AS id, CAST($assemble AS BIGINT) AS simhash
       |FROM b ORDER BY id""".stripMargin
  }

  /** CTE chain (prefixed names, expects a preceding `t(doc_id, w)`
    * token CTE) ending in `sg(id, sig)`: the 30-bit polyHash simhash
    * signatures — SimhashOracle's body, reusable inside larger
    * oracles. */
  private def simhashSigCtes(p: String): String = {
    val bitSums = (0 until 30).map(b =>
      s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(",\n  ")
    val assemble = (0 until 30).map(b =>
      s"(CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""${p}e AS (SELECT doc_id, unnest(w) AS tk FROM t),
       |${p}h AS (SELECT doc_id, $TokPolySql AS hv FROM ${p}e),
       |${p}b AS (SELECT doc_id,
       |  $bitSums
       |  FROM ${p}h GROUP BY doc_id),
       |${p}sg AS (SELECT doc_id AS id, CAST($assemble AS BIGINT) AS sig FROM ${p}b)""".stripMargin
  }

  private val SimhashPairsOracle: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
       |${simhashSigCtes("")}
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sg a JOIN sg b ON a.id < b.id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  private val DedupEvalOracle: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
       |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
       |se AS (SELECT doc_id, unnest(sh) AS s FROM s),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM se GROUP BY 1),
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
       |      FROM se a JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jp AS (SELECT ia, ib FROM p
       |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
       |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
       |${simhashSigCtes("x")},
       |cp AS (SELECT a.id AS ia, b.id AS ib FROM xsg a JOIN xsg b ON a.id < b.id
       |       WHERE bit_count(xor(a.sig, b.sig)) <= 2),
       |agg AS (SELECT (SELECT COUNT(*) FROM jp) AS n_ref,
       |               (SELECT COUNT(*) FROM cp) AS n_cand,
       |               (SELECT COUNT(*) FROM cp JOIN jp USING (ia, ib)) AS n_hit)
       |SELECT n_ref, n_cand, n_hit,
       |  CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(n_hit * 1000000 // n_cand AS BIGINT) END AS precision_e6,
       |  CASE WHEN n_ref = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(n_hit * 1000000 // n_ref AS BIGINT) END AS recall_e6
       |FROM agg""".stripMargin

  /** Shared CTE chain of the curation-funnel oracles: stages 1–5
    * (quality → exact → near-dup closure → decontamination), ending at
    * the `clean` CTE. The semantic variant appends its cosine-closure
    * CTEs and a 6th stage line; both funnels read their stage counts
    * from [[CurationFunnelStages]] so the text lives exactly once. */
  /** The funnel CTE chain parameterized by (a) CTEs spliced between
    * `base` and the quality stage and (b) the frame the quality stage
    * reads (`base`, or the novelty gate's `nv`) — every curation
    * oracle composes from here so stage semantics live in one place. */
  private def curationPrefixFrom(extraCtes: String, qualitySrc: String): String =
    s"""WITH RECURSIVE
       |base AS (SELECT doc_id, text, $ToksSql AS w, $NormSql AS norm
       |         FROM documents WHERE doc_id % 10 <> 0),$extraCtes
       |qc AS (SELECT doc_id, text, w, norm,
       |        CASE WHEN len(w) = 0 THEN 0.0
       |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
       |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
       |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
       |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
       |      FROM $qualitySrc),
       |qd AS (SELECT doc_id, text, w, norm FROM qc
       |       WHERE round(GREATEST(0.0, LEAST(1.0,
       |         LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
       |         - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) >= 0.15),
       |ed AS (SELECT doc_id, w FROM qd
       |       WHERE doc_id IN (SELECT MIN(doc_id) FROM qd GROUP BY norm)),
       |shed AS (SELECT doc_id, $ShinglesSql AS sh FROM ed),
       |e AS (SELECT doc_id, unnest(sh) AS s FROM shed),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
       |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pr AS (SELECT ia, ib FROM p
       |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
       |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
       |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
       |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
       |                UNION
       |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
       |losers AS (SELECT u FROM (SELECT u, MIN(v) AS m FROM reach GROUP BY u) WHERE u <> m),
       |nd AS (SELECT doc_id, w FROM ed WHERE doc_id NOT IN (SELECT u FROM losers)),
       |bsh AS (SELECT DISTINCT unnest($ShinglesSql) AS s
       |      FROM (SELECT $ToksSql AS w FROM documents WHERE doc_id % 10 = 0)),
       |ndsh AS (SELECT doc_id, unnest($ShinglesSql) AS s FROM nd),
       |contam AS (SELECT ndsh.doc_id FROM ndsh JOIN bsh ON ndsh.s = bsh.s
       |           GROUP BY ndsh.doc_id HAVING COUNT(*) >= 2),
       |clean AS (SELECT doc_id, w FROM nd WHERE doc_id NOT IN (SELECT doc_id FROM contam))""".stripMargin

  private val CurationFunnelPrefix: String = curationPrefixFrom("", "base")

  /** Stage-1b novelty gate CTEs (n = 8 gram store from the doc_id%5=1
    * slice of the FULL table, distinct grams both sides, whole-text
    * collapse under 8 tokens — d_novelty's exact semantics) feeding the
    * quality stage the gated frame `nv`. Threshold: novelty_e6 >= 2e5. */
  private val NoveltyGateCtes: String =
    """
      |ag AS (SELECT doc_id, unnest(
      |        CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 6),
      |                    i -> array_to_string(w[i:i+7], ' ')) END) AS gr
      |      FROM base),
      |sg AS (SELECT DISTINCT unnest(
      |        CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 6),
      |                    i -> array_to_string(w[i:i+7], ' ')) END) AS gr
      |      FROM (SELECT """ + ToksSql + """ AS w FROM documents WHERE doc_id % 5 = 1)),
      |jg AS (SELECT DISTINCT doc_id, gr FROM ag),
      |ncnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM jg GROUP BY 1),
      |nsn AS (SELECT jg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
      |        FROM jg JOIN sg USING (gr) GROUP BY 1),
      |nv AS (SELECT base.* FROM base JOIN ncnt USING (doc_id) LEFT JOIN nsn USING (doc_id)
      |       WHERE (n_grams - COALESCE(n_seen, 0)) * 1000000 // n_grams >= 200000),""".stripMargin

  /** Stage-1c lexicon gate CTE (d_lexicon_flags' exact semantics at
    * the ('slow','error','crash') / 5% config) feeding the quality
    * stage the screened frame `lx`. */
  private val LexiconGateCtes: String =
    """
      |lx AS (SELECT base.* FROM base
      |       WHERE NOT (len(list_filter(w, x -> x IN ('slow', 'error', 'crash'))) > 0
      |         AND (CASE WHEN len(w) = 0 THEN 0
      |              ELSE len(list_filter(w, x -> x IN ('slow', 'error', 'crash'))) * 1000000 // len(w) END) > 50000)),""".stripMargin

  /** Stage-1d entropy gate CTEs feeding the quality stage the gated
    * frame `en`: the d_token_entropy run-length math replayed on
    * `base`, keep iff entropy_e6 ≥ 2.5e6 (2.5 nats). */
  private val EntropyGateCtes: String =
    """
      |ees AS (SELECT doc_id, list_sort(w) AS esw, len(w) AS en_n FROM base),
      |eer AS (SELECT doc_id, en_n,
      |         list_filter(range(1, en_n + 1), i -> i = 1 OR esw[i] <> esw[i - 1]) AS est
      |       FROM ees),
      |eec AS (SELECT doc_id, en_n,
      |         list_transform(range(1, len(est) + 1), j ->
      |           CASE WHEN j = len(est) THEN en_n + 1 - est[j]
      |                ELSE est[j + 1] - est[j] END) AS ecnts
      |       FROM eer),
      |eee AS (SELECT doc_id,
      |         CASE WHEN en_n = 0 THEN CAST(0 AS BIGINT)
      |              ELSE CAST(COALESCE(list_sum(list_transform(ecnts, cc -> cc *
      |                CAST(round(ln(CAST(en_n AS DOUBLE) / CAST(cc AS DOUBLE)) * 1000000.0) AS BIGINT))), 0)
      |                // en_n AS BIGINT) END AS ent
      |       FROM eec),
      |en AS (SELECT base.* FROM base JOIN eee USING (doc_id) WHERE eee.ent >= 2500000),""".stripMargin

  private val CurationFunnelStages: String =
    """
      |SELECT '1_total' AS stage, COUNT(*) AS n_docs,
      |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) AS n_tokens FROM base
      |UNION ALL SELECT '2_quality', COUNT(*),
      |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM qd
      |UNION ALL SELECT '3_exact_dedup', COUNT(*),
      |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM ed
      |UNION ALL SELECT '4_near_dup', COUNT(*),
      |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM nd
      |UNION ALL SELECT '5_decontaminated', COUNT(*),
      |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM clean""".stripMargin

  /** Unrolled MMR oracle: the k-step greedy diversity rerank in plain
    * SQL — round i's max-sim-to-selected join reads round i−1's
    * cumulative picks, exactly the engine loop's data dependence. All
    * comparisons run on 1e6-FLOORED cosines (probed bit-identical
    * between the engines: sequential double accumulation both sides),
    * so every argmax is integer-exact with the n_id tie-break. */
  /** d_training_doremi's replay from the funnel output (`clean`)
    * through the replica frame: the K = 2 DoReMi fit, learned weights
    * -> capped per-source epoch rates, the deterministic upsample
    * gate, and the replica key -- shared VERBATIM by the
    * d_training_doremi permutation tail and d_training_doremi_curr's
    * epoch-major curriculum tail, so the fit/upsample replay lives in
    * exactly one place. dmcd/dmsg/dmsu are MATERIALIZED: DuckDB
    * inlines CTEs per reference, and four inlined copies of the
    * recursive funnel exhaust the fd limit. */
  private val DoremiReplicaCtes: String =
    s""",
         |dmcd AS MATERIALIZED (SELECT c.doc_id, d.source, c.w FROM clean c
         |         JOIN documents d USING (doc_id)),
         |dmix AS (SELECT source, w, unnest(range(1, len(w))) AS i FROM dmcd WHERE len(w) >= 2),
         |dmsg AS MATERIALIZED (SELECT source, w[i] AS prev, w[i+1] AS cur, CAST(COUNT(*) AS BIGINT) AS tf
         |         FROM dmix GROUP BY 1, 2, 3),
         |dmsu AS MATERIALIZED (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS uf
         |         FROM (SELECT source, unnest(w) AS token FROM dmcd) GROUP BY 1, 2),
         |dmnd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         |         FROM dmcd WHERE len(w) >= 2 GROUP BY 1),
         |dmbf1 AS (SELECT prev, cur, CAST(SUM(tf) AS BIGINT) AS bfreq FROM dmsg GROUP BY 1, 2),
         |dmcf1 AS (SELECT prev, CAST(SUM(bfreq) AS BIGINT) AS cfreq FROM dmbf1 GROUP BY 1),
         |dmu1 AS (SELECT token, CAST(SUM(uf) AS BIGINT) AS ufreq FROM dmsu GROUP BY 1),
         |dmt1 AS (SELECT CAST(SUM(ufreq) AS DOUBLE) AS total FROM dmu1),
         |dmlp1 AS (SELECT prev, cur,
         |            CAST(round(ln((0.7 * CAST(bfreq AS DOUBLE)) / CAST(cfreq AS DOUBLE)
         |              + (${1.0 - 0.7} * CAST(ufreq AS DOUBLE)) / total) * 1000000.0) AS BIGINT) AS lp_e6
         |          FROM dmbf1 JOIN dmcf1 USING (prev) JOIN dmu1 ON dmu1.token = dmbf1.cur CROSS JOIN dmt1),
         |dmsc1 AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS nb, CAST(SUM(tf * lp_e6) AS BIGINT) AS ss
         |          FROM dmsg JOIN dmlp1 USING (prev, cur) GROUP BY 1),
         |dmsrc1 AS (SELECT dmsc1.source, n_docs, nb, ss
         |           FROM dmsc1 JOIN dmnd ON dmsc1.source IS NOT DISTINCT FROM dmnd.source),
         |dmm1 AS (SELECT source, n_docs,
         |           CAST(round(CAST(ss AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)) AS BIGINT) AS mean_lp_e4
         |         FROM dmsrc1),
         |dmg1 AS (SELECT CAST(round(CAST(SUM(ss) AS DOUBLE) / 100.0 / CAST(SUM(nb) AS DOUBLE)) AS BIGINT) AS o_e4
         |         FROM dmsrc1),
         |dmex1 AS (SELECT source, n_docs, mean_lp_e4, o_e4 - mean_lp_e4 AS excess_e4
         |          FROM dmm1 CROSS JOIN dmg1),
         |dmmx1 AS (SELECT CAST(MAX(ABS(excess_e4)) AS BIGINT) AS ma FROM dmex1),
         |dmfac1 AS (SELECT source,
         |             CAST(CASE WHEN ma = 0 THEN 1000000
         |                  WHEN excess_e4 >= 0 THEN 1000000 + (500000 * excess_e4) // ma
         |                  ELSE 1000000 - (500000 * (-excess_e4)) // ma END AS BIGINT) AS cum
         |           FROM dmex1 CROSS JOIN dmmx1),
         |dmbf2 AS (SELECT prev, cur,
         |            CAST(SUM(tf * CASE WHEN cum IS NULL THEN 1000
         |                         ELSE GREATEST(cum // 1000, 1) END) AS BIGINT) AS bfreq
         |          FROM dmsg LEFT JOIN dmfac1
         |            ON dmsg.source IS NOT DISTINCT FROM dmfac1.source
         |          GROUP BY 1, 2),
         |dmcf2 AS (SELECT prev, CAST(SUM(bfreq) AS BIGINT) AS cfreq FROM dmbf2 GROUP BY 1),
         |dmu2 AS (SELECT token,
         |           CAST(SUM(uf * CASE WHEN cum IS NULL THEN 1000
         |                        ELSE GREATEST(cum // 1000, 1) END) AS BIGINT) AS ufreq
         |         FROM dmsu LEFT JOIN dmfac1
         |           ON dmsu.source IS NOT DISTINCT FROM dmfac1.source
         |         GROUP BY 1),
         |dmt2 AS (SELECT CAST(SUM(ufreq) AS DOUBLE) AS total FROM dmu2),
         |dmlp2 AS (SELECT prev, cur,
         |            CAST(round(ln((0.7 * CAST(bfreq AS DOUBLE)) / CAST(cfreq AS DOUBLE)
         |              + (${1.0 - 0.7} * CAST(ufreq AS DOUBLE)) / total) * 1000000.0) AS BIGINT) AS lp_e6
         |          FROM dmbf2 JOIN dmcf2 USING (prev) JOIN dmu2 ON dmu2.token = dmbf2.cur CROSS JOIN dmt2),
         |dmsc2 AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS nb, CAST(SUM(tf * lp_e6) AS BIGINT) AS ss
         |          FROM dmsg JOIN dmlp2 USING (prev, cur) GROUP BY 1),
         |dmsrc2 AS (SELECT dmsc2.source, n_docs, nb, ss
         |           FROM dmsc2 JOIN dmnd ON dmsc2.source IS NOT DISTINCT FROM dmnd.source),
         |dmm2 AS (SELECT source, n_docs,
         |           CAST(round(CAST(ss AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)) AS BIGINT) AS mean_lp_e4
         |         FROM dmsrc2),
         |dmg2 AS (SELECT CAST(round(CAST(SUM(ss) AS DOUBLE) / 100.0 / CAST(SUM(nb) AS DOUBLE)) AS BIGINT) AS o_e4
         |         FROM dmsrc2),
         |dmex2 AS (SELECT source, n_docs, mean_lp_e4, o_e4 - mean_lp_e4 AS excess_e4
         |          FROM dmm2 CROSS JOIN dmg2),
         |dmmx2 AS (SELECT CAST(MAX(ABS(excess_e4)) AS BIGINT) AS ma FROM dmex2),
         |dmfac2 AS (SELECT source, n_docs, excess_e4,
         |             CAST(CASE WHEN ma = 0 THEN 1000000
         |                  WHEN excess_e4 >= 0 THEN 1000000 + (500000 * excess_e4) // ma
         |                  ELSE 1000000 - (500000 * (-excess_e4)) // ma END AS BIGINT) AS factor_e6
         |           FROM dmex2 CROSS JOIN dmmx2),
         |dmcum AS (SELECT dmfac2.source, n_docs,
         |            CAST((cum * factor_e6) // 1000000 AS BIGINT) AS cum_factor_e6
         |          FROM dmfac2 JOIN dmfac1
         |            ON dmfac1.source IS NOT DISTINCT FROM dmfac2.source),
         |dmden AS (SELECT CAST(SUM(n_docs * cum_factor_e6) AS BIGINT) AS dsum FROM dmcum),
         |dmw AS (SELECT source, n_docs,
         |          CAST(round(CAST(n_docs AS DOUBLE) * CAST(cum_factor_e6 AS DOUBLE) * 1000000.0
         |            / CAST(dsum AS DOUBLE)) AS BIGINT) AS weight_e6
         |        FROM dmcum CROSS JOIN dmden),
         |dmnn AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM dmw),
         |dmep AS (SELECT source,
         |           LEAST(CAST(8000000 AS BIGINT), (weight_e6 * nn) // n_docs) AS rate
         |         FROM dmw CROSS JOIN dmnn),
         |dupr AS (SELECT dmcd.doc_id, COALESCE(dmep.rate, 1000000) AS rate
         |         FROM dmcd LEFT JOIN dmep
         |           ON dmcd.source IS NOT DISTINCT FROM dmep.source),
         |dupn AS (SELECT doc_id, rate // 1000000 +
         |           CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000
         |                  < rate % 1000000 THEN 1 ELSE 0 END AS n FROM dupr),
         |dupc AS (SELECT doc_id, CAST(unnest(range(0, n)) AS BIGINT) AS copy
         |         FROM dupn WHERE n > 0),
         |drep AS (SELECT doc_id, copy, doc_id * 1024 + copy AS rep_id FROM dupc)""".stripMargin

  private def mmrOracle(k: Int, depth: Int, lambdaE6: Long): String = {
    def cos(a: String, b: String) =
      s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"
    val rounds = (2 to k).map { i =>
      s"""ms$i AS (SELECT ps.q_id, ps.cand AS n_id, MAX(ps.sim_e6) AS ms
         |         FROM ps JOIN cum${i - 1} sel ON ps.q_id = sel.q_id AND ps.other = sel.n_id
         |         GROUP BY 1, 2),
         |sc$i AS (SELECT shv.q_id, shv.n_id,
         |           $lambdaE6 * shv.rel - ${1000000L - lambdaE6} * ms$i.ms AS score
         |         FROM shv JOIN ms$i ON shv.q_id = ms$i.q_id AND shv.n_id = ms$i.n_id
         |         LEFT JOIN cum${i - 1} cm ON shv.q_id = cm.q_id AND shv.n_id = cm.n_id
         |         WHERE cm.n_id IS NULL),
         |sel$i AS (SELECT q_id, n_id, CAST($i AS BIGINT) AS rank FROM
         |          (SELECT q_id, n_id,
         |             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rn
         |           FROM sc$i) WHERE rn = 1),
         |cum$i AS (SELECT * FROM cum${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
       |s AS (SELECT q_id, n_id, ${cos("qv", "nv")} AS sim FROM q, c WHERE q_id <> n_id),
       |sh AS (SELECT q_id, n_id, CAST(floor(sim * 1000000.0) AS BIGINT) AS rel
       |       FROM (SELECT q_id, n_id, sim,
       |               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk FROM s)
       |       WHERE rk <= $depth),
       |shv AS (SELECT sh.q_id, sh.n_id, sh.rel, c.nv FROM sh JOIN c USING (n_id)),
       |ps AS (SELECT a.q_id, a.n_id AS cand, b.n_id AS other,
       |         CAST(floor(${cos("a.nv", "b.nv")} * 1000000.0) AS BIGINT) AS sim_e6
       |       FROM shv a JOIN shv b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
       |cum1 AS (SELECT q_id, n_id, CAST(1 AS BIGINT) AS rank FROM
       |         (SELECT q_id, n_id,
       |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id ASC) AS rn
       |          FROM shv) WHERE rn = 1),
       |$rounds
       |SELECT q_id, rank, n_id FROM cum$k ORDER BY q_id, rank""".stripMargin
  }

  /** Shared CTE chain of the quality-score-vs-Gopher-label evals
    * (d_quality_auc, d_quality_pr): the 4-dp quality score per doc
    * (`qs.s`), the Gopher keep label (`lab.y`), and their join grouped
    * by distinct score value ending at `g(s, c, cp)` — c rows and cp
    * positives per score group. */
  private val QualityLabelCtes: String =
    s"""WITH t AS (SELECT doc_id, text, $ToksSql AS w FROM documents),
       |qc AS (SELECT doc_id,
       |        CASE WHEN len(w) = 0 THEN 0.0
       |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
       |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
       |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
       |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
       |      FROM t),
       |qs AS (SELECT doc_id,
       |  round(GREATEST(0.0, LEAST(1.0,
       |    LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
       |    - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS s
       |  FROM qc),
       |gm AS (SELECT doc_id,
       |        CAST(len(w) AS BIGINT) AS n_words,
       |        CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS sumlen,
       |        CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) AS nhash,
       |        string_split(text, chr(10)) AS lines,
       |        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS nalpha,
       |        CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','for','on','with'], x))) AS BIGINT) AS nstop
       |      FROM t),
       |gr AS (SELECT doc_id, n_words,
       |        CASE WHEN n_words = 0 THEN 0
       |             ELSE sumlen * 1000000 // n_words END AS mean_len_e6,
       |        nhash, CAST(len(lines) AS BIGINT) AS nlines,
       |        CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS nell,
       |        CAST(len(list_filter(lines, l -> list_contains(['-', '*', '•'], substr(ltrim(l), 1, 1)))) AS BIGINT) AS nbul,
       |        nalpha, nstop
       |      FROM gm),
       |lab AS (SELECT doc_id,
       |        CASE WHEN (n_words >= 20 AND n_words <= 80) AND
       |          (mean_len_e6 >= 3000000 AND mean_len_e6 <= 10000000) AND
       |          (nhash * 10 <= n_words) AND (nell * 10 <= nlines * 3) AND
       |          (nbul * 10 <= nlines * 9) AND (nalpha * 5 >= n_words * 4) AND
       |          (nstop >= 2) THEN 1 ELSE 0 END AS y
       |      FROM gr),
       |g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(y) AS BIGINT) AS cp
       |      FROM qs JOIN lab USING (doc_id) GROUP BY 1)""".stripMargin

  /** The interpolated-bigram scoring chain (λ = 0.7, ln quantized to
    * 1e-6 LONG sums) ending at per-doc CTE `s` — shared by
    * d_bigram_logprob and d_ppx_buckets so the LM semantics live in
    * exactly one place. */
  private val BigramScoreCtes: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
       |ix AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) >= 2),
       |p AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur FROM ix),
       |ptf AS (SELECT doc_id, prev, cur, COUNT(*) AS tf FROM p GROUP BY 1, 2, 3),
       |bf AS (SELECT prev, cur, CAST(SUM(tf) AS BIGINT) AS bfreq FROM ptf GROUP BY 1, 2),
       |cf AS (SELECT prev, CAST(SUM(bfreq) AS BIGINT) AS cfreq FROM bf GROUP BY 1),
       |u AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS ufreq
       |      FROM (SELECT unnest($ToksSql) AS token FROM documents) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ufreq) AS DOUBLE) AS total FROM u),
       |lp AS (SELECT prev, cur,
       |         CAST(round(ln((${0.7} * CAST(bfreq AS DOUBLE)) / CAST(cfreq AS DOUBLE)
       |           + (${1.0 - 0.7} * CAST(ufreq AS DOUBLE)) / total) * 1000000.0) AS BIGINT) AS lp_e6
       |       FROM bf JOIN cf USING (prev) JOIN u ON u.token = bf.cur CROSS JOIN tot),
       |s AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |        CAST(SUM(tf * lp_e6) AS BIGINT) AS s
       |      FROM ptf JOIN lp USING (prev, cur) GROUP BY 1)""".stripMargin

  /** Unrolled BPE-training oracle: replays [[TextAnalysis.bpeMerges]]'
    * `n` merge iterations in plain SQL — each iteration is one
    * adjacent-pair count over the vocabulary frame, a deterministic
    * argmax (cnt desc, l asc, r asc; minPairFreq = 2), and a leftmost
    * non-overlapping merge. The merge itself is a `list_reduce` fold
    * (append `r` to the accumulator when its LAST symbol is exactly `l`
    * and the next is `r`, else append the symbol) — provably the same
    * greedy pass as the engine's bounded-lookaround `regexp_replace`,
    * because a just-merged symbol `l||r` can never re-match `l`.
    * CTEs are MATERIALIZED so the k-deep chain evaluates each
    * vocabulary generation once. */
  private def bpeMergesOracleSql(n: Int): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT array_to_string(string_split(w, ''), ' ') AS sym,
         |         CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest($ToksSql) AS w FROM documents) GROUP BY 1)""".stripMargin
    val steps = (1 to n).flatMap { k =>
      val p =
        s"""p$k AS (
           |  SELECT u[i] AS l, u[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(sym, ' ') AS u, freq FROM w${k - 1} WHERE len(sym) > 1),
           |       UNNEST(range(1, len(u))) AS t(i)
           |  GROUP BY 1, 2)""".stripMargin
      val m =
        s"""m$k AS MATERIALIZED (
           |  SELECT l, r, cnt FROM p$k WHERE cnt >= 2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)""".stripMargin
      val w =
        if (k == n) Nil
        else Seq(
          s"""w$k AS MATERIALIZED (
             |  SELECT list_reduce(string_split(sym, ' '),
             |    (acc, x) -> CASE WHEN (acc = m$k.l OR right(acc, len(m$k.l) + 1) = ' ' || m$k.l) AND x = m$k.r
             |                THEN acc || x ELSE acc || ' ' || x END) AS sym, freq
             |  FROM w${k - 1}, m$k)""".stripMargin)
      Seq(p, m) ++ w
    }
    val union = (1 to n).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right", cnt AS pair_count FROM m$k"""
    }.mkString("\nUNION ALL ")
    (Seq(w0) ++ steps).mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM (\n$union\n) ORDER BY rank"
  }

  val oracleSql: Map[String, String] = Map(
    "d_bpe_merges" -> bpeMergesOracleSql(8),
    // exact-rational bins: (inter*10) div union, J=1 clamps to bin 9
    "d_sim_spectrum" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |j AS (SELECT CAST(LEAST(inter * 10 // (sa.sz + sb.sz - inter), 9) AS BIGINT) AS bin
         |      FROM p JOIN sz sa ON sa.doc_id = p.ia JOIN sz sb ON sb.doc_id = p.ib)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM j GROUP BY 1 ORDER BY bin""".stripMargin,
    "d_best_per_source" ->
      s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id, source,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |q AS (SELECT doc_id, source,
         |        round(GREATEST(0.0, LEAST(1.0,
         |          LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |          - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS quality
         |      FROM c),
         |r AS (SELECT source, doc_id, quality,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |                           ORDER BY quality DESC, doc_id ASC) AS rk
         |      FROM q)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, quality
         |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    "d_vocab_coverage" ->
      s"""WITH t AS (SELECT $ToksSql AS w FROM documents),
         |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
         |      FROM (SELECT unnest(w) AS token FROM t) GROUP BY 1),
         |tt AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
         |r AS (SELECT token, freq,
         |        ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rnk FROM f),
         |cm AS (SELECT rnk, CAST(SUM(freq) OVER (ORDER BY rnk
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |       FROM r)
         |SELECT CAST(rnk AS BIGINT) AS vocab_size, cum AS n_tokens_covered,
         |  total AS n_tokens_total,
         |  CAST(cum * 1000000 // total AS BIGINT) AS coverage_e6
         |FROM cm CROSS JOIN tt
         |WHERE rnk IN (1, 2, 4, 8, 16, 24, 31) ORDER BY vocab_size""".stripMargin,
    // distinct gram strings on both sides (the hash family's 2^-64
    // collision trade — the oracle compares STRINGS, as d_span_dedup)
    "d_novelty" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |g AS (SELECT doc_id, unnest(
         |        CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |             ELSE list_transform(range(1, len(w) - 6),
         |                    i -> array_to_string(w[i:i+7], ' ')) END) AS gr
         |      FROM t),
         |jg AS (SELECT DISTINCT doc_id, gr FROM g WHERE doc_id % 2 = 1),
         |sg AS (SELECT DISTINCT gr FROM g WHERE doc_id % 2 = 0),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM jg GROUP BY 1),
         |sn AS (SELECT jg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
         |       FROM jg JOIN sg ON jg.gr = sg.gr GROUP BY 1)
         |SELECT cnt.doc_id, n_grams,
         |  CAST(COALESCE(n_seen, 0) AS BIGINT) AS n_seen,
         |  CAST((n_grams - COALESCE(n_seen, 0)) * 1000000 // n_grams AS BIGINT) AS novelty_e6
         |FROM cnt LEFT JOIN sn ON cnt.doc_id = sn.doc_id
         |ORDER BY cnt.doc_id""".stripMargin,
    // 1-based starts every stride tokens; DuckDB list slice w[a:b] is
    // inclusive, Spark slice(w, start, len) length-bounded - same cut
    "d_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |x AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 8)) AS s
         |      FROM t WHERE len(w) > 0)
         |SELECT doc_id, CAST((s - 1) // 8 AS BIGINT) AS chunk_id,
         |  array_to_string(w[s:s+15], ' ') AS chunk,
         |  CAST(LEAST(len(w) - s + 1, 16) AS BIGINT) AS n_tokens
         |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    // token-aligned phrase containment == space-padded substring over
    // the SAME normalized text (different machinery than the gram scan)
    "d_span_lookup" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $NormSql AS nt FROM documents)
         |WHERE contains(' ' || nt || ' ', ' value fast spark ')
         |ORDER BY doc_id""".stripMargin,
    // d_dup_clusters' recursive closure + the d_quality score; cluster
    // survivor = argmax(quality, -doc_id), everyone else anti-joins out
    "d_dedup_best" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, text, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |c AS (SELECT doc_id,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |q AS (SELECT doc_id,
         |        round(GREATEST(0.0, LEAST(1.0,
         |          LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |          - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS quality
         |      FROM c),
         |rk AS (SELECT cl.doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |                            ORDER BY q.quality DESC, cl.doc_id ASC) AS r
         |       FROM cl JOIN q ON cl.doc_id = q.doc_id)
         |SELECT d.doc_id FROM documents d
         |LEFT JOIN (SELECT doc_id FROM rk WHERE r > 1) l ON d.doc_id = l.doc_id
         |WHERE l.doc_id IS NULL ORDER BY d.doc_id""".stripMargin,
    // both arms replayed end-to-end: the BM25 CTE chain is d_bm25_topk's
    // (shared Bm25Ctes, cut at depth 20 with explicit ranks), the dense
    // arm is the exact cosine ranking for vec 0; fusion contributions
    // use floor (never a half-boundary — see Retrieval.rrfFuse)
    "d_hybrid_topk" ->
      s"""WITH $Bm25Ctes,
         |lexr AS (SELECT doc_id AS n_id,
         |           ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank FROM sc),
         |lex AS (SELECT n_id, rank FROM lexr WHERE rank <= 20),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings
         |      WHERE vec_id <> 0),
         |ds AS (SELECT n_id, list_cosine_similarity(qv, nv) AS sim FROM q, c),
         |dr AS (SELECT n_id, ROW_NUMBER() OVER (ORDER BY sim DESC, n_id ASC) AS rank FROM ds),
         |den AS (SELECT n_id, rank FROM dr WHERE rank <= 20),
         |u AS (SELECT n_id, CAST(floor(1000000.0 / (60.0 + rank)) AS BIGINT) AS c_e6 FROM lex
         |      UNION ALL
         |      SELECT n_id, CAST(floor(1000000.0 / (60.0 + rank)) AS BIGINT) FROM den),
         |f AS (SELECT n_id, CAST(SUM(c_e6) AS BIGINT) AS rrf_e6 FROM u GROUP BY 1),
         |r AS (SELECT n_id, rrf_e6,
         |        ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, n_id ASC) AS rk FROM f)
         |SELECT CAST(0 AS BIGINT) AS q_id, CAST(rk AS BIGINT) AS rank, n_id, rrf_e6
         |FROM r WHERE rk <= 10 ORDER BY rank""".stripMargin,
    // row hashes: (2r+1)·polyHash + 97r mod P mod width — plain 64-bit
    // integer arithmetic, replayed per distinct token
    "d_cms_counts" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
         |      FROM (SELECT unnest(w) AS token FROM t) GROUP BY 1),
         |h AS (SELECT token, freq,
         |        list_reduce(list_prepend(CAST(7 AS BIGINT),
         |          list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT))),
         |          (acc, x) -> (acc * 31 + x) % 1000000007) AS hh
         |      FROM f),
         |hb AS (SELECT token, freq, r,
         |         ((2 * r + 1) * hh + 97 * r) % 1000000007 % 1024 AS b
         |       FROM h CROSS JOIN (SELECT unnest(range(0, 4)) AS r)),
         |sk AS (SELECT r, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM hb GROUP BY 1, 2),
         |p AS (SELECT token, freq FROM f ORDER BY freq DESC, token ASC LIMIT 30),
         |pe AS (SELECT p.token, p.freq, MIN(sk.cnt) AS est
         |       FROM p JOIN hb ON hb.token = p.token
         |       JOIN sk ON sk.r = hb.r AND sk.b = hb.b GROUP BY 1, 2)
         |SELECT token, freq, CAST(est AS BIGINT) AS est,
         |  CAST(est - freq AS BIGINT) AS overcount
         |FROM pe ORDER BY freq DESC, token ASC""".stripMargin,
    // α = ½ ⇒ the power is one correctly-rounded sqrt; everything after
    // w_e6 is exact 64-bit integer arithmetic (see Sampling.temperatureRates)
    "d_temperature_mix" ->
      """WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM g),
        |w AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6,
        |        CAST(floor(CAST(total AS DOUBLE) * 0.3) AS BIGINT) AS target
        |      FROM g CROSS JOIN tt),
        |zz AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS z FROM w),
        |r AS (SELECT source,
        |        least(CAST(1000000 AS BIGINT),
        |              (w_e6 * target * 1000000) // (z * n_docs)) AS rate_e6
        |      FROM w CROSS JOIN zz)
        |SELECT d.doc_id, d.source, r.rate_e6
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE (((d.doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000 < r.rate_e6
        |ORDER BY d.doc_id""".stripMargin,
    // the d_dup_clusters recursive closure + per-cluster sizes; docs
    // outside the pair graph default to weight 1e6
    "d_dup_weights" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |csz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csz FROM cl GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(1000000 // COALESCE(csz.csz, 1) AS BIGINT) AS weight_e6
         |FROM documents d
         |LEFT JOIN cl ON d.doc_id = cl.doc_id
         |LEFT JOIN csz ON cl.cluster_id = csz.cluster_id
         |ORDER BY d.doc_id""".stripMargin,
    "e_cube_daily" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day_idx, user_id
        |           FROM events)
        |SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
        |       CAST(CASE WHEN GROUPING(day_idx) = 1 THEN -1 ELSE day_idx END AS BIGINT) AS day_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY CUBE(event_type, day_idx)
        |ORDER BY 1, 2""".stripMargin,
    // GROUPING() sentinels ('ALL' / -1) instead of SQL NULLs so the
    // hash compare never depends on engine null semantics
    "e_rollup_daily" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day_idx, user_id
        |           FROM events)
        |SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
        |       CAST(CASE WHEN GROUPING(day_idx) = 1 THEN -1 ELSE day_idx END AS BIGINT) AS day_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY ROLLUP(event_type, day_idx)
        |ORDER BY 1, 2""".stripMargin,
    "e_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS t FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
        |                   OVER (PARTITION BY user_id) AS t0 FROM e),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t > t0 THEN t END)
        |                   OVER (PARTITION BY user_id) AS t1 FROM s0),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t > t1 THEN t END)
        |                   OVER (PARTITION BY user_id) AS t2 FROM s1),
        |u AS (SELECT user_id, any_value(t0) AS t0, any_value(t1) AS t1,
        |             any_value(t2) AS t2 FROM s2 GROUP BY user_id)
        |SELECT step, n_users FROM (
        |  SELECT '1_view' AS step, count(t0) AS n_users FROM u
        |  UNION ALL SELECT '2_click', count(t1) FROM u
        |  UNION ALL SELECT '3_purchase', count(t2) FROM u)
        |ORDER BY step""".stripMargin,
    // the unbounded funnel's cascade with each transition capped at
    // the 2 h conversion window (greedy-earliest, see funnel Scaladoc)
    "e_funnel_within" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS t FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
        |                   OVER (PARTITION BY user_id) AS t0 FROM e),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t > t0
        |                          AND t <= t0 + 7200000 THEN t END)
        |                   OVER (PARTITION BY user_id) AS t1 FROM s0),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t > t1
        |                          AND t <= t1 + 7200000 THEN t END)
        |                   OVER (PARTITION BY user_id) AS t2 FROM s1),
        |u AS (SELECT user_id, any_value(t0) AS t0, any_value(t1) AS t1,
        |             any_value(t2) AS t2 FROM s2 GROUP BY user_id)
        |SELECT step, n_users FROM (
        |  SELECT '1_view' AS step, count(t0) AS n_users FROM u
        |  UNION ALL SELECT '2_click', count(t1) FROM u
        |  UNION ALL SELECT '3_purchase', count(t2) FROM u)
        |ORDER BY step""".stripMargin,
    "d_doc_contract" ->
      """WITH r AS (SELECT
        |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_text,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
        |    CAST(SUM(CASE WHEN source IS NULL OR source NOT LIKE 'src%' THEN 1 ELSE 0 END) AS BIGINT) AS v_src,
        |    CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars <> len(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_nc,
        |    COUNT(*) AS total,
        |    CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS v_uniq
        |  FROM documents)
        |SELECT "check", violations, total, violations = 0 AS pass FROM (
        |  SELECT 'doc_id_unique' AS "check", v_uniq AS violations, total FROM r
        |  UNION ALL SELECT 'lang_not_null', v_lang, total FROM r
        |  UNION ALL SELECT 'n_chars_consistent', v_nc, total FROM r
        |  UNION ALL SELECT 'source_shaped', v_src, total FROM r
        |  UNION ALL SELECT 'text_not_null', v_text, total FROM r)
        |ORDER BY "check"""".stripMargin,
    "e_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t FROM events),
        |g AS (SELECT *, t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
        |      FROM e),
        |sx AS (SELECT user_id, t,
        |        SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY t, event_id
        |                ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM g),
        |s AS (SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events,
        |        CAST(MAX(t) - MIN(t) AS BIGINT) AS dur
        |      FROM sx GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
        |       // COUNT(*) AS BIGINT) AS bounce_e6,
        |  round(quantile_cont(dur, 0.5), 4) AS p50_duration_ms,
        |  round(quantile_cont(dur, 0.9), 4) AS p90_duration_ms,
        |  CAST(MAX(dur) AS BIGINT) AS max_duration_ms,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events_total
        |FROM s""".stripMargin,
    // sessionize over ALL events (e_user_sessions' gap CTE), then the
    // cascade per (user, session) — the "did the visit convert" form
    "e_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS t FROM events),
        |g AS (SELECT *, t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
        |      FROM e),
        |sx AS (SELECT user_id, event_type, t,
        |        SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY t, event_id
        |                ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM g),
        |f AS (SELECT * FROM sx WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
        |                   OVER (PARTITION BY user_id, sess) AS t0 FROM f),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t > t0 THEN t END)
        |                   OVER (PARTITION BY user_id, sess) AS t1 FROM s0),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t > t1 THEN t END)
        |                   OVER (PARTITION BY user_id, sess) AS t2 FROM s1),
        |u AS (SELECT user_id, sess, any_value(t0) AS t0, any_value(t1) AS t1,
        |             any_value(t2) AS t2 FROM s2 GROUP BY user_id, sess)
        |SELECT step, n_sessions FROM (
        |  SELECT '1_view' AS step, count(t0) AS n_sessions FROM u
        |  UNION ALL SELECT '2_click', count(t1) FROM u
        |  UNION ALL SELECT '3_purchase', count(t2) FROM u)
        |ORDER BY step""".stripMargin,
    "e_retention_cohorts" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
        |            WHERE user_id IS NOT NULL),
        |c AS (SELECT *, min(wk) OVER (PARTITION BY user_id) AS cw FROM uw)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cw, wk) / 7 AS INT) AS week_offset,
        |       count(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d_shard_assign" ->
      """SELECT doc_id, (((doc_id % 1000000007) * 2654435761) % 1000000007) % 16 AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e_event_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS t FROM events),
        |s AS (SELECT event_type AS e1,
        |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS e2,
        |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY t, event_id) AS e3
        |      FROM e)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "e_anomaly_hourly" ->
      """WITH c AS (SELECT event_type AS key,
        |             (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
        |             COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT key, bucket_ms, n,
        |        SUM(n) OVER win AS s,
        |        SUM(n * n) OVER win AS ss,
        |        COUNT(n) OVER win AS c
        |      FROM c
        |      WINDOW win AS (PARTITION BY key ORDER BY bucket_ms
        |                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT key, bucket_ms, n, c,
        |        CASE WHEN c >= 12
        |          THEN round(CAST(s AS DOUBLE) / CAST(c AS DOUBLE), 4) END AS mean,
        |        CASE WHEN c >= 12
        |          THEN round(sqrt(GREATEST(0.0,
        |            (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
        |              / (CAST(c AS DOUBLE) - 1.0))), 4) END AS std
        |      FROM w)
        |SELECT key, bucket_ms, n, mean, std,
        |       (c >= 12 AND CAST(n AS DOUBLE) > mean + 2.0 * std) AS is_anomaly
        |FROM m ORDER BY key, bucket_ms""".stripMargin,
    "d_unigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |f AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS freq FROM tf GROUP BY 1),
         |tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS total FROM f),
         |lp AS (SELECT token,
         |         CAST(round(ln(CAST(freq AS DOUBLE) / total) * 1000000.0) AS BIGINT) AS lp_e6
         |       FROM f CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |        CAST(SUM(tf * lp_e6) AS BIGINT) AS s
         |      FROM tf JOIN lp USING (token) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |       round(CAST(s AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE), 4) AS mean_logprob
         |FROM s ORDER BY doc_id""".stripMargin,
    // λ and 1−λ interpolated from the SAME Scala doubles the operator
    // plans with (1−0.7 is NOT 0.3 in IEEE — the literal must match
    // bit-for-bit for the quantized ln to agree at boundaries)
    // every ratio rule is an integer cross-product — engine-exact; the
    // corpus is single-line so the line rules pass vacuously here (the
    // spec exercises them on multi-line fixtures)
    "d_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, text, $ToksSql AS w FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(len(w) AS BIGINT) AS n_words,
         |        CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |        CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) AS nhash,
         |        string_split(text, chr(10)) AS lines,
         |        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS nalpha,
         |        CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','for','on','with'], x))) AS BIGINT) AS nstop
         |      FROM t),
         |r AS (SELECT doc_id, n_words,
         |        CASE WHEN n_words = 0 THEN 0
         |             ELSE sumlen * 1000000 // n_words END AS mean_len_e6,
         |        nhash, CAST(len(lines) AS BIGINT) AS nlines,
         |        CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS nell,
         |        CAST(len(list_filter(lines, l -> list_contains(['-', '*', '•'], substr(ltrim(l), 1, 1)))) AS BIGINT) AS nbul,
         |        nalpha, nstop
         |      FROM m)
         |SELECT doc_id, n_words, CAST(mean_len_e6 AS BIGINT) AS mean_len_e6,
         |  (n_words >= 20 AND n_words <= 80) AS r_word_count,
         |  (mean_len_e6 >= 3000000 AND mean_len_e6 <= 10000000) AS r_mean_len,
         |  (nhash * 10 <= n_words) AS r_symbol,
         |  (nell * 10 <= nlines * 3) AS r_ellipsis,
         |  (nbul * 10 <= nlines * 9) AS r_bullet,
         |  (nalpha * 5 >= n_words * 4) AS r_alpha,
         |  (nstop >= 2) AS r_stopwords,
         |  ((n_words >= 20 AND n_words <= 80) AND
         |   (mean_len_e6 >= 3000000 AND mean_len_e6 <= 10000000) AND
         |   (nhash * 10 <= n_words) AND (nell * 10 <= nlines * 3) AND
         |   (nbul * 10 <= nlines * 9) AND (nalpha * 5 >= n_words * 4) AND
         |   (nstop >= 2)) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    // signed drift over the in-vocab overlap (double-exact floor) +
    // integer OOV mass — the d_token_drift one-row report
    "d_token_drift" ->
      s"""WITH bt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cs
         |      FROM (SELECT unnest($ToksSql) AS token FROM documents WHERE doc_id % 2 = 1)
         |      GROUP BY 1),
         |ref AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS ct
         |      FROM (SELECT unnest($ToksSql) AS token FROM documents WHERE doc_id % 2 = 0)
         |      GROUP BY 1),
         |rt AS (SELECT CAST(SUM(ct) AS DOUBLE) AS rt FROM ref),
         |j AS (SELECT bt.token, cs, ct FROM bt LEFT JOIN ref USING (token)),
         |ti AS (SELECT CAST(SUM(CASE WHEN ct IS NOT NULL THEN cs ELSE 0 END) AS DOUBLE) AS ts FROM j),
         |x AS (SELECT cs, ct,
         |        CASE WHEN ct IS NOT NULL AND ts > 0
         |             THEN CAST(round(ln((CAST(cs AS DOUBLE) * rt) /
         |                    (ts * CAST(ct AS DOUBLE))) * 1000000.0) AS BIGINT)
         |             ELSE 0 END AS lr
         |      FROM j CROSS JOIN rt CROSS JOIN ti)
         |SELECT COALESCE(CAST(SUM(cs) AS BIGINT), 0) AS n_tokens,
         |  COALESCE(CAST(SUM(CASE WHEN ct IS NOT NULL THEN cs ELSE 0 END) AS BIGINT), 0) AS n_in_vocab,
         |  CASE WHEN SUM(CASE WHEN ct IS NOT NULL THEN cs ELSE 0 END) > 0
         |       THEN CAST(floor(CAST(SUM(cs * lr) AS DOUBLE) /
         |              CAST(SUM(CASE WHEN ct IS NOT NULL THEN cs ELSE 0 END) AS DOUBLE)) AS BIGINT)
         |       ELSE 0 END AS drift_e6,
         |  CASE WHEN SUM(cs) > 0
         |       THEN (CAST(SUM(cs) AS BIGINT) -
         |             CAST(SUM(CASE WHEN ct IS NOT NULL THEN cs ELSE 0 END) AS BIGINT))
         |            * 1000000 // CAST(SUM(cs) AS BIGINT)
         |       ELSE 0 END AS oov_e6
         |FROM x""".stripMargin,
    // per-source KL vs the corpus marginal: quantized log-ratio LONG
    // sums, integer division, clamped at 0 (see the operator Scaladoc)
    "d_source_kl" ->
      s"""WITH t AS (SELECT source, unnest($ToksSql) AS token FROM documents),
         |st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cs FROM t GROUP BY 1, 2),
         |ct AS (SELECT token, CAST(SUM(cs) AS BIGINT) AS ct FROM st GROUP BY 1),
         |ts AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ts FROM st GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS total FROM ct),
         |lr AS (SELECT st.source, cs, ts,
         |         CAST(round(ln((CAST(cs AS DOUBLE) * total) /
         |           (CAST(ts AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000.0) AS BIGINT) AS lr_e6
         |       FROM st JOIN ct USING (token) JOIN ts USING (source) CROSS JOIN tot)
         |SELECT source, CAST(MAX(ts) AS BIGINT) AS n_tokens,
         |       GREATEST(0, CAST(SUM(cs * lr_e6) // MAX(ts) AS BIGINT)) AS kl_e6
         |FROM lr GROUP BY source ORDER BY source""".stripMargin,
    "d_bigram_logprob" -> (BigramScoreCtes +
      """
         |SELECT doc_id, n_bigrams,
         |       round(CAST(s AS DOUBLE) / 1000000.0 / CAST(n_bigrams AS DOUBLE), 4) AS mean_logprob
         |FROM s ORDER BY doc_id""".stripMargin),
    // the bigram score chain + per-source NTILE terciles — rank order
    // (mean_logprob DESC, doc_id ASC) is total, so tiles are exact
    "d_ppx_buckets" -> (BigramScoreCtes +
      """,
         |sc AS (SELECT doc_id, n_bigrams,
         |         round(CAST(s AS DOUBLE) / 1000000.0 / CAST(n_bigrams AS DOUBLE), 4) AS mean_logprob
         |       FROM s),
         |bk AS (SELECT sc.doc_id, d.source, n_bigrams, mean_logprob,
         |         CAST(NTILE(3) OVER (PARTITION BY d.source
         |           ORDER BY mean_logprob DESC, sc.doc_id ASC) AS BIGINT) AS bucket
         |       FROM sc JOIN documents d ON sc.doc_id = d.doc_id)
         |SELECT doc_id, source, n_bigrams, mean_logprob, bucket
         |FROM bk ORDER BY doc_id""".stripMargin),
    "d_pack_contexts" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |s AS (SELECT doc_id, n_tokens,
         |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |      FROM t)
         |SELECT doc_id, n_tokens, start_offset,
         |       start_offset // 512 AS pack_id,
         |       start_offset % 512 AS pack_offset
         |FROM s ORDER BY doc_id""".stripMargin,
    "d_domain_reweight" -> (BigramScoreCtes +
      """,
        |d AS (SELECT s.doc_id, s.n_bigrams, s.s, doc.source
        |      FROM s JOIN documents doc USING (doc_id)),
        |src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |          CAST(SUM(n_bigrams) AS BIGINT) AS nb, CAST(SUM(s) AS BIGINT) AS ss
        |        FROM d GROUP BY 1),
        |srcm AS (SELECT source, n_docs,
        |           CAST(round(CAST(ss AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)) AS BIGINT) AS mean_lp_e4
        |         FROM src),
        |gtot AS (SELECT CAST(round(CAST(SUM(ss) AS DOUBLE) / 100.0 / CAST(SUM(nb) AS DOUBLE)) AS BIGINT) AS o_e4
        |        FROM src),
        |ex AS (SELECT source, n_docs, mean_lp_e4, o_e4 - mean_lp_e4 AS excess_e4
        |       FROM srcm CROSS JOIN gtot),
        |mx AS (SELECT CAST(MAX(ABS(excess_e4)) AS BIGINT) AS ma FROM ex),
        |fac AS (SELECT source, n_docs, mean_lp_e4, excess_e4,
        |          CAST(CASE WHEN ma = 0 THEN 1000000
        |               WHEN excess_e4 >= 0 THEN 1000000 + (500000 * excess_e4) // ma
        |               ELSE 1000000 - (500000 * (-excess_e4)) // ma END AS BIGINT) AS factor_e6
        |        FROM ex CROSS JOIN mx),
        |den AS (SELECT CAST(SUM(n_docs * factor_e6) AS BIGINT) AS dsum FROM fac)
        |SELECT source, n_docs, mean_lp_e4, excess_e4, factor_e6,
        |  CAST(round(CAST(n_docs AS DOUBLE) * CAST(factor_e6 AS DOUBLE) * 1000000.0
        |    / CAST(dsum AS DOUBLE)) AS BIGINT) AS weight_e6
        |FROM fac CROSS JOIN den ORDER BY source""".stripMargin),
    // iterative DoReMi, K = 2 unrolled: round 1 is the one-shot chain
    // (raw counts); round 2 re-fits the lexicon on counts scaled by the
    // E3-QUANTIZED round-1 factors (GREATEST(cum // 1000, 1) — the
    // engine's int64-overflow headroom at design scale), re-scores
    // UNWEIGHTED per-source text under it, and the final share
    // renormalizes n_docs x cumulative factor. All weighting arithmetic
    // is 64-bit integer; doubles appear only inside the lexicon ln()
    // and the e4 rounds — the exact expressions the engine evaluates.
    "d_doremi_weights" ->
      s"""WITH t AS (SELECT doc_id, source, $ToksSql AS w FROM documents),
         |ix AS (SELECT source, w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) >= 2),
         |sg AS (SELECT source, w[i] AS prev, w[i+1] AS cur, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM ix GROUP BY 1, 2, 3),
         |su AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS uf
         |       FROM (SELECT source, unnest($ToksSql) AS token FROM documents) GROUP BY 1, 2),
         |nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         |       FROM t WHERE len(w) >= 2 GROUP BY 1),
         |bf1 AS (SELECT prev, cur, CAST(SUM(tf) AS BIGINT) AS bfreq FROM sg GROUP BY 1, 2),
         |cf1 AS (SELECT prev, CAST(SUM(bfreq) AS BIGINT) AS cfreq FROM bf1 GROUP BY 1),
         |u1 AS (SELECT token, CAST(SUM(uf) AS BIGINT) AS ufreq FROM su GROUP BY 1),
         |tot1 AS (SELECT CAST(SUM(ufreq) AS DOUBLE) AS total FROM u1),
         |lp1 AS (SELECT prev, cur,
         |          CAST(round(ln((0.7 * CAST(bfreq AS DOUBLE)) / CAST(cfreq AS DOUBLE)
         |            + (${1.0 - 0.7} * CAST(ufreq AS DOUBLE)) / total) * 1000000.0) AS BIGINT) AS lp_e6
         |        FROM bf1 JOIN cf1 USING (prev) JOIN u1 ON u1.token = bf1.cur CROSS JOIN tot1),
         |sc1 AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS nb, CAST(SUM(tf * lp_e6) AS BIGINT) AS ss
         |        FROM sg JOIN lp1 USING (prev, cur) GROUP BY 1),
         |src1 AS (SELECT sc1.source, n_docs, nb, ss
         |         FROM sc1 JOIN nd ON sc1.source IS NOT DISTINCT FROM nd.source),
         |srcm1 AS (SELECT source, n_docs,
         |            CAST(round(CAST(ss AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)) AS BIGINT) AS mean_lp_e4
         |          FROM src1),
         |g1 AS (SELECT CAST(round(CAST(SUM(ss) AS DOUBLE) / 100.0 / CAST(SUM(nb) AS DOUBLE)) AS BIGINT) AS o_e4
         |       FROM src1),
         |ex1 AS (SELECT source, n_docs, mean_lp_e4, o_e4 - mean_lp_e4 AS excess_e4
         |        FROM srcm1 CROSS JOIN g1),
         |mx1 AS (SELECT CAST(MAX(ABS(excess_e4)) AS BIGINT) AS ma FROM ex1),
         |fac1 AS (SELECT source,
         |           CAST(CASE WHEN ma = 0 THEN 1000000
         |                WHEN excess_e4 >= 0 THEN 1000000 + (500000 * excess_e4) // ma
         |                ELSE 1000000 - (500000 * (-excess_e4)) // ma END AS BIGINT) AS cum
         |         FROM ex1 CROSS JOIN mx1),
         |bf2 AS (SELECT prev, cur,
         |          CAST(SUM(tf * CASE WHEN cum IS NULL THEN 1000
         |                       ELSE GREATEST(cum // 1000, 1) END) AS BIGINT) AS bfreq
         |        FROM sg LEFT JOIN fac1 ON sg.source IS NOT DISTINCT FROM fac1.source
         |        GROUP BY 1, 2),
         |cf2 AS (SELECT prev, CAST(SUM(bfreq) AS BIGINT) AS cfreq FROM bf2 GROUP BY 1),
         |u2 AS (SELECT token,
         |         CAST(SUM(uf * CASE WHEN cum IS NULL THEN 1000
         |                      ELSE GREATEST(cum // 1000, 1) END) AS BIGINT) AS ufreq
         |       FROM su LEFT JOIN fac1 ON su.source IS NOT DISTINCT FROM fac1.source
         |       GROUP BY 1),
         |tot2 AS (SELECT CAST(SUM(ufreq) AS DOUBLE) AS total FROM u2),
         |lp2 AS (SELECT prev, cur,
         |          CAST(round(ln((0.7 * CAST(bfreq AS DOUBLE)) / CAST(cfreq AS DOUBLE)
         |            + (${1.0 - 0.7} * CAST(ufreq AS DOUBLE)) / total) * 1000000.0) AS BIGINT) AS lp_e6
         |        FROM bf2 JOIN cf2 USING (prev) JOIN u2 ON u2.token = bf2.cur CROSS JOIN tot2),
         |sc2 AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS nb, CAST(SUM(tf * lp_e6) AS BIGINT) AS ss
         |        FROM sg JOIN lp2 USING (prev, cur) GROUP BY 1),
         |src2 AS (SELECT sc2.source, n_docs, nb, ss
         |         FROM sc2 JOIN nd ON sc2.source IS NOT DISTINCT FROM nd.source),
         |srcm2 AS (SELECT source, n_docs,
         |            CAST(round(CAST(ss AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)) AS BIGINT) AS mean_lp_e4
         |          FROM src2),
         |g2 AS (SELECT CAST(round(CAST(SUM(ss) AS DOUBLE) / 100.0 / CAST(SUM(nb) AS DOUBLE)) AS BIGINT) AS o_e4
         |       FROM src2),
         |ex2 AS (SELECT source, n_docs, mean_lp_e4, o_e4 - mean_lp_e4 AS excess_e4
         |        FROM srcm2 CROSS JOIN g2),
         |mx2 AS (SELECT CAST(MAX(ABS(excess_e4)) AS BIGINT) AS ma FROM ex2),
         |fac2 AS (SELECT source, n_docs, mean_lp_e4, excess_e4,
         |           CAST(CASE WHEN ma = 0 THEN 1000000
         |                WHEN excess_e4 >= 0 THEN 1000000 + (500000 * excess_e4) // ma
         |                ELSE 1000000 - (500000 * (-excess_e4)) // ma END AS BIGINT) AS factor_e6
         |         FROM ex2 CROSS JOIN mx2),
         |cum2 AS (SELECT fac2.source, n_docs, mean_lp_e4, excess_e4, factor_e6,
         |           CAST((cum * factor_e6) // 1000000 AS BIGINT) AS cum_factor_e6
         |         FROM fac2 JOIN fac1 ON fac1.source IS NOT DISTINCT FROM fac2.source),
         |den AS (SELECT CAST(SUM(n_docs * cum_factor_e6) AS BIGINT) AS dsum FROM cum2)
         |SELECT source, n_docs, mean_lp_e4, excess_e4, factor_e6, cum_factor_e6,
         |  CAST(round(CAST(n_docs AS DOUBLE) * CAST(cum_factor_e6 AS DOUBLE) * 1000000.0
         |    / CAST(dsum AS DOUBLE)) AS BIGINT) AS weight_e6
         |FROM cum2 CROSS JOIN den ORDER BY source""".stripMargin,
    "d_pack_efficiency" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |s AS (SELECT doc_id, n_tokens,
         |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |      FROM t),
         |x AS (SELECT s.*, CAST(l.context_len AS BIGINT) AS context_len
         |      FROM s, (VALUES (64), (128), (256), (512)) AS l(context_len))
         |SELECT context_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(GREATEST(context_len - n_tokens, 0)) AS BIGINT) AS pad_tokens,
         |  CAST(SUM(GREATEST(n_tokens - context_len, 0)) AS BIGINT) AS trunc_tokens,
         |  CAST(SUM(LEAST(n_tokens, context_len)) * 1000000
         |    // (COUNT(*) * context_len) AS BIGINT) AS fill_rate_e6,
         |  CAST((SUM(n_tokens) + context_len - 1) // context_len AS BIGINT) AS packed_contexts,
         |  CAST(SUM(CASE WHEN n_tokens > 0 AND
         |      start_offset // context_len <> (start_offset + n_tokens - 1) // context_len
         |    THEN 1 ELSE 0 END) AS BIGINT) AS split_docs
         |FROM x GROUP BY context_len ORDER BY context_len""".stripMargin,
    "e_dim_prefix_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "e_dim_prefix_w512" ->
      """WITH w AS (SELECT vec_id, flatten([e, e, e, e, e, e, e, e]) AS embedding
        |           FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
        |q AS (SELECT vec_id AS q_id, embedding AS qv FROM w WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, embedding AS nv FROM w),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "e_dim_prefix_recall" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |truth AS (SELECT q_id, n_id FROM (
        |  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY list_cosine_similarity(qv, nv) DESC, n_id ASC) AS rank
        |  FROM q, c WHERE q_id <> n_id) WHERE rank <= 5),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM truth),
        |pfx AS (SELECT CAST(p AS INT) AS dims FROM (VALUES (8), (16), (32), (64)) AS v(p)),
        |pr AS (SELECT dims, q_id, n_id FROM (
        |  SELECT pfx.dims, q.q_id, c.n_id, ROW_NUMBER() OVER (
        |      PARTITION BY pfx.dims, q.q_id
        |      ORDER BY list_cosine_similarity(qv[1:pfx.dims], nv[1:pfx.dims]) DESC,
        |               n_id ASC) AS rank
        |  FROM pfx, q, c WHERE q_id <> n_id) WHERE rank <= 5),
        |hits AS (SELECT dims, CAST(COUNT(*) AS BIGINT) AS n_hits
        |         FROM pr JOIN truth USING (q_id, n_id) GROUP BY dims)
        |SELECT p.dims, COALESCE(h.n_hits, 0) AS n_hits,
        |       CAST(COALESCE(h.n_hits, 0) * 1000000 // tot.total AS BIGINT) AS recall_e6
        |FROM pfx p LEFT JOIN hits h USING (dims) CROSS JOIN tot
        |ORDER BY dims""".stripMargin,
    "d_pmi_pairs" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($ToksSql) AS w FROM documents),
         |dt AS (SELECT doc_id, unnest(w) AS token FROM t),
         |f AS (SELECT token, COUNT(*) AS df FROM dt GROUP BY 1),
         |v AS (SELECT token, df FROM f ORDER BY df DESC, token ASC LIMIT 100),
         |ft AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
         |p AS (SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS df_ab
         |      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
         |      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         |n AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT p.token_a, p.token_b, p.df_ab,
         |  round(ln(CAST(p.df_ab * n.n AS DOUBLE) / CAST(va.df * vb.df AS DOUBLE)), 4) AS pmi
         |FROM p CROSS JOIN n
         |JOIN v va ON va.token = p.token_a
         |JOIN v vb ON vb.token = p.token_b
         |ORDER BY token_a, token_b""".stripMargin,
    "d_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
         |x AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS pos FROM t),
         |l AS (SELECT doc_id, pos, ls[pos] AS line,
         |        regexp_replace(lower(trim(ls[pos])), '\\s+', ' ', 'g') AS norm
         |      FROM x),
         |k AS (SELECT doc_id, pos, line, norm,
         |        MIN(pos) OVER (PARTITION BY doc_id, norm) AS first_pos FROM l),
         |kept AS (SELECT doc_id, pos, line FROM k WHERE norm = '' OR pos = first_pos),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |          string_agg(line, chr(10) ORDER BY pos) AS clean_text
         |        FROM kept GROUP BY 1),
         |n AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines FROM t)
         |SELECT n.doc_id, n_lines, n_lines - n_kept AS n_removed, clean_text
         |FROM n JOIN agg ON n.doc_id = agg.doc_id
         |ORDER BY n.doc_id""".stripMargin,
    // overlap keys are 8-byte xxhash64 digests engine-side; the oracle
    // groups on the normalized text itself — identical counts unless
    // two distinct norms collide in 64 bits (~n²/2⁶⁴, ignorable)
    "d_source_overlap" ->
      s"""WITH d AS (SELECT DISTINCT source AS src, $NormSql AS norm FROM documents),
         |c AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
         |sh AS (SELECT a.src AS source_a, b.src AS source_b,
         |         CAST(COUNT(*) AS BIGINT) AS shared
         |       FROM d a JOIN d b ON a.norm = b.norm AND a.src < b.src
         |       GROUP BY 1, 2),
         |p AS (SELECT ca.src AS source_a, cb.src AS source_b, ca.n AS n_a, cb.n AS n_b
         |      FROM c ca, c cb WHERE ca.src < cb.src)
         |SELECT p.source_a, p.source_b, n_a, n_b,
         |       CAST(COALESCE(shared, 0) AS BIGINT) AS shared,
         |       round(CAST(COALESCE(shared, 0) AS DOUBLE) /
         |             CAST(n_a + n_b - COALESCE(shared, 0) AS DOUBLE), 4) AS jaccard
         |FROM p LEFT JOIN sh ON p.source_a = sh.source_a AND p.source_b = sh.source_b
         |ORDER BY p.source_a, p.source_b""".stripMargin,
    "d_source_mix" ->
      s"""WITH t AS (SELECT doc_id, source, len($ToksSql) AS n_toks, $NormSql AS norm
         |           FROM documents),
         |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn FROM t),
         |g AS (SELECT source, COUNT(*) AS n_docs,
         |        CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
         |      FROM f GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tt FROM g)
         |SELECT source, n_docs, n_tokens, n_dups,
         |  round(CAST(n_tokens AS DOUBLE) / tt, 4) AS token_share
         |FROM g CROSS JOIN tot ORDER BY source""".stripMargin,
    "d_freq_spectrum" ->
      s"""WITH t AS (SELECT unnest($ToksSql) AS token FROM documents),
         |f AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY 1)
         |SELECT freq, COUNT(*) AS n_tokens FROM f GROUP BY 1 ORDER BY freq""".stripMargin,
    // Exact counts of the tokens above the MG guarantee line with
    // ok pinned true: the Spark side computes ok from the summary's
    // actual estimates, so a bound violation (or a missing guaranteed
    // token) hash-mismatches here.
    "d_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($ToksSql) AS token FROM documents),
         |c AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM t)
         |SELECT token, freq, true AS ok FROM c, n
         |WHERE freq * 65 > n.n ORDER BY token""".stripMargin,
    "d_repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |g AS (SELECT doc_id, unnest(
         |        CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |             ELSE list_transform(range(1, len(w) - 6),
         |                    i -> array_to_string(w[i:i+7], ' ')) END) AS gr
         |      FROM t),
         |d AS (SELECT DISTINCT doc_id, gr FROM g),
         |lex AS (SELECT gr FROM d GROUP BY gr HAVING COUNT(*) >= 2),
         |s AS (SELECT g.doc_id, COUNT(*) AS n_spans,
         |        CAST(SUM(CASE WHEN lex.gr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_shared
         |      FROM g LEFT JOIN lex ON g.gr = lex.gr GROUP BY 1)
         |SELECT doc_id, n_spans, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / CAST(n_spans AS DOUBLE), 4) AS shared_ratio
         |FROM s ORDER BY doc_id""".stripMargin,
    "d_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |occ AS (SELECT doc_id, u.s AS s, u.gr AS gr FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(w) < 8 THEN [struct_pack(s := 1, gr := array_to_string(w, ' '))]
         |           ELSE list_transform(range(1, len(w) - 6),
         |                  i -> struct_pack(s := i, gr := array_to_string(w[i:i+7], ' '))) END) AS u
         |    FROM t)),
         |f AS (SELECT gr, min(struct_pack(d := doc_id, s := s)) AS fst FROM occ GROUP BY gr),
         |dup AS (SELECT o.doc_id, o.s FROM occ o JOIN f ON o.gr = f.gr
         |        WHERE struct_pack(d := o.doc_id, s := o.s) > f.fst),
         |rem AS (SELECT DISTINCT doc_id, unnest(range(s, s + 8)) AS p FROM dup),
         |tok AS (SELECT doc_id, u.p AS p, u.tk AS tk FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |             i -> struct_pack(p := i, tk := w[i]))) AS u FROM t)),
         |kept AS (SELECT k.doc_id, k.p, k.tk FROM tok k
         |         LEFT JOIN rem r ON k.doc_id = r.doc_id AND k.p = r.p
         |         WHERE r.p IS NULL),
         |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
         |          coalesce(string_agg(tk, ' ' ORDER BY p), '') AS txt
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, len(t.w) AS n_tokens,
         |  len(t.w) - coalesce(a.n_kept, 0) AS n_removed,
         |  coalesce(a.txt, '') AS text_dedup
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id ORDER BY t.doc_id""".stripMargin,
    "d_span_incremental" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |occ AS (SELECT doc_id, u.s AS s, u.gr AS gr FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(w) < 8 THEN [struct_pack(s := 1, gr := array_to_string(w, ' '))]
         |           ELSE list_transform(range(1, len(w) - 6),
         |                  i -> struct_pack(s := i, gr := array_to_string(w[i:i+7], ' '))) END) AS u
         |    FROM t)),
         |f AS (SELECT gr, min(struct_pack(d := doc_id, s := s)) AS fst FROM occ GROUP BY gr),
         |dup AS (SELECT o.doc_id, o.s FROM occ o JOIN f ON o.gr = f.gr
         |        WHERE o.doc_id >= 250 AND struct_pack(d := o.doc_id, s := o.s) > f.fst),
         |rem AS (SELECT DISTINCT doc_id, unnest(range(s, s + 8)) AS p FROM dup),
         |tok AS (SELECT doc_id, u.p AS p, u.tk AS tk FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |             i -> struct_pack(p := i, tk := w[i]))) AS u FROM t WHERE doc_id >= 250)),
         |kept AS (SELECT k.doc_id, k.p, k.tk FROM tok k
         |         LEFT JOIN rem r ON k.doc_id = r.doc_id AND k.p = r.p
         |         WHERE r.p IS NULL),
         |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
         |          coalesce(string_agg(tk, ' ' ORDER BY p), '') AS txt
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, len(t.w) AS n_tokens,
         |  len(t.w) - coalesce(a.n_kept, 0) AS n_removed,
         |  coalesce(a.txt, '') AS text_dedup
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
         |WHERE t.doc_id >= 250 ORDER BY t.doc_id""".stripMargin,
    "d_decontam_spans" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents WHERE doc_id % 10 <> 0),
         |b AS (SELECT doc_id, $ToksSql AS w FROM documents WHERE doc_id % 10 = 0),
         |occ AS (SELECT doc_id, u.s AS s, u.gr AS gr FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(w) < 8 THEN [struct_pack(s := 1, gr := array_to_string(w, ' '))]
         |           ELSE list_transform(range(1, len(w) - 6),
         |                  i -> struct_pack(s := i, gr := array_to_string(w[i:i+7], ' '))) END) AS u
         |    FROM t)),
         |bg AS (SELECT DISTINCT u.gr AS gr FROM (
         |    SELECT unnest(
         |      CASE WHEN len(w) < 8 THEN [struct_pack(s := 1, gr := array_to_string(w, ' '))]
         |           ELSE list_transform(range(1, len(w) - 6),
         |                  i -> struct_pack(s := i, gr := array_to_string(w[i:i+7], ' '))) END) AS u
         |    FROM b)),
         |dup AS (SELECT o.doc_id, o.s FROM occ o JOIN bg ON o.gr = bg.gr),
         |rem AS (SELECT DISTINCT doc_id, unnest(range(s, s + 8)) AS p FROM dup),
         |tok AS (SELECT doc_id, u.p AS p, u.tk AS tk FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |             i -> struct_pack(p := i, tk := w[i]))) AS u FROM t)),
         |kept AS (SELECT k.doc_id, k.p, k.tk FROM tok k
         |         LEFT JOIN rem r ON k.doc_id = r.doc_id AND k.p = r.p
         |         WHERE r.p IS NULL),
         |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
         |          coalesce(string_agg(tk, ' ' ORDER BY p), '') AS txt
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, len(t.w) AS n_tokens,
         |  len(t.w) - coalesce(a.n_kept, 0) AS n_removed,
         |  coalesce(a.txt, '') AS text_dedup
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id ORDER BY t.doc_id""".stripMargin,
    "d_containment_report" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |be AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 10 = 0),
         |ce AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 10 != 0),
         |f AS (SELECT be.s AS s, (ce.s IS NOT NULL) AS c
         |      FROM be LEFT JOIN ce ON be.s = ce.s)
         |SELECT COUNT(*) AS n_bench_shingles,
         |  COALESCE(CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT), 0)
         |    AS n_contained,
         |  CASE WHEN COUNT(*) = 0 THEN 0.0
         |       ELSE round(CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS DOUBLE) /
         |              CAST(COUNT(*) AS DOUBLE), 6) END AS containment
         |FROM f""".stripMargin,
    "d_quality_clf" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |e AS (SELECT doc_id, unnest(w) AS tk FROM t),
         |h AS (SELECT doc_id, $TokPolySql AS hv FROM e),
         |b AS (SELECT doc_id,
         |        ((hv % 4096) * 2654435761 + 12345) % 1000003 AS wq FROM h),
         |g AS (SELECT doc_id, CAST(SUM(wq) AS BIGINT) AS s, COUNT(*) AS n
         |      FROM b GROUP BY 1)
         |SELECT doc_id,
         |  round(CAST(s AS DOUBLE) / CAST(n * 1000003 AS DOUBLE) - 0.5, 4)
         |    AS quality_w,
         |  (CAST(s AS DOUBLE) / CAST(n * 1000003 AS DOUBLE)) > 0.5 AS keep
         |FROM g ORDER BY doc_id""".stripMargin,
    "d_dsir_weights" ->
      s"""$DsirCte
         |SELECT doc_id, n_grams,
         |       round(CAST(s AS DOUBLE) / 1000000.0, 4) AS logratio
         |FROM sm ORDER BY doc_id""".stripMargin,
    "d_dsir_select" ->
      s"""$DsirCte,
         |r AS (SELECT doc_id, n_grams,
         |        round(CAST(s AS DOUBLE) / 1000000.0, 4) AS logratio
         |      FROM sm ORDER BY logratio DESC, doc_id ASC LIMIT 50)
         |SELECT doc_id, n_grams, logratio FROM r ORDER BY doc_id""".stripMargin,
    "d_mixture_plan" ->
      s"""WITH t AS (SELECT source, CAST(len($ToksSql) AS BIGINT) AS n FROM documents),
         |g AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM g),
         |sh AS (SELECT source, n_tokens, total,
         |         CAST(CASE WHEN source = 'src0' THEN 50
         |                   WHEN source = 'src1' THEN 30
         |                   ELSE 5 END AS BIGINT) AS share_pct
         |       FROM g CROSS JOIN tot)
         |SELECT source, n_tokens, share_pct,
         |  CASE WHEN n_tokens = 0 THEN 1.0
         |       ELSE round(LEAST(1.0, CAST(total * share_pct * 50 AS DOUBLE) /
         |         (10000.0 * CAST(n_tokens AS DOUBLE))), 6) END AS rate
         |FROM sh ORDER BY source""".stripMargin,
    "d_split_assign" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u, MIN(v) AS c FROM reach GROUP BY u)
         |SELECT d.doc_id, COALESCE(cl.c, d.doc_id) AS rep,
         |  CASE WHEN (((COALESCE(cl.c, d.doc_id) % 1000000007) * 2654435761)
         |             % 1000000007) % 97 < 10
         |       THEN 'test' ELSE 'train' END AS split
         |FROM documents d LEFT JOIN cl ON cl.u = d.doc_id
         |ORDER BY doc_id""".stripMargin,
    // Exact discrete quantiles (HDR's round-half-up rank rule) with
    // the envelope booleans pinned true: a sketch answer outside its
    // quantization envelope hash-mismatches here.
    "d_approx_quantiles" ->
      s"""WITH t AS (SELECT lang, CAST(len($ToksSql) AS BIGINT) AS v FROM documents),
         |w AS (SELECT lang, v, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY v) AS rn,
         |             COUNT(*) OVER (PARTITION BY lang) AS cnt FROM t),
         |q AS (SELECT lang,
         |  MAX(CASE WHEN rn = GREATEST(1, CAST(floor(0.50 * cnt + 0.5) AS BIGINT))
         |           THEN v END) AS p50_exact,
         |  MAX(CASE WHEN rn = GREATEST(1, CAST(floor(0.99 * cnt + 0.5) AS BIGINT))
         |           THEN v END) AS p99_exact
         |  FROM w GROUP BY 1)
         |SELECT lang, p50_exact, p99_exact, true AS p50_ok, true AS p99_ok
         |FROM q ORDER BY lang""".stripMargin,
    "d_postings" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct($ToksSql)) AS token
         |           FROM documents),
         |g AS (SELECT token, COUNT(*) AS df,
         |        array_to_string(list_transform(
         |          list_slice(list_sort(list(doc_id)), 1, 10),
         |          x -> CAST(x AS VARCHAR)), ',') AS doc_ids
         |      FROM t GROUP BY 1)
         |SELECT token, df, doc_ids FROM g WHERE df >= 5 ORDER BY token""".stripMargin,
    "d_len_hist" ->
      """SELECT CAST(len(bin(n_chars)) AS BIGINT) AS len_bin,
        |  COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY len_bin""".stripMargin,
    "e_knn_labels" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv, label AS own_label
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv, label AS n_label
        |      FROM embeddings),
        |s AS (SELECT q_id, n_id, n_label, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_label,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s),
        |v AS (SELECT q_id, n_label, COUNT(*) AS votes FROM r WHERE rank <= 5 GROUP BY 1, 2),
        |b AS (SELECT q_id, n_label AS knn_label, votes,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label ASC) AS rn
        |      FROM v)
        |SELECT b.q_id AS q_id, q.own_label, b.knn_label, b.votes,
        |       q.own_label = b.knn_label AS agrees
        |FROM b JOIN q ON q.q_id = b.q_id WHERE rn = 1 ORDER BY b.q_id""".stripMargin,
    "d_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, $NormSql AS norm FROM documents WHERE doc_id % 10 <> 3),
         |n0 AS (SELECT doc_id,
         |         CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
         |       FROM documents WHERE doc_id % 13 <> 5),
         |n AS (SELECT doc_id, $NormSql AS norm FROM n0)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.norm <> n.norm THEN 'changed'
         |       ELSE 'unchanged' END AS change
         |FROM o FULL JOIN n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin,
    "e_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |            WHERE user_id IS NOT NULL),
        |dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1),
        |wd AS (SELECT DISTINCT user_id, d + CAST(o AS INT) AS td
        |       FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)),
        |wau AS (SELECT td, COUNT(*) AS wau FROM wd GROUP BY 1)
        |SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
        |       round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 4) AS stickiness
        |FROM dau JOIN wau ON wau.td = dau.d
        |ORDER BY day""".stripMargin,
    "e_data_contract" ->
      """WITH r AS (SELECT
        |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_user,
        |    CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
        |      ('view','click','purchase','error','signup') THEN 1 ELSE 0 END) AS BIGINT) AS v_type,
        |    CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_val,
        |    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
        |    COUNT(*) AS total,
        |    CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT) AS v_uniq
        |  FROM events)
        |SELECT "check", violations, total, violations = 0 AS pass FROM (
        |  SELECT 'event_id_unique' AS "check", v_uniq AS violations, total FROM r
        |  UNION ALL SELECT 'event_type_known', v_type, total FROM r
        |  UNION ALL SELECT 'ts_present', v_ts, total FROM r
        |  UNION ALL SELECT 'user_id_not_null', v_user, total FROM r
        |  UNION ALL SELECT 'value_non_negative', v_val, total FROM r)
        |ORDER BY "check"""".stripMargin,
    "d_sentence_stats" ->
      """WITH s AS (SELECT doc_id,
        |  list_filter(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)),
        |              x -> len(x) > 0) AS segs
        |  FROM documents)
        |SELECT doc_id, CAST(len(segs) AS BIGINT) AS n_sentences,
        |  CASE WHEN len(segs) = 0 THEN NULL
        |       ELSE round(CAST(list_sum(list_transform(segs, x -> len(x))) AS DOUBLE)
        |              / CAST(len(segs) AS DOUBLE), 4) END AS mean_sent_chars
        |FROM s ORDER BY doc_id""".stripMargin,
    "e_window_join" ->
      """WITH err AS (SELECT event_id AS error_id,
        |              epoch_ms(ts) - 300000 AS s, epoch_ms(ts) + 300000 AS e
        |            FROM events WHERE event_type = 'error'),
        |v AS (SELECT epoch_ms(ts) AS t FROM events WHERE event_type = 'view')
        |SELECT error_id, count(*) AS n_views
        |FROM err JOIN v ON v.t BETWEEN err.s AND err.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
         |s AS (SELECT doc_id, token,
         |        round(CAST(tf AS DOUBLE) * ln(n.n / CAST(df AS DOUBLE)), 4) AS tfidf
         |      FROM tf JOIN df USING (token) CROSS JOIN n),
         |r AS (SELECT *, CAST(row_number() OVER
         |        (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT doc_id, token, tfidf, rnk FROM r
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "d_token_quantiles" ->
      s"""WITH t AS (SELECT lang, len($ToksSql) AS n_toks FROM documents)
         |SELECT lang,
         |  round(quantile_cont(n_toks, 0.25), 4) AS p25,
         |  round(quantile_cont(n_toks, 0.5), 4) AS p50,
         |  round(quantile_cont(n_toks, 0.75), 4) AS p75,
         |  round(quantile_cont(n_toks, 0.9), 4) AS p90,
         |  count(*) AS n_docs
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "d_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007) % 97 < 10
        |ORDER BY doc_id""".stripMargin,
    "d_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |             (((doc_id % 1000000007) * 2654435761) % 1000000007) % 97 AS hv
        |           FROM documents),
        |r AS (SELECT lang, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
        |      FROM h)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM r
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "d_mixture_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007) % 97 <
        |  CASE lang WHEN 'en' THEN 97 WHEN 'de' THEN 49 WHEN 'fr' THEN 20 ELSE 10 END
        |ORDER BY doc_id""".stripMargin,
    "d_repetition" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id,
         |        CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |             ELSE list_transform(range(1, len(w) - 1),
         |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS g
         |      FROM t),
         |e AS (SELECT doc_id, unnest(g) AS s FROM s),
         |c AS (SELECT doc_id, s, COUNT(*) AS c FROM e GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         |       CAST(MAX(c) AS BIGINT) AS max_gram_freq,
         |       round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS repetition
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_redact" ->
      """WITH t1 AS (SELECT doc_id, text AS orig,
        |              regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS a
        |            FROM documents),
        |t2 AS (SELECT *, regexp_replace(a,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS b
        |       FROM t1),
        |t3 AS (SELECT *, regexp_replace(b, '[0-9]{6,}', '<NUM>', 'g') AS c FROM t2)
        |SELECT doc_id, c AS redacted,
        |  CAST(len(regexp_extract_all(orig, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(b, '[0-9]{6,}')) AS BIGINT) AS n_digit_runs
        |FROM t3 ORDER BY doc_id""".stripMargin,
    "d_hll_users" ->
      // user_id IS NOT NULL keeps group membership aligned with the
      // operator: an event_type whose users are ALL null would yield
      // (type, 0, TRUE) here but no row there
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |       TRUE AS within_5pct
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b,
         |       round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jaccard
         |FROM p JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "d_minhash_incremental" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id >= 250 AND b.doc_id < 250
         |      GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b,
         |       round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jaccard
         |FROM p JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "d_simhash" -> SimhashOracle,
    "d_simhash_pairs" -> SimhashPairsOracle,
    "d_dedup_eval" -> DedupEvalOracle,
    "d_simhash_incremental" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |${simhashSigCtes("")}
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sg a JOIN sg b ON a.id >= 250 AND b.id < 250
         |WHERE bit_count(xor(a.sig, b.sig)) <= 1
         |ORDER BY id_a, id_b""".stripMargin,
    "d_budget_select" ->
      s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id, source, len(w) AS ntok,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |s AS (SELECT doc_id, source, ntok,
         |        round(GREATEST(0.0, LEAST(1.0,
         |          LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |          - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS q
         |      FROM c),
         |cum AS (SELECT doc_id, source,
         |          SUM(ntok) OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC
         |                          ROWS UNBOUNDED PRECEDING) AS cum_tokens
         |        FROM s)
         |SELECT doc_id, source, CAST(cum_tokens AS BIGINT) AS cum_tokens,
         |  cum_tokens <= (CASE source WHEN 'src0' THEN 600 WHEN 'src1' THEN 300
         |                 ELSE 400 END) AS kept
         |FROM cum ORDER BY doc_id""".stripMargin,
    "d_quality_ranks" ->
      s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id, source,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |s AS (SELECT doc_id, source,
         |        round(GREATEST(0.0, LEAST(1.0,
         |          LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |          - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS quality
         |      FROM c)
         |SELECT doc_id, source, quality,
         |  PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality ASC) AS pctl
         |FROM s ORDER BY doc_id""".stripMargin,
    "d_lexicon_flags" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id, len(w) AS n_tokens,
         |        len(list_filter(w, x -> x IN ('slow', 'error', 'crash'))) AS n_hits
         |      FROM t)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(CASE WHEN n_tokens = 0 THEN 0
         |            ELSE n_hits * 1000000 // n_tokens END AS BIGINT) AS hit_rate_e6,
         |  n_hits > 0 AND (CASE WHEN n_tokens = 0 THEN 0
         |                       ELSE n_hits * 1000000 // n_tokens END) > 20000 AS flagged
         |FROM c ORDER BY doc_id""".stripMargin,
    "e_emb_coverage" ->
      """WITH nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |ne AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
        |nm AS (SELECT COUNT(*) AS n_matched FROM documents d
        |       JOIN embeddings e ON d.doc_id = e.vec_id)
        |SELECT n_docs, n_vecs, n_matched,
        |  CAST(CASE WHEN n_docs = 0 THEN 0
        |            ELSE n_matched * 1000000 // n_docs END AS BIGINT) AS doc_coverage_e6,
        |  CAST(n_vecs - n_matched AS BIGINT) AS n_orphan_vecs
        |FROM nd, ne, nm""".stripMargin,
    "e_emb_contract" ->
      """WITH r AS (SELECT
        |    CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        |    CAST(SUM(CASE WHEN embedding IS NULL OR len(embedding) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS v_dims,
        |    CAST(SUM(CASE WHEN embedding IS NULL OR len(list_filter(embedding, x -> isnan(x))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_nan,
        |    CAST(SUM(CASE WHEN label IS NULL OR label < 0 OR label > 9 THEN 1 ELSE 0 END) AS BIGINT) AS v_lab,
        |    COUNT(*) AS total,
        |    CAST(COUNT(vec_id) - COUNT(DISTINCT vec_id) AS BIGINT) AS v_uniq
        |  FROM embeddings)
        |SELECT "check", violations, total, violations = 0 AS pass FROM (
        |  SELECT 'dims_64' AS "check", v_dims AS violations, total FROM r
        |  UNION ALL SELECT 'embedding_not_null', v_null, total FROM r
        |  UNION ALL SELECT 'label_domain', v_lab, total FROM r
        |  UNION ALL SELECT 'no_nan', v_nan, total FROM r
        |  UNION ALL SELECT 'vec_id_unique', v_uniq, total FROM r)
        |ORDER BY "check"""".stripMargin,
    "d_length_outliers" ->
      """WITH m AS (SELECT quantile_cont(n_chars, 0.5) AS med FROM documents),
        |d AS (SELECT doc_id, n_chars, abs(n_chars - med) AS dev
        |      FROM documents, m),
        |md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
        |SELECT doc_id, n_chars, dev > 3.0 * mad AS is_outlier
        |FROM d, md ORDER BY doc_id""".stripMargin,
    "d_upsample_mix" ->
      """WITH r AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 2500000 WHEN 'src1' THEN 1200000
        |              WHEN 'src2' THEN 400000 ELSE 1000000 END AS rate
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  rate // 1000000 +
        |  CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000
        |         < rate % 1000000 THEN 1 ELSE 0 END AS n
        |  FROM r)
        |SELECT doc_id, source, CAST(unnest(range(0, n)) AS BIGINT) AS copy
        |FROM n WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,
    "d_strip_markup" ->
      """WITH pg AS (SELECT doc_id,
        |  '<html><body><h1>Doc</h1><p>' || text || '</p><a href="http://x">'
        |    || source || '</a> &amp; more &lt;raw&gt;</body></html>' AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(text, '<[^>]*>', ' ', 'g') AS t,
        |         len(regexp_extract_all(text, '<[^>]*>')) AS n_tags FROM pg),
        |s2 AS (SELECT doc_id,
        |         replace(replace(replace(replace(replace(t,
        |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '&#39;', ''''), '&amp;', '&') AS t, n_tags FROM s1)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text,
        |  CAST(n_tags AS BIGINT) AS n_tags
        |FROM s2 ORDER BY doc_id""".stripMargin,
    "d_fertility" ->
      s"""WITH c AS (SELECT lang, len($ToksSql) AS w,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS b
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(w) AS BIGINT) AS n_words, CAST(SUM(b) AS BIGINT) AS n_bpe,
         |  CASE WHEN SUM(w) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(SUM(b) * 1000000 // SUM(w) AS BIGINT)
         |  END AS fertility_e6
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    "d_release_manifest" ->
      s"""WITH f AS (SELECT source, len(text) AS nc,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT),
         |    list_transform(string_split($NormSql, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs, CAST(SUM(nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(fp) % 1000000007 AS BIGINT) AS content_sum
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "d_overlap_f1" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |pr AS (SELECT doc_id, w[1:20] AS pw, w FROM t),
         |pe AS (SELECT doc_id, unnest(pw) AS tok FROM pr),
         |re AS (SELECT doc_id, unnest(w) AS tok FROM pr),
         |pc AS (SELECT doc_id, tok, COUNT(*) AS np FROM pe GROUP BY 1, 2),
         |rc AS (SELECT doc_id, tok, COUNT(*) AS nr FROM re GROUP BY 1, 2),
         |ov AS (SELECT pc.doc_id, CAST(SUM(LEAST(np, nr)) AS BIGINT) AS n_overlap
         |       FROM pc JOIN rc USING (doc_id, tok) GROUP BY 1),
         |tt AS (SELECT doc_id, CAST(len(pw) AS BIGINT) AS n_pred,
         |         CAST(len(w) AS BIGINT) AS n_ref FROM pr)
         |SELECT tt.doc_id, n_pred, n_ref,
         |  COALESCE(n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
         |  CAST(CASE WHEN n_pred = 0 THEN 0
         |       ELSE COALESCE(n_overlap, 0) * 1000000 // n_pred END AS BIGINT) AS precision_e6,
         |  CAST(CASE WHEN n_ref = 0 THEN 0
         |       ELSE COALESCE(n_overlap, 0) * 1000000 // n_ref END AS BIGINT) AS recall_e6,
         |  CAST(CASE WHEN n_pred + n_ref = 0 THEN 0
         |       ELSE 2 * COALESCE(n_overlap, 0) * 1000000 // (n_pred + n_ref) END AS BIGINT) AS f1_e6
         |FROM tt LEFT JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin,
    "d_source_card" ->
      s"""WITH t AS (SELECT doc_id, source, lang, text, $ToksSql AS w,
         |            $NormSql AS nt FROM documents),
         |c AS (SELECT doc_id, source, lang, nt, len(w) AS ntok,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |s AS (SELECT doc_id, source, lang, nt, ntok,
         |        round(GREATEST(0.0, LEAST(1.0,
         |          LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |          - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS q,
         |        ROW_NUMBER() OVER (PARTITION BY nt ORDER BY doc_id) > 1 AS dup
         |      FROM c),
         |ag AS (SELECT source, COUNT(*) AS n_docs,
         |         CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         |         round(quantile_cont(q, 0.5), 4) AS quality_p50,
         |         CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS ndup
         |       FROM s GROUP BY source),
         |lt AS (SELECT source, lang AS top_lang FROM (
         |         SELECT source, lang,
         |           ROW_NUMBER() OVER (PARTITION BY source
         |             ORDER BY COUNT(*) DESC, lang ASC) AS r
         |         FROM s GROUP BY source, lang) WHERE r = 1)
         |SELECT ag.source, n_docs, n_tokens, quality_p50, top_lang,
         |  CAST(ndup * 1000000 // n_docs AS BIGINT) AS dup_rate_e6
         |FROM ag JOIN lt USING (source) ORDER BY source""".stripMargin,
    "d_dedup_rate" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |nm AS (SELECT doc_id, source, $NormSql AS nt FROM documents),
         |ex AS (SELECT doc_id FROM (
         |         SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY nt ORDER BY doc_id) AS rn
         |         FROM nm) WHERE rn > 1),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u AS doc_id, MIN(v) AS c FROM reach GROUP BY u),
         |nl AS (SELECT doc_id FROM cl WHERE c <> doc_id
         |       AND doc_id NOT IN (SELECT doc_id FROM ex))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN nm.doc_id IN (SELECT doc_id FROM ex) THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |  CAST(SUM(CASE WHEN nm.doc_id IN (SELECT doc_id FROM nl) THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
         |  CAST((SUM(CASE WHEN nm.doc_id IN (SELECT doc_id FROM ex) THEN 1 ELSE 0 END)
         |      + SUM(CASE WHEN nm.doc_id IN (SELECT doc_id FROM nl) THEN 1 ELSE 0 END))
         |      * 1000000 // COUNT(*) AS BIGINT) AS drop_rate_e6
         |FROM nm GROUP BY source ORDER BY source""".stripMargin,
    "d_cluster_sizes" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |cs AS (SELECT cluster_id, COUNT(*) AS size FROM cl GROUP BY 1)
         |SELECT size, COUNT(*) AS n_clusters FROM cs
         |GROUP BY size ORDER BY size""".stripMargin,
    "d_zipf_slope" ->
      s"""WITH tok AS (SELECT unnest($ToksSql) AS token FROM documents),
         |f AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY 1
         |      ORDER BY freq DESC, token ASC LIMIT 100),
         |r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
         |      FROM f),
         |xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         |              CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
         |       FROM r),
         |mo AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |         SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM xy)
         |SELECT n AS n_types,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
         |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |                  CAST(n * sxx - sx * sx AS DOUBLE), 4) END AS slope
         |FROM mo""".stripMargin,
    "e_ivf_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "e_knn_graph" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 1000),
        |s AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |        list_cosine_similarity(a.v, b.v) AS sim
        |      FROM c a, c b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s),
        |t5 AS (SELECT q_id, n_id FROM r WHERE rank <= 5)
        |SELECT a.q_id AS id_a, a.n_id AS id_b FROM t5 a
        |JOIN t5 b ON a.q_id = b.n_id AND a.n_id = b.q_id
        |WHERE a.q_id < a.n_id ORDER BY id_a, id_b""".stripMargin,
    // k1/b constants interpolated from the SAME Scala doubles the
    // operator plans with (k1+1 and 1−b are computed, not typed)
    "d_bm25_topk" ->
      s"""WITH $Bm25Ctes
         |SELECT doc_id, score_e6 FROM sc
         |ORDER BY score_e6 DESC, doc_id ASC LIMIT 10""".stripMargin,
    // replays BOTH logistic steps: w0=0 folds step 1's error to
    // ±500000 exactly; floor (not round) on the weight update is the
    // engine-portable choice (no half-boundary ambiguity)
    "d_quality_train" ->
      s"WITH $QualityTrainCtes\nSELECT bucket, w AS w_e6 FROM w2 ORDER BY bucket",
    // training chain shared with d_quality_train, then SERVE the whole
    // corpus (keep <=> sum(c*w2) > 0 - sign-exact integers) and fold
    // the confusion; absent-from-features docs are predicted-negative
    "d_clf_metrics" ->
      s"""WITH $QualityTrainCtes,
         |sc AS (SELECT f.doc_id, CAST(SUM(c * COALESCE(w2.w, 0)) AS BIGINT) AS swc
         |       FROM f LEFT JOIN w2 USING (bucket) GROUP BY 1),
         |lb AS (SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
         |       FROM documents),
         |pj AS (SELECT lb.doc_id, lb.y, COALESCE(sc.swc > 0, FALSE) AS p
         |       FROM lb LEFT JOIN sc ON lb.doc_id = sc.doc_id),
         |cf AS (SELECT
         |  CAST(SUM(CASE WHEN p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN NOT p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN NOT p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM pj)
         |SELECT tp, fp, fn, tn,
         |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp) END AS BIGINT) AS precision_e6,
         |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 // (tp + fn) END AS BIGINT) AS recall_e6,
         |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS BIGINT) AS f1_e6
         |FROM cf""".stripMargin,
    "e_rank_metrics" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv, label AS nl
        |      FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s),
        |t5 AS (SELECT q_id, n_id, rank FROM r WHERE rank <= 5),
        |qr AS (SELECT q.q_id, c.n_id FROM q JOIN c ON q.ql = c.nl AND q.q_id <> c.n_id),
        |nrel AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM qr GROUP BY 1),
        |hit AS (SELECT t5.q_id, CAST(COUNT(*) AS BIGINT) AS hits,
        |          CAST(MIN(rank) AS BIGINT) AS best,
        |          CAST(SUM(CAST(floor(1000000.0 / log2(CAST(rank AS DOUBLE) + 1.0)) AS BIGINT)) AS BIGINT) AS dcg
        |        FROM t5 JOIN qr ON t5.q_id = qr.q_id AND t5.n_id = qr.n_id GROUP BY 1)
        |SELECT nrel.q_id, n_rel, CAST(COALESCE(hits, 0) AS BIGINT) AS hits,
        |  CAST(COALESCE(hits, 0) * 1000000 // n_rel AS BIGINT) AS recall_e6,
        |  CAST(COALESCE(1000000 // best, 0) AS BIGINT) AS rr_e6,
        |  CAST(COALESCE(dcg, 0) AS BIGINT) AS dcg_e6
        |FROM nrel LEFT JOIN hit ON nrel.q_id = hit.q_id
        |ORDER BY nrel.q_id""".stripMargin,
    // ±1 matrix entry = parity of h^2 mod p, h = (i*C + j*97) mod p —
    // the squared-mod mixer (see the operator Scaladoc); all BIGINT
    "e_sign_project" ->
      """WITH e AS (SELECT vec_id,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |          x -> CAST(round(x * 1000) AS BIGINT)) AS q
        |      FROM embeddings),
        |u AS (SELECT vec_id, q, unnest(range(0, 16)) AS j FROM e)
        |SELECT vec_id, CAST(j AS BIGINT) AS out_dim,
        |  CAST(list_sum(list_transform(range(1, len(q) + 1), i ->
        |    q[i] * (CASE WHEN
        |      (((CAST(i AS BIGINT) - 1) * 2654435761 + j * 97) % 1000000007) *
        |      (((CAST(i AS BIGINT) - 1) * 2654435761 + j * 97) % 1000000007)
        |        % 1000000007 % 2 = 0 THEN 1 ELSE -1 END))) AS BIGINT) AS y_e3
        |FROM u ORDER BY vec_id, out_dim""".stripMargin,
    // centroid = floor(Σq/n) per (label, dim); dist2 exact BIGINT
    "e_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |          x -> CAST(round(x * 1000) AS BIGINT)) AS q
        |      FROM embeddings),
        |x AS (SELECT vec_id, label, q, unnest(range(1, len(q) + 1)) AS i FROM e),
        |v AS (SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS dim, q[i] AS qx FROM x),
        |c AS (SELECT label, dim,
        |        CAST(floor(CAST(SUM(qx) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        |      FROM v GROUP BY 1, 2),
        |d AS (SELECT vec_id, v.label AS label,
        |        CAST(SUM((qx - c) * (qx - c)) AS BIGINT) AS dist2
        |      FROM v JOIN c ON v.label = c.label AND v.dim = c.dim GROUP BY 1, 2),
        |r AS (SELECT label, vec_id, dist2,
        |        ROW_NUMBER() OVER (PARTITION BY label
        |                           ORDER BY dist2 DESC, vec_id ASC) AS rk
        |      FROM d)
        |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, dist2
        |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin,
    "e_dimension_drift" ->
      """WITH av AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 2 = 0),
        |ax AS (SELECT unnest(range(1, len(v) + 1)) AS i, v FROM av),
        |sa AS (SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS s
        |       FROM ax GROUP BY 1),
        |bv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 2 = 1),
        |bx AS (SELECT unnest(range(1, len(v) + 1)) AS i, v FROM bv),
        |sb AS (SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS s
        |       FROM bx GROUP BY 1)
        |SELECT dim, sa.n AS n_a, sb.n AS n_b,
        |  round(CAST(sa.s AS DOUBLE) / 1000000.0 / CAST(sa.n AS DOUBLE), 4) AS mean_a,
        |  round(CAST(sb.s AS DOUBLE) / 1000000.0 / CAST(sb.n AS DOUBLE), 4) AS mean_b,
        |  round(abs(round(CAST(sa.s AS DOUBLE) / 1000000.0 / CAST(sa.n AS DOUBLE), 4) -
        |            round(CAST(sb.s AS DOUBLE) / 1000000.0 / CAST(sb.n AS DOUBLE), 4)), 4) AS shift
        |FROM sa JOIN sb USING (dim) ORDER BY dim""".stripMargin,
    "e_cluster_sample" ->
      """WITH cent AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |              FROM embeddings WHERE vec_id < 4),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |sims AS (SELECT v.vec_id, cell, list_cosine_similarity(vv, cv) AS sim
        |         FROM v, cent),
        |asn AS (SELECT vec_id, cell,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rnk
        |        FROM sims),
        |cells AS (SELECT vec_id, cell FROM asn WHERE rnk = 1),
        |h AS (SELECT vec_id, cell,
        |        (((vec_id % 1000000007) * 2654435761) % 1000000007) % 97 AS hv
        |      FROM cells),
        |r AS (SELECT cell, vec_id,
        |        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY hv, vec_id) AS rk
        |      FROM h)
        |SELECT cell, CAST(rk AS BIGINT) AS rk, vec_id FROM r
        |WHERE rk <= 25 ORDER BY cell, rk""".stripMargin,
    // replays the engine's integer power iteration exactly: damping
    // 17/20 via floored integer division, ranks ×1e6 as BIGINTs
    "e_knn_centrality" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 1000),
        |s AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |        list_cosine_similarity(a.v, b.v) AS sim
        |      FROM c a, c b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s),
        |t5 AS (SELECT q_id, n_id FROM r WHERE rank <= 5),
        |m AS (SELECT a.q_id AS id_a, a.n_id AS id_b FROM t5 a
        |      JOIN t5 b ON a.q_id = b.n_id AND a.n_id = b.q_id
        |      WHERE a.q_id < a.n_id),
        |sym AS (SELECT id_a AS u, id_b AS v FROM m UNION ALL SELECT id_b, id_a FROM m),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |p0 AS (SELECT u AS vv, CAST(1000000 AS BIGINT) AS rr FROM dg),
        |p1 AS (SELECT s2.v AS vv, CAST(150000 + SUM((p.rr * 17) // (20 * d.deg)) AS BIGINT) AS rr
        |       FROM sym s2 JOIN p0 p ON s2.u = p.vv JOIN dg d ON s2.u = d.u GROUP BY s2.v),
        |p2 AS (SELECT s2.v AS vv, CAST(150000 + SUM((p.rr * 17) // (20 * d.deg)) AS BIGINT) AS rr
        |       FROM sym s2 JOIN p1 p ON s2.u = p.vv JOIN dg d ON s2.u = d.u GROUP BY s2.v),
        |p3 AS (SELECT s2.v AS vv, CAST(150000 + SUM((p.rr * 17) // (20 * d.deg)) AS BIGINT) AS rr
        |       FROM sym s2 JOIN p2 p ON s2.u = p.vv JOIN dg d ON s2.u = d.u GROUP BY s2.v)
        |SELECT dg.u AS vec_id, dg.deg AS degree, p3.rr AS rank_e6
        |FROM p3 JOIN dg ON p3.vv = dg.u ORDER BY vec_id""".stripMargin,
    "e_semantic_clusters" ->
      """WITH RECURSIVE c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 1000),
        |s AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |        list_cosine_similarity(a.v, b.v) AS sim
        |      FROM c a, c b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s),
        |t5 AS (SELECT q_id, n_id FROM r WHERE rank <= 5),
        |m AS (SELECT a.q_id AS id_a, a.n_id AS id_b FROM t5 a
        |      JOIN t5 b ON a.q_id = b.n_id AND a.n_id = b.q_id
        |      WHERE a.q_id < a.n_id),
        |sym AS (SELECT id_a AS u, id_b AS v FROM m UNION SELECT id_b, id_a FROM m),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |                UNION
        |                SELECT r2.u, s2.v FROM reach r2 JOIN sym s2 ON r2.v = s2.u)
        |SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach
        |GROUP BY u ORDER BY vec_id""".stripMargin,
    "e_pq_residual" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "e_pq_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "e_pq_index_serve" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "e_lsh_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "d_dedup_exact" ->
      s"""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM documents GROUP BY $NormSql
         |ORDER BY keep_id""".stripMargin,
    "d_dedup_incremental" ->
      s"""WITH n AS (SELECT doc_id, $NormSql AS norm FROM documents WHERE doc_id >= 250),
         |seen AS (SELECT DISTINCT $NormSql AS norm FROM documents WHERE doc_id < 250)
         |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM n WHERE norm NOT IN (SELECT norm FROM seen)
         |GROUP BY norm ORDER BY keep_id""".stripMargin,
    "d_dedup_bloom" ->
      s"""WITH n AS (SELECT doc_id, $NormSql AS norm FROM documents WHERE doc_id % 3 <> 0),
         |seen AS (SELECT DISTINCT $NormSql AS norm FROM documents WHERE doc_id % 3 = 0)
         |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM n WHERE norm NOT IN (SELECT norm FROM seen)
         |GROUP BY norm ORDER BY keep_id""".stripMargin,
    "d_boilerplate" ->
      s"""WITH p AS (SELECT doc_id,
         |    'Example Site - All About Data' || chr(10) || 'Home | Products | About' || chr(10)
         |    || text || chr(10) || 'Follow Us On SocialNet' || chr(10)
         |    || 'Copyright 2026 ' || source AS text
         |  FROM documents),
         |sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM p),
         |e AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM (
         |        SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
         |               i -> struct_pack(pos := i, line := ls[i]))) AS u FROM sp)),
         |nrm AS (SELECT doc_id, pos, line,
         |          ${NormSql.replace("(text)", "(line)")} AS ln FROM e),
         |b AS (SELECT ln FROM nrm WHERE len(ln) > 0
         |      GROUP BY ln HAVING count(DISTINCT doc_id) >= 3),
         |k AS (SELECT nrm.doc_id, nrm.pos, nrm.line, (b.ln IS NOT NULL) AS dropped
         |      FROM nrm LEFT JOIN b USING (ln))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       COALESCE(array_to_string(list(line ORDER BY pos) FILTER (WHERE NOT dropped),
         |                chr(10)), '') AS clean_text
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_contamination" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |b AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 10 = 0),
         |c AS (SELECT doc_id, unnest(sh) AS s FROM s WHERE doc_id % 10 <> 0)
         |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM c JOIN b ON c.s = b.s
         |GROUP BY c.doc_id HAVING COUNT(*) >= 2 ORDER BY doc_id""".stripMargin,
    "d_curation_funnel" -> (CurationFunnelPrefix + CurationFunnelStages + "\nORDER BY stage"),
    // the DEFAULT Auto pair source at driver scale resolves to exact
    // Jaccard (survivors << AutoMinHashSurvivors) — the oracle is the
    // IDENTICAL funnel replay; a mismatch means the threshold routing
    // broke
    "d_curation_auto" -> (CurationFunnelPrefix + CurationFunnelStages + "\nORDER BY stage"),
    // funnel prefix (→ clean) + the d_temperature_mix rate/gate math
    // over the SURVIVORS' source mix at α = ½, target 0.4
    // stage-1b novelty gate ahead of the full four-stage chain: the
    // quality stage reads the gated frame `nv` instead of `base`
    "d_curation_novelty" -> (curationPrefixFrom(NoveltyGateCtes, "nv") +
      "\nSELECT doc_id FROM clean ORDER BY doc_id"),
    // stage-1c lexicon gate ahead of the chain: the quality stage reads
    // the screened frame `lx` instead of `base`
    "d_curation_lexicon" -> (curationPrefixFrom(LexiconGateCtes, "lx") +
      "\nSELECT doc_id FROM clean ORDER BY doc_id"),
    // stage-1d entropy gate ahead of the chain: the quality stage
    // reads the information-density-gated frame `en` instead of `base`
    "d_curation_entropy" -> (curationPrefixFrom(EntropyGateCtes, "en") +
      "\nSELECT doc_id FROM clean ORDER BY doc_id"),
    "d_curation_mixture" -> (CurationFunnelPrefix +
      """,
        |gsrc AS (SELECT c.doc_id, d.source FROM clean c
        |         JOIN documents d ON c.doc_id = d.doc_id),
        |gct AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM gsrc GROUP BY 1),
        |gtt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM gct),
        |gw AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6,
        |        CAST(floor(CAST(total AS DOUBLE) * 0.4) AS BIGINT) AS target
        |      FROM gct CROSS JOIN gtt),
        |gz AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS z FROM gw),
        |gr AS (SELECT source,
        |        least(CAST(1000000 AS BIGINT),
        |              (w_e6 * target * 1000000) // (z * n_docs)) AS rate_e6
        |      FROM gw CROSS JOIN gz)
        |SELECT g.doc_id FROM gsrc g JOIN gr ON g.source = gr.source
        |WHERE (((g.doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000 < gr.rate_e6
        |ORDER BY g.doc_id""".stripMargin),
    // funnel prefix + seed-1 permutation + prefix sums IN POS ORDER:
    // the packed-stream writer frame, fully replayed
    "d_training_packs" -> (CurationFunnelPrefix +
      """,
        |shx AS (SELECT doc_id,
        |  (doc_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (doc_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM clean),
        |ordx AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, k, doc_id) - 1 AS pos FROM shx),
        |j AS (SELECT ordx.doc_id, pos, CAST(len(w) AS BIGINT) AS n_tokens
        |      FROM ordx JOIN clean USING (doc_id)),
        |ps AS (SELECT doc_id, pos, n_tokens,
        |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |      FROM j)
        |SELECT doc_id, pos, n_tokens, start_offset,
        |       CAST(start_offset // 512 AS BIGINT) AS pack_id,
        |       CAST(start_offset % 512 AS BIGINT) AS pack_offset
        |FROM ps ORDER BY doc_id""".stripMargin),
    // the WHOLE training-prep composition: funnel prefix (→ clean) +
    // the seed-1 permutation fragment (d_epoch_shuffle's) + striping
    "d_training_prep" -> (CurationFunnelPrefix +
      """,
        |shx AS (SELECT doc_id,
        |  (doc_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (doc_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM clean),
        |ordx AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, k, doc_id) - 1 AS pos FROM shx)
        |SELECT CAST(pos % 4 AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(len(w)) AS BIGINT) AS n_tokens
        |FROM ordx JOIN clean USING (doc_id) GROUP BY 1 ORDER BY shard""".stripMargin),
    // curation → curriculum order (token count asc, seed-1 shuffle
    // within a length, id tie-break) → striping: prepareCurriculum's
    // three-level prefix sum collapses to ONE dense rank over the
    // composite sort key (d, b, k, id)
    "d_training_curriculum" -> (CurationFunnelPrefix +
      """,
        |shc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS d,
        |  (doc_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 1024 AS b,
        |  (doc_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM clean),
        |ordc AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY d, b, k, doc_id) - 1 AS pos
        |         FROM shc)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(pos % 4 AS BIGINT) AS shard
        |FROM ordc ORDER BY doc_id""".stripMargin),
    // curation → epoch upsample (deterministic fractional copies) →
    // seed-1 permutation over the replica key (id·1024 + copy) →
    // striping: the multi-epoch composition in one replay
    "d_training_upsample" -> (CurationFunnelPrefix +
      """,
        |up0 AS (SELECT c.doc_id, d.source FROM clean c
        |        JOIN documents d USING (doc_id)),
        |upr AS (SELECT doc_id,
        |          CASE source WHEN 'src0' THEN 2000000 WHEN 'src1' THEN 1500000
        |               ELSE 1000000 END AS rate FROM up0),
        |upn AS (SELECT doc_id, rate // 1000000 +
        |          CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000
        |                 < rate % 1000000 THEN 1 ELSE 0 END AS n FROM upr),
        |upc AS (SELECT doc_id, CAST(unnest(range(0, n)) AS BIGINT) AS copy
        |        FROM upn WHERE n > 0),
        |rep AS (SELECT doc_id, copy, doc_id * 1024 + copy AS rep_id FROM upc),
        |shx AS (SELECT rep_id, doc_id, copy,
        |  (rep_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (rep_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM rep),
        |ordx AS (SELECT doc_id, copy,
        |           ROW_NUMBER() OVER (ORDER BY b, k, rep_id) - 1 AS pos FROM shx)
        |SELECT doc_id, copy, CAST(pos AS BIGINT) AS pos,
        |       CAST(pos % 4 AS BIGINT) AS shard
        |FROM ordx ORDER BY doc_id, copy""".stripMargin),
    // DoReMi-driven training order, EVERY stage replayed: funnel
    // prefix (→ clean), the K=2 iterative reweighting chain over the
    // CURATED corpus (both rounds unrolled — same math as
    // d_doremi_weights, dm-prefixed against the funnel's CTE names),
    // learned weights → capped per-source epoch rates
    // (weight_e6 · N // n_docs, LEAST 8e6), then the upsample gate,
    // replica key, seed-1 permutation, and striping of
    // d_training_upsample. dmcd/dmsg/dmsu are MATERIALIZED: DuckDB
    // inlines CTEs per reference, and four inlined copies of the
    // recursive funnel exhaust the fd limit.
    "d_training_doremi" -> (CurationFunnelPrefix + DoremiReplicaCtes +
      """,
        |dshx AS (SELECT rep_id, doc_id, copy,
        |  (rep_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (rep_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM drep),
        |dord AS (SELECT doc_id, copy,
        |           ROW_NUMBER() OVER (ORDER BY b, k, rep_id) - 1 AS pos FROM dshx)
        |SELECT doc_id, copy, CAST(pos AS BIGINT) AS pos,
        |       CAST(pos % 4 AS BIGINT) AS shard
        |FROM dord ORDER BY doc_id, copy""".stripMargin),
    // the DoReMi x curriculum composition: the SAME funnel + fit +
    // upsample replay, then the EPOCH-MAJOR curriculum rank -- copy
    // majors via the 2^32 shift, the curation token count orders
    // within the epoch, and the seed-1 bucket/key hash on the replica
    // key breaks within-length ties. curriculumOrder's three-level
    // prefix sum collapses to ONE dense rank over (d, b, k, rep_id),
    // the d_training_curriculum convention.
    "d_training_doremi_curr" -> (CurationFunnelPrefix + DoremiReplicaCtes +
      """,
        |dnt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt FROM clean),
        |dcd AS (SELECT drep.doc_id, copy, rep_id, copy * 4294967296 + nt AS d
        |        FROM drep JOIN dnt USING (doc_id)),
        |dshc AS (SELECT rep_id, doc_id, copy, d,
        |  (rep_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 1024 AS b,
        |  (rep_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM dcd),
        |dordc AS (SELECT doc_id, copy,
        |            ROW_NUMBER() OVER (ORDER BY d, b, k, rep_id) - 1 AS pos FROM dshc)
        |SELECT doc_id, copy, CAST(pos AS BIGINT) AS pos,
        |       CAST(pos % 4 AS BIGINT) AS shard
        |FROM dordc ORDER BY doc_id, copy""".stripMargin),
    // the seven-operator composition: funnel prefix (→ clean) +
    // temperature gate over the survivors + the seed-1 permutation +
    // striping, all in one replay
    "d_training_mixture" -> (CurationFunnelPrefix +
      """,
        |gsrc AS (SELECT c.doc_id, c.w, d.source FROM clean c
        |         JOIN documents d ON c.doc_id = d.doc_id),
        |gct AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM gsrc GROUP BY 1),
        |gtt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM gct),
        |gw AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6,
        |        CAST(floor(CAST(total AS DOUBLE) * 0.4) AS BIGINT) AS target
        |      FROM gct CROSS JOIN gtt),
        |gz AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS z FROM gw),
        |gr AS (SELECT source,
        |        least(CAST(1000000 AS BIGINT),
        |              (w_e6 * target * 1000000) // (z * n_docs)) AS rate_e6
        |      FROM gw CROSS JOIN gz),
        |mix AS (SELECT g.doc_id, g.w FROM gsrc g JOIN gr ON g.source = gr.source
        |        WHERE (((g.doc_id % 1000000007) * 2654435761) % 1000000007) % 1000000 < gr.rate_e6),
        |shx AS (SELECT doc_id,
        |  (doc_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (doc_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM mix),
        |ordx AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, k, doc_id) - 1 AS pos FROM shx)
        |SELECT CAST(pos % 4 AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(len(w)) AS BIGINT) AS n_tokens
        |FROM ordx JOIN mix USING (doc_id) GROUP BY 1 ORDER BY shard""".stripMargin),
    // The 5 text stages plus the semantic tail: cosine closure over
    // stage-5 survivors' embeddings (vec_id ≡ doc_id), min id kept.
    "d_curation_semantic" -> (CurationFunnelPrefix +
      s""",
         |emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |spr AS (SELECT a.vec_id AS ia, b.vec_id AS ib
         |        FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
         |        JOIN clean ca ON ca.doc_id = a.vec_id
         |        JOIN clean cb ON cb.doc_id = b.vec_id
         |        WHERE list_cosine_similarity(a.e, b.e) >= 0.45),
         |ssym AS (SELECT ia AS u, ib AS v FROM spr UNION SELECT ib, ia FROM spr),
         |sreach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM ssym)
         |                 UNION
         |                 SELECT r.u, s2.v FROM sreach r JOIN ssym s2 ON r.v = s2.u),
         |slosers AS (SELECT u FROM (SELECT u, MIN(v) AS m FROM sreach GROUP BY u)
         |            WHERE u <> m),
         |sem AS (SELECT doc_id, w FROM clean
         |        WHERE doc_id NOT IN (SELECT u FROM slosers))""".stripMargin +
      CurationFunnelStages +
      s"""
         |UNION ALL SELECT '6_semantic', COUNT(*),
         |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM sem
         |ORDER BY stage""".stripMargin),
    // per-doc drop attribution: first absent stage wins, over the same
    // CTE chain as d_curation_funnel
    "d_curation_audit" -> (CurationFunnelPrefix +
      s"""
         |SELECT doc_id,
         |  CASE WHEN doc_id NOT IN (SELECT doc_id FROM qd) THEN '2_quality'
         |       WHEN doc_id NOT IN (SELECT doc_id FROM ed) THEN '3_exact_dedup'
         |       WHEN doc_id NOT IN (SELECT doc_id FROM nd) THEN '4_near_dup'
         |       WHEN doc_id NOT IN (SELECT doc_id FROM clean) THEN '5_decontaminated'
         |       ELSE 'kept' END AS dropped_at
         |FROM base ORDER BY doc_id""".stripMargin),
    // the 7-stage hybrid funnel: d_curation_semantic's CTE chain plus
    // the embedding-space decontamination tail — a stage-6 survivor is
    // dropped iff its aligned embedding reaches cosine 0.45 to ANY
    // benchmark embedding (vec_id % 7 = 0) other than itself; survivors
    // without an embedding pass unjudged
    "d_curation_semdecontam" -> (CurationFunnelPrefix +
      s""",
         |emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |spr AS (SELECT a.vec_id AS ia, b.vec_id AS ib
         |        FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
         |        JOIN clean ca ON ca.doc_id = a.vec_id
         |        JOIN clean cb ON cb.doc_id = b.vec_id
         |        WHERE list_cosine_similarity(a.e, b.e) >= 0.45),
         |ssym AS (SELECT ia AS u, ib AS v FROM spr UNION SELECT ib, ia FROM spr),
         |sreach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM ssym)
         |                 UNION
         |                 SELECT r.u, s2.v FROM sreach r JOIN ssym s2 ON r.v = s2.u),
         |slosers AS (SELECT u FROM (SELECT u, MIN(v) AS m FROM sreach GROUP BY u)
         |            WHERE u <> m),
         |sem AS (SELECT doc_id, w FROM clean
         |        WHERE doc_id NOT IN (SELECT u FROM slosers)),
         |dhits AS (SELECT c.vec_id FROM emb2 c
         |          JOIN sem s ON s.doc_id = c.vec_id
         |          JOIN emb2 b ON b.vec_id % 7 = 0 AND b.vec_id <> c.vec_id
         |          WHERE list_cosine_similarity(c.e, b.e) >= 0.45
         |          GROUP BY c.vec_id),
         |dec AS (SELECT doc_id, w FROM sem
         |        WHERE doc_id NOT IN (SELECT vec_id FROM dhits))""".stripMargin +
      CurationFunnelStages +
      s"""
         |UNION ALL SELECT '6_semantic', COUNT(*),
         |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM sem
         |UNION ALL SELECT '7_semdecontam', COUNT(*),
         |       CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) FROM dec
         |ORDER BY stage""".stripMargin),
    "d_dup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u)
         |SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach
         |GROUP BY u ORDER BY doc_id""".stripMargin,
    "d_dedup_cap" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pr AS (SELECT ia, ib FROM p
         |       JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |       WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
         |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
         |                UNION
         |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |rk AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY doc_id ASC) AS rn
         |       FROM cl)
         |SELECT d.doc_id FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM rk WHERE rn > 2)
         |ORDER BY d.doc_id""".stripMargin,
    "d_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  (doc_id % 1000000007 + 1) % 1000000007 * 2654435761 % 1000000007 % 8192 AS b,
        |  (doc_id % 1000000007 + 2) % 1000000007 * 2654435761 % 1000000007 AS k
        |FROM documents)
        |SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, k, doc_id) - 1 AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    "d_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, $ShinglesSql AS sh FROM t),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM s),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM e GROUP BY 1),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
         |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b,
         |       round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jaccard
         |FROM p JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "d_text_stats" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w, $NormSql AS norm FROM documents)
         |SELECT doc_id,
         |  len(w) AS n_tokens,
         |  round(CASE WHEN len(w) = 0 THEN 0.0
         |        ELSE CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END, 4) AS mean_token_len,
         |  round(CASE WHEN len(w) = 0 THEN 0.0
         |        ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END, 4) AS stopword_ratio,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT),
         |    list_transform(string_split(norm, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         |FROM t ORDER BY doc_id""".stripMargin,
    "d_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t)
         |SELECT doc_id,
         |  round(GREATEST(0.0, LEAST(1.0,
         |    LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |    - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS quality
         |FROM c ORDER BY doc_id""".stripMargin,
    // ROC-AUC of the 4-dp quality score vs the Gopher keep label:
    // tie-averaged ranks via grouped cumulative counts — each score
    // group's positives take DOUBLED average rank 2·cb + c + 1, so the
    // arithmetic stays integral end to end
    "d_quality_auc" -> (QualityLabelCtes +
      s""",
         |rk AS (SELECT c, cp,
         |        CAST(COALESCE(SUM(c) OVER (ORDER BY s
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
         |      FROM g),
         |a AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
         |             CAST(SUM(c) - SUM(cp) AS BIGINT) AS nn,
         |             CAST(SUM(cp * (2 * cb + c + 1)) AS BIGINT) AS r2 FROM rk)
         |SELECT np AS n_pos, nn AS n_neg,
         |  CASE WHEN np = 0 OR nn = 0 THEN CAST(NULL AS BIGINT)
         |       ELSE CAST((r2 - np * (np + 1)) * 1000000 // (2 * np * nn) AS BIGINT) END AS auc_e6
         |FROM a""".stripMargin),
    // precision-recall curve over the same score/label pair: one
    // operating point per distinct score, cumulative counts in
    // DESCENDING score order ("keep everything scoring >= s");
    // precision denominator = rows at or above the threshold,
    // f1 denominator = (tp+fp) + (tp+fn) = n_at + pos
    "d_quality_pr" -> (QualityLabelCtes +
      s""",
         |cum AS (SELECT s,
         |  CAST(SUM(cp) OVER (ORDER BY s DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         |  CAST(SUM(c) OVER (ORDER BY s DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at,
         |  CAST(SUM(cp) OVER () AS BIGINT) AS pos
         |FROM g)
         |SELECT s AS score, tp, n_at - tp AS fp,
         |  tp * 1000000 // n_at AS precision_e6,
         |  CASE WHEN pos = 0 THEN 0 ELSE tp * 1000000 // pos END AS recall_e6,
         |  CASE WHEN n_at + pos = 0 THEN 0
         |       ELSE 2 * tp * 1000000 // (n_at + pos) END AS f1_e6
         |FROM cum ORDER BY score DESC""".stripMargin),
    // calibration deciles over the same score/label pair: equal-width
    // bins with top-clamp (score = 1.0 -> bin 9), quantized mean score
    // and empirical positive rate per bin
    "d_quality_bins" -> (QualityLabelCtes +
      s""",
         |pb AS (SELECT LEAST(GREATEST(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
         |              y, CAST(floor(LEAST(GREATEST(s, 0), 1) * 1000000) AS BIGINT) AS s6
         |       FROM qs JOIN lab USING (doc_id))
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
         |  CAST(SUM(s6) // COUNT(*) AS BIGINT) AS mean_score_e6,
         |  CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_e6
         |FROM pb GROUP BY bin ORDER BY bin""".stripMargin),
    // per-doc unigram entropy: run lengths of the doc's own sorted
    // token list (no per-token rows ever materialize), each distinct
    // token's ln(n/c) 1e6-quantized then count-weighted — exact
    // integers after the one round()
    "d_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS w FROM documents),
         |s AS (SELECT doc_id, list_sort(w) AS sw, len(w) AS n FROM t),
         |r AS (SELECT doc_id, n, sw,
         |        list_filter(range(1, n + 1), i -> i = 1 OR sw[i] <> sw[i - 1]) AS st
         |      FROM s),
         |cn AS (SELECT doc_id, n, len(st) AS nd,
         |        list_transform(range(1, len(st) + 1), j ->
         |          CASE WHEN j = len(st) THEN n + 1 - st[j]
         |               ELSE st[j + 1] - st[j] END) AS cnts
         |      FROM r)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct,
         |  CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(COALESCE(list_sum(list_transform(cnts, c -> c *
         |         CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT))), 0)
         |         // n AS BIGINT) END AS entropy_e6
         |FROM cn ORDER BY doc_id""".stripMargin,
    "d_quality_calibration" ->
      s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS w FROM documents),
         |c AS (SELECT doc_id, source,
         |        CASE WHEN len(w) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS swr,
         |        CAST(len(w) AS DOUBLE) / 100.0 AS lenr,
         |        len(regexp_replace(text, '\\s', '', 'g')) AS chars,
         |        len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct
         |      FROM t),
         |s AS (SELECT doc_id, source,
         |  round(GREATEST(0.0, LEAST(1.0,
         |    LEAST(lenr, 1.0) * 0.5 + LEAST(swr * 5.0, 1.0) * 0.5
         |    - LEAST(CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE) END * 2.0, 1.0) * 0.25)), 4) AS score
         |  FROM c),
         |q AS (SELECT source, quantile_cont(score, 0.7) AS cut FROM s GROUP BY source)
         |SELECT s.doc_id, s.source, s.score, round(q.cut, 4) AS cutoff,
         |  s.score >= q.cut AS keep
         |FROM s JOIN q ON s.source = q.source ORDER BY s.doc_id""".stripMargin,
    "e_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // MMR diverse rerank, every greedy round unrolled (k=5, depth=12,
    // lambda 0.7) — the d_bpe_merges convention for iterative operators
    "e_mmr_topk" -> mmrOracle(k = 5, depth = 12, lambdaE6 = 700000L),
    // exact-config IVF shortlist == brute shortlist, so the oracle is
    // the identical greedy replay (see mmrIvfQ's scaladoc)
    "e_mmr_ivf" -> mmrOracle(k = 5, depth = 12, lambdaE6 = 700000L),
    "e_ann_recall" ->
      """WITH cent AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |              FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |sims AS (SELECT v.vec_id, cell, list_cosine_similarity(vv, cv) AS sim
        |         FROM v, cent),
        |asn AS (SELECT vec_id, cell,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rnk
        |        FROM sims),
        |cells AS (SELECT vec_id, cell FROM asn WHERE rnk = 1),
        |qp AS (SELECT vec_id AS q_id, cell FROM asn WHERE vec_id < 50 AND rnk <= 2),
        |cand AS (SELECT qp.q_id, c.vec_id AS n_id
        |         FROM qp JOIN cells c USING (cell) WHERE c.vec_id <> qp.q_id),
        |scored AS (SELECT cand.q_id, cand.n_id,
        |             list_cosine_similarity(qv.vv, nv.vv) AS sim
        |           FROM cand JOIN v qv ON qv.vec_id = cand.q_id
        |                     JOIN v nv ON nv.vec_id = cand.n_id),
        |ann AS (SELECT q_id, n_id FROM (
        |          SELECT q_id, n_id,
        |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk
        |          FROM scored) WHERE rk <= 5),
        |bf AS (SELECT q_id, n_id FROM (
        |         SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |           ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |             ORDER BY list_cosine_similarity(a.vv, b.vv) DESC, b.vec_id ASC) AS rk
        |         FROM v a, v b WHERE a.vec_id < 50 AND a.vec_id <> b.vec_id)
        |       WHERE rk <= 5),
        |agg AS (SELECT (SELECT COUNT(*) FROM bf) AS n_exact,
        |               (SELECT COUNT(*) FROM ann JOIN bf USING (q_id, n_id)) AS n_hits)
        |SELECT n_exact, n_hits,
        |  CAST(CASE WHEN n_exact = 0 THEN 0
        |       ELSE n_hits * 1000000 // n_exact END AS BIGINT) AS recall_e6
        |FROM agg""".stripMargin,
    "e_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS ql, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, label AS nl, CAST(embedding AS DOUBLE[]) AS nv
        |      FROM embeddings),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id AND ql <> nl),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "e_anisotropy" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, generate_subscripts(v, 1) AS dim,
        |        CAST(round(unnest(v) * 1000) AS BIGINT) AS q FROM e),
        |d AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS en
        |      FROM x GROUP BY dim),
        |a AS (SELECT MAX(n) AS n, COUNT(*) AS dims,
        |        CAST(SUM(s * s) AS BIGINT) AS mu_energy,
        |        CAST(SUM(en) AS BIGINT) AS total_energy FROM d)
        |SELECT n, dims, mu_energy, total_energy,
        |  CASE WHEN n = 0 OR total_energy = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(mu_energy // n * 1000000 // total_energy AS BIGINT)
        |  END AS anisotropy_e6
        |FROM a""".stripMargin,
    "e_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
        |q AS (SELECT vec_id, m,
        |        list_transform(v, x -> CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor(x * (127.0 / m) + 0.5) AS BIGINT) END) AS q
        |      FROM m)
        |SELECT vec_id,
        |  CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(floor(127.0 / m * 10000.0 + 0.5) AS BIGINT) END AS scale_e4,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  list_min(q) AS q_min,
        |  list_max(q) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,
    "e_near_dup_pairs" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.e, b.e) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "e_ivf_near_dup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.e, b.e) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    // margin-disabled SDC config ≡ exact pairs (prefilter passes all,
    // verify is exact) — same brute-force oracle as e_ivf_near_dup
    "e_pq_near_dup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.e, b.e) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    // exact cross pairs: id_a = new batch (>= 250), id_b = seen corpus
    "e_ivf_incremental" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM v a, v b
        |WHERE a.vec_id >= 250 AND b.vec_id < 250
        |  AND list_cosine_similarity(a.e, b.e) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "e_semantic_dedup" ->
      """WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |                       FROM embeddings),
        |pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib FROM emb a, emb b
        |       WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.e, b.e) >= 0.45),
        |sym AS (SELECT ia AS u, ib AS v FROM pr UNION SELECT ib, ia FROM pr),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |                UNION
        |                SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
        |cl AS (SELECT u, MIN(v) AS c FROM reach GROUP BY u)
        |SELECT emb.vec_id, (cl.u IS NULL OR cl.c = emb.vec_id) AS kept
        |FROM emb LEFT JOIN cl ON cl.u = emb.vec_id
        |ORDER BY vec_id""".stripMargin,
    // brute cross scan: corpus id kept unless ANY benchmark vector
    // (vec_id % 5 = 0) reaches cosine 0.45
    "e_semantic_decontam" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |c AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
        |b AS (SELECT * FROM v WHERE vec_id % 5 = 0),
        |hits AS (SELECT c.vec_id FROM c, b
        |         WHERE list_cosine_similarity(c.e, b.e) >= 0.45
        |         GROUP BY c.vec_id)
        |SELECT c.vec_id, h.vec_id IS NULL AS kept
        |FROM c LEFT JOIN hits h ON h.vec_id = c.vec_id
        |ORDER BY c.vec_id""".stripMargin,
    // brute top-5 over the filtered corpus (label % 3 = 0): the Post
    // arm at the exactness configuration must reproduce it bit-for-bit
    "e_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
        |      FROM embeddings WHERE label % 3 = 0),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // brute top-5 over the label % 3 = 1 survivors: the persisted-index
    // Post serve at the exactness configuration must reproduce it
    "e_pq_filtered_serve" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
        |      FROM embeddings WHERE label % 3 = 1),
        |s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS sim
        |      FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "d_bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe,
        |  len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS n_bpe_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $ToksSql AS w FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS s_en,
         |  len(list_filter(w, x -> x IN ('el','la','de','y','que','en','un'))) AS s_es,
         |  len(list_filter(w, x -> x IN ('le','la','de','et','que','en','un'))) AS s_fr,
         |  len(list_filter(w, x -> x IN ('der','die','das','und','zu','den','ist'))) AS s_de
         |  FROM t),
         |p AS (SELECT doc_id, lang,
         |  CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
         |       WHEN s_de > GREATEST(s_en, s_es, s_fr) THEN 'de'
         |       WHEN s_fr > GREATEST(s_en, s_es) THEN 'fr'
         |       WHEN s_es > s_en THEN 'es'
         |       ELSE 'en' END AS predicted
         |  FROM sc)
         |SELECT doc_id, predicted,
         |       CAST(predicted = lang AS INT) AS matches_label
         |FROM p ORDER BY doc_id""".stripMargin,
    "d_vocab_topk" ->
      s"""WITH t AS (SELECT unnest($ToksSql) AS token FROM documents),
         |f AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY 1)
         |SELECT token, freq FROM f
         |ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin,
    "e_user_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        |g AS (SELECT user_id, event_id, ts_ms,
        |        ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS gap
        |      FROM e),
        |s AS (SELECT user_id, ts_ms,
        |        SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                ROWS UNBOUNDED PRECEDING) AS session
        |      FROM g)
        |SELECT user_id, CAST(session AS BIGINT) AS session,
        |  MIN(ts_ms) AS session_start, MAX(ts_ms) AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session""".stripMargin,
    "e_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts FROM events
        |           WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ts, event_id AS purchase_id
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, p.purchase_id, e.ts - p.ts AS gap_ms
        |FROM e ASOF JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY event_id""".stripMargin,
    "d_multimodal_decode" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(len(text) AS INT) AS l, CAST(len(text) % 256 AS INT) AS seed,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format
        |  FROM documents)
        |SELECT media_id, format,
        |  CAST(CASE WHEN format = 'wav' THEN (l % 32) + 1 ELSE (l % 16) + 1 END AS BIGINT) AS width,
        |  CAST(CASE WHEN format = 'wav' THEN 1 ELSE (l % 12) + 1 END AS BIGINT) AS height,
        |  CAST(CASE WHEN format = 'wav'
        |    THEN list_sum(list_transform(range(0, (l % 32) + 1),
        |           i -> abs((seed + 7*i) % 2001 - 1000)))
        |    ELSE list_sum(flatten(list_transform(range(0, (l % 16) + 1),
        |           x -> list_transform(range(0, (l % 12) + 1),
        |                  y -> (seed + 31*x + 17*y) % 256))))
        |  END AS BIGINT) AS content_sum
        |FROM p ORDER BY media_id""".stripMargin,
    "d_multimodal_resize" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(len(text) AS INT) AS l, CAST(len(text) % 256 AS INT) AS seed,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format
        |  FROM documents)
        |SELECT media_id, format,
        |  CAST(CASE WHEN format = 'wav' THEN 16 ELSE 8 END AS BIGINT) AS width,
        |  CAST(CASE WHEN format = 'wav' THEN 1 ELSE 6 END AS BIGINT) AS height,
        |  CAST(CASE WHEN format = 'wav'
        |    THEN list_sum(list_transform(range(0, 16),
        |           i -> abs((seed + 7 * ((i * ((l % 32) + 1)) // 16)) % 2001 - 1000)))
        |    ELSE list_sum(flatten(list_transform(range(0, 8),
        |           x -> list_transform(range(0, 6),
        |                  y -> (seed + 31 * ((x * ((l % 16) + 1)) // 8)
        |                             + 17 * ((y * ((l % 12) + 1)) // 6)) % 256))))
        |  END AS BIGINT) AS content_sum
        |FROM p ORDER BY media_id""".stripMargin,
    "d_multimodal_frames" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(i AS INT) AS frame_idx,
        |  ascii(text[i * 4 + 1 : i * 4 + 1]) AS frame_byte
        |FROM documents,
        |  UNNEST(range(0, GREATEST(CAST(floor(strlen(text) / 4) AS INT) - 1, 0) + 1)) AS t(i)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d_multimodal_jpeg" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST((len(text) % 16) + 1 AS BIGINT) AS width,
        |  CAST((len(text) % 12) + 1 AS BIGINT) AS height,
        |  CAST(1 AS INT) AS within_tol
        |FROM documents ORDER BY media_id""".stripMargin,
    "d_multimodal_gif" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(len(text) AS INT) AS l, CAST(len(text) % 256 AS INT) AS seed
        |  FROM documents)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |  CAST((l % 16) + 1 AS BIGINT) AS width,
        |  CAST((l % 12) + 1 AS BIGINT) AS height,
        |  CAST(list_sum(flatten(list_transform(range(0, (l % 16) + 1),
        |         x -> list_transform(range(0, (l % 12) + 1),
        |                y -> (seed + f + 31*x + 17*y) % 256)))) AS BIGINT) AS frame_sum
        |FROM p, UNNEST(range(0, (l % 4) + 2)) AS t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d_multimodal_video" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(f AS INT) AS frame_idx,
        |  CAST((len(text) % 16) + 1 AS BIGINT) AS width,
        |  CAST((len(text) % 12) + 1 AS BIGINT) AS height,
        |  CAST(1 AS INT) AS within_tol
        |FROM documents, UNNEST(range(0, (len(text) % 4) + 2)) AS t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d_multimodal_mp4" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(f AS INT) AS frame_idx,
        |  CAST((len(text) % 16) + 1 AS BIGINT) AS width,
        |  CAST((len(text) % 12) + 1 AS BIGINT) AS height,
        |  CAST(1 AS INT) AS within_tol
        |FROM documents, UNNEST(range(0, (len(text) % 4) + 2)) AS t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d_multimodal_mulaw" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST((len(text) % 96) + 4 AS BIGINT) AS n_samples,
        |  CAST(1 AS INT) AS within_tol
        |FROM documents ORDER BY media_id""".stripMargin,
    "d_multimodal_y4m" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(len(text) AS INT) AS l, CAST(len(text) % 256 AS INT) AS seed
        |  FROM documents)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |  CAST((l % 16) + 1 AS BIGINT) AS width,
        |  CAST((l % 12) + 1 AS BIGINT) AS height,
        |  CAST(list_sum(flatten(list_transform(range(0, (l % 16) + 1),
        |         x -> list_transform(range(0, (l % 12) + 1),
        |                y -> (seed + f + 31*x + 17*y) % 256)))) AS BIGINT) AS frame_sum
        |FROM p, UNNEST(range(0, (l % 4) + 2)) AS t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE (strlen(text) % 640) + 1 END AS INT) AS width,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE (strlen(text) % 480) + 1 END AS INT) AS height,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0
        |       ELSE list_sum(list_transform(string_split(text, ''), c -> ascii(c))) % 2147483647 END AS BIGINT) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
