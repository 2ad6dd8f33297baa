package graft.ops

import scala.util.chaining._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard pre-training pipeline
  * composed from the individual operators in this package, in the
  * order real pipelines run it —
  *
  *   1. quality filter      ([[TextAnalysis.qualityScoreOf]])
  *   2. exact dedup         ([[Dedup.exact]], keep min id per text)
  *   3. near-dup cluster drop ([[Dedup.jaccardPairsAdaptive]] →
  *      [[Dedup.dupClusters]] → [[Dedup.applyClusters]])
  *   4. test-set decontamination ([[Dedup.contamination]])
  *
  * Each stage narrows the previous stage's frame, so Catalyst sees one
  * composed plan — the document scan is shared, and every join in the
  * chain carries ids/hashes rather than text. [[funnel]] reports the
  * per-stage surviving-document counts (the first thing an operator of
  * a 100 TB curation run looks at); [[curate]] returns the curated
  * corpus itself.
  */
object Curation {

  /** Stage-frame checkpoint policy. FORCED by default (see the long
    * note in stageFrames: lazy stage checkpoints are raced by
    * concurrent broadcast-exchange threads and the per-block
    * getOrCompute lock serializes them pathologically — 353 s vs 14 s
    * at the 50k decade). Stage frames are materialized by ONE fused
    * (count, Σtokens) aggregate whose result doubles as the stage's
    * funnel row, so the funnel costs nothing extra and the Auto pair
    * router reuses the count. `spark.graft.curation.eagerStages=false`
    * restores fully lazy materialization (measurement/debug lever —
    * the raced schedule). */
  val EagerStagesKey = "spark.graft.curation.eagerStages"

  private def forcingOn(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(EagerStagesKey).forall(_.toBoolean)

  /** Materialize a (lazily checkpointed) stage frame with one fused
    * pass — scan → persist blocks → aggregate in a single job, no
    * isolated checkpoint job, no racing consumers — and return its
    * funnel row (n_docs, n_tokens). */
  private def forceCount(ck: DataFrame): (Long, Long) = {
    val r = ck.agg(count(lit(1)), sum(col(TokCol))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }


  /** How the near-dup stage finds its candidate pairs. */
  sealed trait PairSource
  object PairSource {
    /** Exact n-gram Jaccard (adaptive plain/prefix inverted-index
      * join): every pair at or above the threshold, recall 1.0. The
      * candidate volume is Σ_s C(df_s, 2), which grows super-linearly
      * on corpora whose shingle frequencies grow with corpus size
      * (measured: BASELINE.md §G) — at the 500k-doc decade the
      * self-join spills > 80 GB and aborts (§G14/§G15b). Exactness
      * matches the SQL oracle, so the oracle configs pin this
      * explicitly; it is no longer the facade default. */
    case object Exact extends PairSource
    /** MinHash+LSH candidates with exact verify — the measured-linear
      * scale path (BASELINE.md §G: exponent 0.33 vs 1.3 for Exact on a
      * fixed-vocab corpus). Banded recall < 1: a pair missed by every
      * band survives dedup, so funnel counts can only be ≥ the Exact
      * funnel's. Size bands for the threshold via the usual
      * (1/b)^(1/r) rule. */
    final case class MinHash(numHashes: Int = 96, bands: Int = 32) extends PairSource
    /** AUTO — the default: [[Exact]] while the pair stage's input
      * (the exact-dedup survivors) stays at or below
      * `maxExactSurvivors`, [[MinHash]] above it. The round-9 lesson
      * ([[Similarity.resolveSuperProbe]], §G11 addendum) applied to
      * the curation facade: the 100 TB-critical lever must be ON by
      * default, because a naked `Params()` caller at scale otherwise
      * inherits the plan that §G15b measured DYING at the 500k decade.
      * The survivor count is read off the stage-3 checkpoint the
      * funnel materializes anyway, so resolution costs one count of an
      * already-shared frame and nothing else. Below the survivor line
      * the pair build goes through [[Dedup.nearDupPairsAuto]]'s
      * measured candidate-volume guard (r13): Σ C(df, 2) ≤ 20M keeps
      * the plan — and therefore every result — bit-identical to
      * [[Exact]]; a hot-shingle corpus above it (where both exact
      * paths explode regardless of doc count) rides the banded path
      * instead. Callers who need unconditional exactness pin
      * [[Exact]], as every oracle config does. */
    final case class Auto(maxExactSurvivors: Long = AutoMinHashSurvivors,
                          numHashes: Int = 96, bands: Int = 32) extends PairSource
  }

  /** Survivor count at which [[PairSource.Auto]] switches stage 4 from
    * exact Jaccard to MinHash+LSH. 100 000 splits the measured §G
    * decades: 50k (Exact completes comfortably — §G3/§G15b) stays
    * exact-recall, 500k (Exact aborts with > 80 GB of spill — §G14)
    * routes to the measured-sub-linear banded path. */
  val AutoMinHashSurvivors = 100000L

  /** Effective pair source for a concrete survivor count.
    * `survivors` is by-name: [[PairSource.Exact]]/[[PairSource.MinHash]]
    * callers never pay the count. */
  def resolvePairSource(ps: PairSource, survivors: => Long): PairSource =
    ps match {
      case PairSource.Auto(maxExact, numHashes, bands) =>
        if (survivors <= maxExact) PairSource.Exact
        else PairSource.MinHash(numHashes, bands)
      case other => other
    }

  /** Tuning knobs, defaulted to the values the driver corpus is
    * exercised with. `minQuality` compares against the 4-dp-rounded
    * score so thresholds behave identically in the SQL oracle.
    *
    * `semanticIvfNlist`/`semanticIvfNprobe` route the semantic tail's
    * pair generation onto the IVF-bucketed path
    * ([[Similarity.ivfNearDupPairs]]) — candidates bounded by
    * Σ C(|cell|, 2) instead of hyperplane LSH's fixed fraction of ALL
    * pairs; this is THE knob a 100 TB semantic-dedup run sets, so it
    * defaults ON: `Some(0)` derives nlist from the survivor-embedding
    * count via [[Similarity.suggestNlist]] — the "grow nlist with
    * corpus size" rule as default behavior (the same default-flip as
    * `pairSource = Auto`: at the default 0.45 threshold the LSH source
    * degenerates to the quadratic brute-force blocks, exactly the plan
    * a naked caller must not inherit at scale). `None` opts back into
    * the recall-sized LSH source — exact on small corpora, the
    * debug/recall-study configuration. */
  case class Params(minQuality: Double = 0.15,
                    shingleK: Int = 3,
                    jaccardThreshold: Double = 0.5,
                    minSharedShingles: Int = 2,
                    semanticThreshold: Double = 0.45,
                    pairSource: PairSource = PairSource.Auto(),
                    semanticIvfNlist: Option[Int] = Some(0),
                    semanticIvfNprobe: Int = 2,
                    qualityKeepFrac: Option[Double] = None,
                    qualityGroupCol: String = "source",
                    exciseSpans: Boolean = false,
                    spanN: Int = 8,
                    /** TRAINED quality gate: a
                      * [[TextAnalysis.trainQualityClassifier]] weight
                      * frame replaces the heuristic score — stage 2
                      * keeps docs the classifier marks `keep` (σ > ½).
                      * Takes precedence over minQuality /
                      * qualityKeepFrac. */
                    classifierWeights: Option[DataFrame] = None,
                    classifierDim: Int = 4096,
                    /** Temperature mixture stage (6_mixture): after
                      * decontamination, re-balance the source mix via
                      * [[Sampling.temperatureSample]] at this α with
                      * `mixTargetFrac` of the CLEANED corpus as the
                      * expected kept volume — rates computed on the
                      * survivors, where mixture decisions belong
                      * (pre-clean shares overweight spammy sources).
                      * Groups by `qualityGroupCol`. */
                    sourceAlpha: Option[Double] = None,
                    mixTargetFrac: Double = 0.3,
                    /** Novelty gate (stage 1b): docs whose length-
                      * `noveltyN` gram set is mostly ALREADY in
                      * `noveltyGrams` (a [[TextAnalysis.spanGramStore]]
                      * of everything previously ingested) are dropped
                      * before any scoring or dedup runs — the re-crawl
                      * filter, positioned FIRST because it is the
                      * cheapest corpus-sized stage (8-byte gram hashes,
                      * no text shuffle) and every later stage's cost is
                      * proportional to what survives it. Keep iff
                      * novelty_e6 ≥ minNovelty ([[TextAnalysis.
                      * gramNovelty]] semantics: distinct grams, short
                      * docs collapse to one whole-text gram, so exact
                      * re-crawls score 0 and always drop). */
                    minNovelty: Option[Long] = None,
                    noveltyGrams: Option[DataFrame] = None,
                    noveltyN: Int = 8,
                    /** Lexicon policy gate (stage 1c): docs whose
                      * blockword hit rate exceeds `lexiconMaxHitRate`
                      * drop before any scoring or dedup —
                      * [[TextAnalysis.lexiconFlags]] semantics
                      * (token-exact matches, rate in hits per token).
                      * Positioned with the novelty gate because it is
                      * a one-scan literal predicate: everything it
                      * drops is cost the pair generators never pay. */
                    lexicon: Option[Seq[String]] = None,
                    lexiconMaxHitRate: Double = 0.0,
                    /** Entropy gate (stage 1d): docs whose unigram
                      * entropy ([[TextAnalysis.tokenEntropy]], 1e6-
                      * quantized nats) falls below this drop before
                      * scoring and dedup — the keyword-stuffing /
                      * template-page screen. Grouped with the 1-series
                      * gates because it is a pure per-row projection
                      * (no join inputs at all): everything it drops is
                      * cost the pair generators never pay. */
                    minEntropyE6: Option[Long] = None)

  private def stageFrames(corpus: DataFrame, benchmark: DataFrame, p: Params,
                          idCol: String, textCol: String)
      : (Seq[(String, DataFrame)], scala.collection.Map[String, (Long, Long)]) = {
    val force = forcingOn(corpus)
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    // checkpoint a STAGE frame; in forcing mode materialize it NOW via
    // the fused funnel aggregate and record the row
    def ckStage(name: String, df: DataFrame): DataFrame = {
      // lazy-safe: forceCount materializes the blocks IMMEDIATELY via
      // the fused funnel aggregate in forcing mode (the default) —
      // lazy + fused materializer, the cheapest race-free shape;
      // eagerStages=false restores the raced lazy schedule as a
      // measurement toggle (§G16 addendum 2)
      val ck = Checkpoints.shared(df, eager = false)
      if (force) counts(name) = forceCount(ck)
      ck
    }
    // Stage frames downstream of the verdict base are shared-
    // checkpointed: downstream stages and the funnel's per-stage counts
    // then share one materialization per stage instead of re-executing
    // every prefix plan (stage 5 would otherwise re-run
    // quality+dedup+pairs+closure from the scan). Real pipelines at
    // corpus scale do exactly this — stage outputs are materialized
    // datasets — and the blocks are freed by the ContextCleaner when
    // the frames go out of scope. By default the sharing is
    // executor-local (lost on executor failure); long multi-stage runs
    // on real clusters opt into reliable checkpoints with
    // spark.graft.checkpoint.reliable=true — see [[Checkpoints]].
    //
    // The per-doc token count is computed ONCE here (8 bytes carried
    // through every checkpoint) — the funnel's per-stage token sums
    // would otherwise re-run the tokenizer over every surviving stage,
    // ~4 extra full-text passes per funnel build. The token ARRAY is
    // projected as an attribute first so the count and the quality
    // score share a single tokenizer evaluation (HOF subtrees are not
    // CSE'd, and CollapseProject keeps non-cheap expressions bound).
    //
    // EVERY stage checkpoint in this facade is FORCED at creation
    // (r13). With lazy checkpoints, the first downstream action
    // materializes a stage frame from MULTIPLE plan sites at once —
    // e.g. exact-dedup's plan reads the quality frame on both the
    // probe side and the broadcast subquery, and funnel aggregates add
    // more — and concurrent broadcast-exchange threads then RACE to
    // compute the same lazy checkpoint blocks. The per-block
    // getOrCompute lock serializes them into a pathological schedule
    // (profiled at the 50k decade: a 1-task stage pinned 172 s behind
    // its 32-task sibling; the default funnel measured 214-353 s lazy
    // vs 10-30 s forced — and the same mechanism explains §G16's
    // 89-251 s "combined run" outliers). Forcing is BETTER than free
    // here: the materializing job's aggregate IS the stage's funnel
    // row (ckStage records it), so the funnel never re-touches a
    // forced stage and the Auto router reuses the exact-dedup count —
    // at corpus scale the funnel is a driver-side literal.
    //
    // r14 (the eager tax shrink — VERDICT r13 #1): the pipeline HEAD
    // is ONE fused "verdict base" checkpoint instead of a chain of
    // per-gate full-corpus checkpoints. Every 1-series gate (novelty /
    // lexicon / entropy) is a PER-DOC-independent predicate, so its
    // verdict computed over the full corpus equals its verdict
    // computed over the previous gate's survivors — the sequential
    // funnel rows are then prefix-conjunction counts over one frame.
    // The base carries (original cols, token count, quality score, one
    // boolean per gate) and is materialized by a single aggregate that
    // doubles as the 1_total + per-gate + (simple-arm) 2_quality
    // funnel rows; gate stages and the simple quality stage become
    // filters over the materialized blocks — race-free (the §G16
    // getOrCompute race needs LAZY blocks) and zero extra jobs. r13
    // paid one isolated job + one full-corpus checkpoint per enabled
    // gate plus a separate full-tokenize 1_total aggregate.
    val withTok = corpus
      .withColumn("__toks", Dedup.tokens(col(textCol)))
      .withColumn(TokCol, size(col("__toks")).cast("long"))
      .withColumn("__q", round(
        TextAnalysis.qualityScoreOf(col("__toks"), col(textCol)), 4))
      .drop("__toks")
    // Per-gate verdict frames, one boolean per doc keyed by id. LEFT
    // joins below: a doc ABSENT from a verdict frame (a zero-gram doc
    // never emitted by gramNovelty's explode) fails its gate —
    // matching the r13 semi-join semantics exactly.
    val gates: Seq[(String, DataFrame)] = {
      val nov = (p.minNovelty, p.noveltyGrams) match {
        case (Some(minNov), Some(grams)) => Seq("1b_novelty" ->
          // novelty (1b): membership probe against the seen-gram store
          // — the re-crawl filter; the probe shuffles 8-byte hashes only
          TextAnalysis.gramNovelty(withTok, grams, p.noveltyN, idCol, textCol)
            .select(col(idCol), (col("novelty_e6") >= minNov).as("__pass")))
        case (None, None) => Nil
        case _ => throw new IllegalArgumentException(
          "minNovelty and noveltyGrams must be set together (the gate needs both " +
            "a threshold and a seen-gram store)")
      }
      // lexicon (1c): token-exact blockword hit rate, one codegen'd scan
      val lex = p.lexicon.toSeq.map(l => "1c_lexicon" ->
        TextAnalysis.lexiconFlags(withTok, l, p.lexiconMaxHitRate, idCol, textCol)
          .select(col(idCol), (!col("flagged")).as("__pass")))
      // entropy (1d): per-doc unigram entropy — computed once into the
      // base (a pushed filter would re-derive the run-length chain a
      // constant number of times per row; measured 4× at sf0.1)
      val ent = p.minEntropyE6.toSeq.map(minEnt => "1d_entropy" ->
        TextAnalysis.tokenEntropy(withTok, idCol, textCol)
          .select(col(idCol), (col("entropy_e6") >= minEnt).as("__pass")))
      nov ++ lex ++ ent
    }
    val basePlan = gates.zipWithIndex.foldLeft(withTok) {
      case (acc, ((_, gf), i)) =>
        acc.join(gf.withColumnRenamed("__pass", s"__p$i"), Seq(idCol), "left")
          .withColumn(s"__p$i", coalesce(col(s"__p$i"), lit(false)))
    }
    val base = Checkpoints.shared(basePlan, eager = false)
    // ^ lazy-safe: the fused aggregate below is the immediate
    //   single-site materializer (forcing mode); see ckStage's note
    // gate i's survivors = docs passing gates 0..i (prefix conjunction)
    def passUpTo(i: Int): Column = (0 to i).map(j => col(s"__p$j")).reduce(_ && _)
    val allPass: Option[Column] =
      if (gates.isEmpty) None else Some(passUpTo(gates.size - 1))
    // the simple quality arm is a pure per-row predicate over the
    // stored score — it needs no checkpoint of its own, so its funnel
    // row fuses into the base aggregate too
    val simpleQuality = p.classifierWeights.isEmpty && p.qualityKeepFrac.isEmpty
    if (force) {
      val qPass = (allPass.getOrElse(lit(true))) && col("__q") >= p.minQuality
      val aggs: Seq[Column] =
        Seq(count(lit(1)), sum(col(TokCol))) ++
          gates.indices.flatMap(i => Seq(
            count(when(passUpTo(i), 1)), sum(when(passUpTo(i), col(TokCol))))) ++
          (if (simpleQuality) Seq(
            count(when(qPass, 1)), sum(when(qPass, col(TokCol)))) else Nil)
      val r = base.agg(aggs.head, aggs.tail: _*).head()
      def cell(k: Int): (Long, Long) =
        (r.getLong(k), if (r.isNullAt(k + 1)) 0L else r.getLong(k + 1))
      counts("1_total") = cell(0)
      gates.zipWithIndex.foreach { case ((name, _), i) =>
        counts(name) = cell(2 + 2 * i)
      }
      if (simpleQuality) counts("2_quality") = cell(2 + 2 * gates.size)
    }
    val entGated = allPass.map(base.where).getOrElse(base)
    // Quality gate: absolute threshold by default; `qualityKeepFrac`
    // switches to [[TextAnalysis.qualityCalibration]] semantics — the
    // top fraction of EVERY `qualityGroupCol` group survives, so a
    // low-scoring domain is thinned, not wiped (the cutoff frame is
    // |groups| rows and broadcasts; the score pass is shared with it).
    // All arms read the MATERIALIZED base blocks, so multi-site
    // consumption (classifier feature build + join left; cuts
    // aggregate + join left; exact-dedup probe + broadcast) re-reads
    // blocks instead of racing a lazy checkpoint or re-tokenizing.
    val quality0 = p.classifierWeights match {
      case Some(w) =>
        // trained gate: keep docs the classifier scores σ > ½ — the
        // weight frame is dim-bounded and broadcasts inside
        // classifierScore; the semi-join key is the id only
        entGated.join(
          TextAnalysis.classifierScore(entGated, w, p.classifierDim, idCol, textCol)
            .where(col("keep")).select(idCol),
          Seq(idCol), "left_semi")
      case None => p.qualityKeepFrac match {
      case None => entGated.where(col("__q") >= p.minQuality)
      case Some(f) =>
        require(f > 0.0 && f <= 1.0, s"qualityKeepFrac must be in (0, 1], got $f")
        val cuts = entGated.groupBy(col(p.qualityGroupCol).as("__grp"))
          .agg(expr(s"percentile(__q, ${1.0 - f})").as("__cut"))
        // null-safe: NULL-group docs must face their cutoff, not vanish
        entGated.join(cuts, col(p.qualityGroupCol) <=> col("__grp"))
          .where(col("__q") >= col("__cut"))
    }} // restore the original column order / drop the internals
    val qualityCols =
      quality0.select(withTok.columns.filterNot(_ == "__q").map(col).toSeq: _*)
    // simple arm: a filter over materialized blocks needs no second
    // full-corpus checkpoint (its funnel row was fused above); the
    // classifier/keepFrac arms keep theirs — their survivors are a
    // JOIN whose re-execution per downstream site would re-score
    val quality =
      if (simpleQuality) qualityCols
      else qualityCols.pipe(ckStage("2_quality", _))
    val exact = quality.join(
      Dedup.exact(quality, idCol, textCol).select(col("keep_id").as(idCol)), idCol)
      .pipe(ckStage("3_exact_dedup", _))
    // Auto resolution counts `exact` — a frame that is already
    // sharedCheckpoint()'d and consumed by stage 4 and the funnel, so
    // the count materializes work every downstream consumer reuses.
    // Explicit Exact/MinHash configs never count (by-name argument).
    // When Auto stays under the survivor line it STILL routes through
    // the measured candidate-volume guard (Dedup.nearDupPairsAuto):
    // survivor counts say nothing about hot-shingle corpora, where both
    // exact pair paths explode long before 100k docs (r13, measured at
    // the 50k decade — 150 s+ exact vs 7 s banded at the defaults).
    // Explicit PairSource.Exact remains unconditionally exact — that is
    // what the oracle configs pin.
    val pairs = p.pairSource match {
      case PairSource.Exact =>
        Dedup.jaccardPairsAdaptive(exact, p.shingleK, p.jaccardThreshold, idCol, textCol)
      case PairSource.MinHash(numHashes, bands) =>
        Dedup.minhashLshPairs(exact, p.shingleK, numHashes, bands,
          p.jaccardThreshold, idCol, textCol)
      case PairSource.Auto(maxExact, numHashes, bands) =>
        if (counts.get("3_exact_dedup").map(_._1).getOrElse(exact.count()) > maxExact)
          Dedup.minhashLshPairs(exact, p.shingleK, numHashes, bands,
            p.jaccardThreshold, idCol, textCol)
        else
          Dedup.nearDupPairsAuto(exact, p.shingleK, p.jaccardThreshold,
            numHashes = numHashes, bands = bands, idCol = idCol, textCol = textCol)
    }
    val nearDup = Dedup.applyClusters(exact, Dedup.dupClusters(pairs), idCol)
      .pipe(ckStage("4_near_dup", _))
    // Optional exact-substring excision between near-dup and decontam
    // (the ExactSubstr position in real pipelines): document COUNT is
    // unchanged — text is rewritten, fully-excised docs become empty —
    // so the funnel's token column shows what the stage actually cut.
    // Decontamination then sees the rewritten text.
    val afterSpans =
      if (!p.exciseSpans) nearDup
      else {
        val ex = TextAnalysis.spanDedup(nearDup, p.spanN, idCol, textCol)
          .select(col(idCol), col("text_dedup"),
            (col("n_tokens") - col("n_removed")).as("__newtok"))
        nearDup.join(ex, idCol)
          .select(nearDup.columns.map {
            case c if c == textCol => col("text_dedup").as(textCol)
            case c if c == TokCol  => col("__newtok").as(TokCol)
            case c                 => col(c)
          }.toSeq: _*)
          .pipe(ckStage("4b_span_excise", _))
      }
    val clean = afterSpans.join(
      Dedup.contamination(afterSpans, benchmark, p.shingleK, p.minSharedShingles,
        idCol, textCol).select(idCol),
      Seq(idCol), "left_anti")
    // optional temperature-mix tail: rates derive from the CLEANED
    // survivors (the corpus a mixture decision should see), then the
    // deterministic hash gate — clean is shared so the rate aggregate
    // and the gated output reuse one materialization
    val mixed = p.sourceAlpha.map { a =>
      val shared = ckStage("5_decontaminated", clean)
      (shared, Sampling.temperatureSample(shared, a, p.mixTargetFrac,
        p.qualityGroupCol, idCol).drop("rate_e6"))
    }
    // gate/total stage frames are filters over the materialized base —
    // funnelOf reads their rows from `counts` (literals in forcing
    // mode); auditOf anti-joins their id columns off the blocks
    val dropInternal = "__q" +: gates.indices.map(i => s"__p$i")
    (Seq("1_total" -> base.drop(dropInternal: _*)) ++
      gates.zipWithIndex.map { case ((name, _), i) =>
        name -> base.where(passUpTo(i)).drop(dropInternal: _*)
      } ++
      Seq(
      "2_quality" -> quality,
      "3_exact_dedup" -> exact,
      "4_near_dup" -> nearDup) ++
      (if (p.exciseSpans) Seq("4b_span_excise" -> afterSpans) else Nil) ++
      (mixed match {
        case None => Seq("5_decontaminated" -> clean)
        case Some((shared, m)) =>
          Seq("5_decontaminated" -> shared, "6_mixture" -> m)
      })) -> counts
  }

  /** Internal carried-token-count column (see [[stageFrames]]) —
    * package-visible so [[TrainingRun]] can reuse the already-computed
    * per-doc count instead of re-tokenizing the curated corpus. */
  private[ops] val TokCol = "__n_toks"

  /** The curated corpus: every stage applied, original columns kept.
    *
    * CONTRACT: `idCol` must be UNIQUE per corpus row. The id is the
    * join key for every per-doc verdict (the fused verdict base LEFT
    * JOINS per-row gate frames — lexicon/entropy emit one row per
    * input row, so a repeated id multiplies base rows, inflates
    * 1_total/funnel counts, and duplicates docs downstream) and the
    * identity key for dedup. Corpora with repeated ids must be
    * re-keyed first (`monotonically_increasing_id`, or a
    * (source, id) composite) — the engine's own tables and every
    * ingest path emit unique doc_ids. */
  def curate(corpus: DataFrame, benchmark: DataFrame, p: Params = Params(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    stageFrames(corpus, benchmark, p, idCol, textCol)._1.last._2.drop(TokCol)

  /** [[curate]] KEEPING the carried [[TokCol]] token count — for
    * package consumers whose next step is a token aggregate
    * ([[TrainingRun.summary]]): re-deriving the count would re-scan and
    * re-tokenize the full surviving text, the exact pass the carried
    * 8-byte column exists to avoid. */
  private[ops] def curateWithTokenCounts(corpus: DataFrame, benchmark: DataFrame,
                                         p: Params = Params(),
                                         idCol: String = "doc_id",
                                         textCol: String = "text"): DataFrame =
    stageFrames(corpus, benchmark, p, idCol, textCol)._1.last._2

  /** Per-stage survivor counts as (stage, n_docs, n_tokens) rows —
    * the curation funnel. Token counts matter as much as doc counts to
    * an operator (dropping 1% of docs that hold 30% of tokens is a
    * different decision). Each stage is one aggregate over its composed
    * plan, unioned (not cross-joined) into a single tiny result. */
  def funnel(corpus: DataFrame, benchmark: DataFrame, p: Params = Params(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (st, counts) = stageFrames(corpus, benchmark, p, idCol, textCol)
    funnelOf(st, counts)
  }

  /** [[stageFrames]] with the terminal frame checkpointed — the ONE
    * place holding the invariant "stageFrames leaves the terminal
    * frame un-checkpointed because it is normally terminal;
    * multi-consumer callers share one materialization". Every
    * multi-output entry point ([[run]], [[runWithAudit]],
    * [[runWithSemantic]], [[audit]]) goes through here. */
  private def stageFramesShared(corpus: DataFrame, benchmark: DataFrame,
                                p: Params, idCol: String, textCol: String)
      : (Seq[(String, DataFrame)], scala.collection.Map[String, (Long, Long)]) = {
    val (st0, counts0) = stageFrames(corpus, benchmark, p, idCol, textCol)
    val name = st0.last._1
    if (counts0.contains(name)) (st0, counts0) // mixed tail: already forced
    else {
      val ck = Checkpoints.shared(st0.last._2, eager = false) // lazy-safe: forced below by forceCount
      val counts =
        if (forcingOn(ck)) counts0.toMap + (name -> forceCount(ck)) else counts0
      (st0.init :+ (name -> ck), counts)
    }
  }

  /** The attribution frame over already-built stage frames: each
    * consecutive pair contributes its losers via an ids-only
    * anti-join, the terminal frame its keepers. */
  private def auditOf(st: Seq[(String, DataFrame)], idCol: String): DataFrame = {
    val dropped = st.zip(st.tail).map { case ((_, prev), (name, cur)) =>
      prev.select(col(idCol)).join(cur.select(col(idCol)), Seq(idCol), "left_anti")
        .withColumn("dropped_at", lit(name))
    }
    val kept = st.last._2.select(col(idCol)).withColumn("dropped_at", lit("kept"))
    (dropped :+ kept).reduce(_ unionByName _)
  }

  /** Both outputs of one pipeline build: (curated corpus, funnel).
    * Callers wanting both — the normal operational shape — should use
    * this rather than [[curate]] + [[funnel]], which would each build
    * their own stage frames and execute the full pipeline twice. */
  def run(corpus: DataFrame, benchmark: DataFrame, p: Params = Params(),
          idCol: String = "doc_id", textCol: String = "text"): (DataFrame, DataFrame) = {
    val (st, counts) = stageFramesShared(corpus, benchmark, p, idCol, textCol)
    (st.last._2.drop(TokCol), funnelOf(st, counts))
  }

  /** [[run]] plus the per-doc attribution frame, all from ONE pipeline
    * build: (curated corpus, funnel, audit). The operational shape for
    * "curate and explain the drops" — calling [[run]] then [[audit]]
    * separately would execute the full multi-stage pipeline twice. */
  def runWithAudit(corpus: DataFrame, benchmark: DataFrame, p: Params = Params(),
                   idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    val (st, counts) = stageFramesShared(corpus, benchmark, p, idCol, textCol)
    (st.last._2.drop(TokCol), funnelOf(st, counts), auditOf(st, idCol))
  }

  /** Per-document drop ATTRIBUTION — "which stage dropped my doc", the
    * audit trail the funnel's aggregate counts cannot answer. One row
    * per input document: (id, dropped_at), where dropped_at is the
    * name of the FIRST stage the document is absent from, or 'kept'.
    * Each consecutive frame pair contributes its losers via an
    * ids-only anti-join, so nothing corpus-wide shuffles beyond the
    * ids. Works under any Params — optional stages (novelty, entropy,
    * lexicon, mixture) attribute under their own stage names. Callers
    * who ALSO want the corpus or funnel should use [[runWithAudit]],
    * which shares one pipeline build across all three outputs. */
  def audit(corpus: DataFrame, benchmark: DataFrame, p: Params = Params(),
            idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    auditOf(stageFramesShared(corpus, benchmark, p, idCol, textCol)._1, idCol)

  /** [[run]] plus a SEMANTIC dedup tail (stage 6): after text-level
    * curation, documents whose EMBEDDINGS cluster at cosine ≥
    * `p.semanticThreshold` keep only the min-id member — the hybrid
    * text+vector pipeline (SemDeDup after exact/near-dup, the order
    * real pipelines use, since semantic dedup is the most expensive
    * and should see the smallest corpus). `embeddings` is joined on
    * the id, so only SURVIVORS' vectors enter the pair generator;
    * documents without an embedding row pass through unjudged (they
    * can never appear in a pair). Stage 6's pair source follows
    * `p.semanticIvfNlist`: the IVF-bucketed path when set — the scale
    * configuration and the default, with `Some(0)` growing nlist with
    * the survivor count — recall-sized hyperplane LSH on `None`. */
  /** `benchEmb`: optional EMBEDDING-space decontamination tail (stage
    * 7) — after the semantic-dedup stage, survivors whose aligned
    * embedding reaches cosine `semanticThreshold` to ANY vector in
    * this frame are dropped ([[Similarity.semanticDecontam]]: the
    * benchmark trains the index, survivors stream through one probe
    * pass). This is the gate for PARAPHRASED eval items that the
    * lexical stage-5 decontamination (shared shingles) cannot see.
    * Positioned last, where the corpus is smallest — the same argument
    * that puts semantic dedup after the text stages. Ids shared
    * between the corpus embedding space and `benchEmb` are treated as
    * the same item and never pair (the batch op's convention);
    * survivors WITHOUT an embedding pass unjudged. The index sizing
    * follows the semantic tail's knobs (`semanticIvfNlist` — auto ∝
    * the BENCHMARK count when 0 — and `semanticIvfNprobe`). */
  def runWithSemantic(corpus: DataFrame, benchmark: DataFrame, embeddings: DataFrame,
                      p: Params = Params(),
                      benchEmb: Option[DataFrame] = None,
                      idCol: String = "doc_id", textCol: String = "text",
                      embIdCol: String = "vec_id", vecCol: String = "embedding",
                      vecDims: Int = 64): (DataFrame, DataFrame) = {
    val (st0, counts) = stageFramesShared(corpus, benchmark, p, idCol, textCol)
    // three consumers reuse the (checkpointed) terminal text stage
    val clean = st0.last._2
    val survivorEmb = embeddings
      .select(col(embIdCol).as(idCol), col(vecCol))
      .join(clean.select(idCol), Seq(idCol))
    val losers = Similarity.semanticDedup(survivorEmb, p.semanticThreshold, idCol, vecCol,
        dims = vecDims, ivfNlist = p.semanticIvfNlist, ivfNprobe = p.semanticIvfNprobe)
      .where(!col("kept")).select(idCol)
    val semantic = clean.join(losers, Seq(idCol), "left_anti")
    val stSem = st0 :+ ("6_semantic" -> semantic)
    benchEmb match {
      case None => (semantic.drop(TokCol), funnelOf(stSem, counts))
      case Some(be) =>
        // decontam gate + funnel share the semantic frame: forced like
        // every stage checkpoint, with its funnel row recorded
        val sem = Checkpoints.shared(semantic, eager = false) // lazy-safe: forced below by forceCount
        val counts2 =
          if (forcingOn(sem)) counts.toMap + ("6_semantic" -> forceCount(sem))
          else counts
        val semEmb = embeddings
          .select(col(embIdCol).as(idCol), col(vecCol))
          .join(sem.select(idCol), Seq(idCol))
        val decLosers = Similarity.semanticDecontam(semEmb,
            be.select(col(embIdCol).as(idCol), col(vecCol)),
            p.semanticThreshold, nlist = p.semanticIvfNlist.getOrElse(0),
            nprobe = p.semanticIvfNprobe, idCol = idCol, vecCol = vecCol)
          .where(!col("kept")).select(idCol)
        val dec = sem.join(decLosers, Seq(idCol), "left_anti")
        val st = stSem.init :+ ("6_semantic" -> sem) :+ ("7_semdecontam" -> dec)
        (dec.drop(TokCol), funnelOf(st, counts2))
    }
  }

  /** The funnel from the stage list: stages whose (n_docs, n_tokens)
    * were already captured by their forcing aggregate become
    * driver-side LITERAL rows (no job at all — at 100 TB the funnel of
    * a forced pipeline costs nothing); the rest (the un-checkpointed
    * 1_total head and lazy terminals) aggregate as before, each fused
    * with its frame's first materialization. */
  private def funnelOf(st: Seq[(String, DataFrame)],
                       counts: scala.collection.Map[String, (Long, Long)]
                         = Map.empty): DataFrame = {
    val session = st.head._2.sparkSession
    import session.implicits._
    val litRows = st.collect { case (name, _) if counts.contains(name) =>
      val (d, t) = counts(name); (name, d, t) } match {
      case rows if rows.isEmpty => Nil
      case rows => Seq(rows.toDF("stage", "n_docs", "n_tokens"))
    }
    val aggRows = st.collect { case (name, df) if !counts.contains(name) =>
      df.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col(TokCol)), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    }
    (litRows ++ aggRows).reduce(_ unionByName _).orderBy("stage")
  }
}
