package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Reproducibility
  * beats entropy here: a corpus sampled by content/id hash yields the
  * same subset on every engine, every rerun, every cluster size — which
  * is what makes ablations and incremental rebuilds comparable. (Spark's
  * `df.sample` is seed-stable only per partitioning; a hash predicate is
  * stable, full stop.)
  *
  * Scale: [[hashSample]] is a pure predicate — no shuffle, no state;
  * Catalyst pushes it to the scan. [[stratifiedSample]] is one window
  * shuffle on the stratum key.
  */
object Sampling {

  /** Sampling buckets: a prime so bucket occupancy is unbiased even
    * when ids share a stride (sequential ids, sharded ids). */
  val Buckets = 97

  /** Deterministic hash of a non-negative id into [0, m): multiplicative
    * mixing in plain 64-bit integer arithmetic — no engine-specific hash
    * function, so any SQL engine reproduces the selection bit-for-bit.
    * The first mod keeps the product inside Int64 for ids up to 9.2e18
    * (ANSI-safe); the SECOND mod-P reduction before the final modulus is
    * load-bearing: without it, `(id·A) mod m` is the identity on id mod m
    * whenever A ≡ 1 (mod m) — and 2654435761 ≡ 1 mod every power of two
    * up to 16 — and a mere permutation of id mod m for any m coprime to
    * A, so strided ids would clump into few buckets. Reducing mod the
    * prime P = 1e9+7 first decorrelates all small-modulus structure. */
  def detHashMod(id: Column, m: Long): Column =
    pmod(pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(1000000007L)), lit(m))

  /** [[detHashMod]] into the sampling bucket space [0, [[Buckets]]). */
  def detHash(id: Column): Column = detHashMod(id, Buckets.toLong)

  /** Keep rows whose id hashes into the first `keepBuckets` of
    * [[Buckets]] (keepBuckets/97 ≈ the sampling rate). Deterministic,
    * shuffle-free, pushdown-friendly. */
  def hashSample(df: DataFrame, keepBuckets: Int, idCol: String = "doc_id"): DataFrame =
    df.where(detHash(col(idCol)) < keepBuckets)

  /** Mixture sampling: per-group keep fractions — how training mixes
    * are assembled ("keep 100% of books, 30% of web, 5% of logs").
    * Each group's fraction is mapped to a bucket threshold
    * ceil(f · [[Buckets]]), so the realized rate is the closest
    * achievable ≥ f in 1/97 steps and the selection stays the same
    * deterministic hash predicate as [[hashSample]] — shuffle-free,
    * pushdown-friendly, and a group's sample is a superset of any
    * smaller fraction's (nested samples for ablation ladders). Groups
    * absent from `fractions` get `defaultFraction` (0 = drop). */
  def mixtureSample(df: DataFrame, groupCol: String, fractions: Map[String, Double],
                    defaultFraction: Double = 0.0,
                    idCol: String = "doc_id"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    def buckets(f: Double): Int = math.ceil(f * Buckets).toInt
    val threshold = fractions.foldLeft(lit(buckets(defaultFraction))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(buckets(f))).otherwise(acc)
    }
    df.where(detHash(col(idCol)) < threshold)
  }

  /** Token-budget mixture PLANNING — the step before [[mixtureSample]]:
    * given per-group target shares (integer percents) and a token
    * budget expressed as a percent of the corpus, compute each group's
    * keep fraction `rate = min(1, group_budget / group_tokens)`. The
    * output is groups-sized (a handful of rows), so the global-total
    * window runs over a frame that fits in one task no matter the
    * corpus size; everything upstream is one map-side-combined count.
    *
    * All arithmetic is exact integer until ONE final double division
    * (then a 6 dp round), so any engine reproduces the rates
    * bit-for-bit. Groups absent from `sharesPct` get `defaultPct`. */
  def mixturePlan(docs: DataFrame, sharesPct: Map[String, Int], defaultPct: Int,
                  groupCol: String = "source", textCol: String = "text",
                  budgetPct: Int = 50): DataFrame = {
    require((sharesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "shares must be integer percents in [0, 100]")
    require(budgetPct >= 0 && budgetPct <= 100, "budgetPct must be in [0, 100]")
    val perGroup = docs
      .select(col(groupCol).as("grp"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n"))
      .groupBy("grp").agg(sum(col("n")).as("n_tokens"))
    val pct = sharesPct.foldLeft(lit(defaultPct.toLong)) {
      case (acc, (g, p)) => when(col("grp") === g, lit(p.toLong)).otherwise(acc)
    }
    perGroup
      .withColumn("total", sum(col("n_tokens")).over(Window.partitionBy()))
      .select(col("grp").as(groupCol), col("n_tokens"), pct.as("share_pct"),
        // a group whose docs all tokenize empty would divide 0-or-x by 0
        // (NaN/Infinity) — define its rate as 1.0 (keep all of nothing)
        // instead of leaning on NaN ordering inside least()
        when(col("n_tokens") === 0L, lit(1.0)).otherwise(
          round(least(lit(1.0),
            (col("total") * pct * lit(budgetPct.toLong)).cast("double") /
              (lit(10000.0) * col("n_tokens").cast("double"))), 6)).as("rate"))
  }

  /** Up to `k` rows per stratum, chosen pseudo-randomly but
    * deterministically: rank within the stratum by (hash, id) and keep
    * the first k. The id tie-break makes the selection total-order
    * stable. Emits the stratum rank as `rk`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(detHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .withColumn("rk", col("rk").cast("long"))
  }

  /** Deterministic epoch shuffle: a seeded, engine-reproducible
    * pseudo-random permutation of the corpus — the training-order
    * primitive ("shuffle differently every epoch, identically on every
    * re-run of the same epoch"). Returns (idCol, pos) with pos a
    * bijection onto [0, n).
    *
    * The permutation sorts by (bucket hash, tie hash, id), both hashes
    * seeded [[detHashMod]] mixes — plain integer arithmetic any engine
    * reproduces. Positions come from the [[Packing]] two-level prefix
    * pattern, NOT a global window: per-bucket counts prefix-sum over
    * the `buckets`-row frame (the only serial window), offsets
    * broadcast back, ranks compute inside bucket partitions. */
  def epochShuffle(docs: DataFrame, seed: Long = 0L, buckets: Long = 8192L,
                   idCol: String = "doc_id"): DataFrame = {
    require(seed >= 0 && seed < 1000000006L, s"seed must be in [0, 1e9+5], got $seed")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import graft.ops.Checkpoints.SharedOps
    // reduce the id first so (idm + seed) stays far from Int64 overflow
    // under ANSI arithmetic (detHashMod's own contract)
    val idm = pmod(col(idCol), lit(1000000007L))
    val base = docs.select(col(idCol),
        detHashMod(idm + lit(seed), buckets).as("__b"),
        detHashMod(idm + lit(seed + 1L), 1000000007L).as("__k"))
      .sharedCheckpoint(eager = true) // bucket counts + the final rank pass
    val counts = base.groupBy("__b").agg(count(lit(1)).as("__n"))
    val wB = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum("__n").over(wB), lit(0L)))
      .drop("__n")
    val wL = Window.partitionBy("__b").orderBy(col("__k").asc, col(idCol).asc)
    base.join(broadcast(offs), "__b")
      .withColumn("pos", col("__off") + row_number().over(wL) - 1)
      .select(col(idCol), col("pos").cast("long").as("pos"))
  }

  /** Curriculum ordering (Bengio et al. 2009, "Curriculum Learning"):
    * a dense position over (difficulty asc, seeded shuffle, id) — easy
    * documents first, and WITHIN a difficulty level a deterministic
    * pseudo-random permutation (equal-difficulty docs must not follow
    * crawl order, for the same reason [[epochShuffle]] exists at all).
    * Returns (idCol, pos) with pos a bijection onto [0, n); rerunning
    * a (docs, diffCol, seed) tuple reproduces it bit-for-bit.
    *
    * `diffCol` is any integral difficulty signal — token count (the
    * classic short-to-long LM curriculum), a negated quality score, a
    * perplexity bucket.
    *
    * Scale: a THREE-level prefix sum — the [[epochShuffle]] pattern
    * with a difficulty level on top. Per-(difficulty, bucket) counts
    * prefix-sum WITHIN each difficulty (a difficulty-partitioned
    * window — distributed), per-difficulty totals prefix-sum over the
    * |distinct difficulty| frame (the only serial window — token
    * counts, score quantiles and bucket ids are all
    * lexicon-/resolution-bounded), offsets join back (the per-level
    * frame broadcasts; the (difficulty, bucket) frame hash-joins at
    * any size), ranks compute inside (difficulty, bucket) partitions.
    * A difficulty level with billions of docs — the 100 TB norm, most
    * docs share a few hundred distinct lengths — splits across
    * `buckets` sub-partitions instead of serializing into one sort. */
  def curriculumOrder(docs: DataFrame, diffCol: String, seed: Long = 0L,
                      buckets: Long = 1024L, idCol: String = "doc_id"): DataFrame = {
    require(seed >= 0 && seed < 1000000006L, s"seed must be in [0, 1e9+5], got $seed")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import graft.ops.Checkpoints.SharedOps
    val idm = pmod(col(idCol), lit(1000000007L))
    // NULL difficulty would silently vanish at the offset join (null
    // keys never match) and break the bijection — refuse loudly at the
    // row, with the fix named
    val diff = when(col(diffCol).isNotNull, col(diffCol).cast("long"))
      .otherwise(raise_error(lit(
        s"curriculumOrder: NULL $diffCol — coalesce or filter the difficulty first")))
    val base = docs.select(col(idCol), diff.as("__d"),
        detHashMod(idm + lit(seed), buckets).as("__b"),
        detHashMod(idm + lit(seed + 1L), 1000000007L).as("__k"))
      .sharedCheckpoint(eager = true) // the count pass + the final rank pass
    val cntDb = base.groupBy("__d", "__b").agg(count(lit(1)).as("__n"))
      .sharedCheckpoint(eager = true) // within-difficulty offsets + per-level totals
    // offset of bucket b within its difficulty level: PARTITIONED
    // window — distributed, never a global sort
    val wInD = Window.partitionBy("__d").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offB = cntDb
      .withColumn("__offb", coalesce(sum("__n").over(wInD), lit(0L)))
      .drop("__n")
    // offset of the difficulty level itself: the only serial window,
    // over the |distinct difficulty| frame
    val cntD = cntDb.groupBy("__d").agg(sum("__n").as("__n"))
    val wD = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, -1)
    val offD = cntD
      .withColumn("__offd", coalesce(sum("__n").over(wD), lit(0L)))
      .drop("__n")
    val wL = Window.partitionBy("__d", "__b").orderBy(col("__k").asc, col(idCol).asc)
    base.join(offB, Seq("__d", "__b"))
      .join(broadcast(offD), "__d")
      .withColumn("pos", col("__offd") + col("__offb") + row_number().over(wL) - 1)
      .select(col(idCol), col("pos").cast("long").as("pos"))
  }

  /** Hashed-ngram (id, bucket) frame shared by the DSIR estimators:
    * unigrams plus word bigrams (the DSIR feature set), [[TextAnalysis
    * .polyHash]]'d into [0, nBuckets) so any engine replays the
    * bucketing. Short docs follow [[TextAnalysis.ngramsAll]]'s
    * collapse (a < 2-token doc contributes its whole text as the one
    * bigram), so the SQL twin stays a CASE expression. */
  private def gramBuckets(docs: DataFrame, nBuckets: Int,
                          idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__w"))
      .select(col(idCol),
        explode(graft.functions.gram_buckets(col("__w"), nBuckets)).as("bucket"))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how target-like its hashed-ngram distribution is —
    * log p̂(d) − log q̂(d) under bag-of-hashed-ngrams multinomials with
    * add-α smoothing, p̂ fit on a small high-quality TARGET corpus and
    * q̂ on the raw corpus itself. The standard pretraining
    * data-selection move: fit on the target set, weight the raw crawl,
    * resample ([[importanceSelect]]).
    *
    * Returns (idCol, n_grams, logratio) per raw doc — logratio is the
    * exact integer sum of 1e-6-quantized per-bucket log-ratios (the
    * [[TextAnalysis.unigramLogProb]] pattern: order-independent, so
    * engines agree bit-for-bit), rounded to 4 dp.
    *
    * Scale: two SCANS and no wide state. Pass 1 aggregates the two
    * bucket marginals — map-side combine means the shuffle is
    * nBuckets × partitions rows — and the ≤ nBuckets λ values come to
    * the driver (the capped-lexicon pattern) where the quantized
    * log-ratio is computed bit-identically to the SQL oracle
    * (Math.log IS Spark's log; HALF_UP IS Spark's round). Pass 2
    * scores: the λ array rides the plan as a literal (the bloom-filter
    * pattern), each doc's grams look it up in place, and the only
    * shuffle is the map-side-combined per-DOC sum — no (id, bucket)
    * aggregate, no join, nothing keyed wider than the corpus's ids.
    * Text never moves in either pass. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        nBuckets: Int = 4096, alpha: Double = 1.0,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    graft.functions.ensureRegistered(raw.sparkSession)
    val cq = bucketMarginal(raw, nBuckets, idCol, textCol)
    val cp = bucketMarginal(target, nBuckets, idCol, textCol)
    val lam = Array.tabulate(nBuckets)(b =>
      lamE6Of(cp.getOrElse(b, 0L), cq.getOrElse(b, 0L),
        cp.values.sum, cq.values.sum, nBuckets, alpha))
    scoreWith(raw, lam, nBuckets, idCol, textCol)
  }

  /** One corpus's hashed-gram bucket counts, to the driver — ≤ nBuckets
    * rows by construction (the whitelisted bounded-collect shape). */
  private def bucketMarginal(docs: DataFrame, nBuckets: Int,
                             idCol: String, textCol: String): Map[Int, Long] =
    gramBuckets(docs, nBuckets, idCol, textCol)
      .groupBy("bucket").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** The 1e-6-quantized smoothed log-ratio of one bucket, computed
    * driver-side EXACTLY as the in-plan expression and the DuckDB
    * oracle compute it: java.lang.Math.log is the function Spark's
    * `log` evaluates, and BigDecimal HALF_UP is the rounding Spark's
    * `round` applies. One formula, three call sites, zero drift. */
  private[ops] def lamE6Of(cp: Long, cq: Long, tp: Long, tq: Long,
                           nBuckets: Int, alpha: Double): Long = {
    val am = alpha * nBuckets
    val x = (math.log((cp + alpha) / (tp + am)) -
             math.log((cq + alpha) / (tq + am))) * 1e6
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  /** Score a corpus against a dense λ array riding the plan as a
    * literal: explode grams, look λ up in place, sum per doc — the
    * shuffle is the map-side-combined per-doc sum, nothing else. */
  private def scoreWith(docs: DataFrame, lam: Array[Long], nBuckets: Int,
                        idCol: String, textCol: String): DataFrame =
    gramBuckets(docs, nBuckets, idCol, textCol)
      .select(col(idCol), element_at(lit(lam), col("bucket") + 1).as("lam_e6"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("lam_e6").as("s"))
      .select(col(idCol), col("n_grams"),
        round(col("s").cast("double") / 1e6, 4).as("logratio"))

  /** The DSIR model as a persistable frame: (bucket, lam_e6) over
    * every bucket either fit corpus touched, plus a sentinel row
    * `bucket = -1` carrying the both-unseen default (smoothing gives
    * unseen buckets ln((tq+αm)/(tp+αm)) — a constant). This is the
    * fit-once/serve-many shape: fit on a target corpus and a raw
    * REFERENCE SAMPLE, persist ≤ nBuckets+1 rows, then score any
    * stream of batches against the frozen model
    * ([[graft.streaming.StreamingDsir]]). [[importanceWeights]] is the
    * self-contained batch variant (q̂ fit on the scored corpus
    * itself); both ride the same gram, hash and quantization path. */
  def lambdaFrame(rawSample: DataFrame, target: DataFrame,
                  nBuckets: Int = 4096, alpha: Double = 1.0,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    graft.functions.ensureRegistered(rawSample.sparkSession)
    val cq = bucketMarginal(rawSample, nBuckets, idCol, textCol)
    val cp = bucketMarginal(target, nBuckets, idCol, textCol)
    val (tp, tq) = (cp.values.sum, cq.values.sum)
    val spark = rawSample.sparkSession
    import spark.implicits._
    // every bucket either fit corpus touched, plus the sentinel for
    // buckets neither did (serve-time batches can hit any of the three)
    val rows = (cq.keySet ++ cp.keySet).toSeq.sorted.map { b =>
      (b, lamE6Of(cp.getOrElse(b, 0L), cq.getOrElse(b, 0L), tp, tq, nBuckets, alpha))
    } :+ ((-1, lamE6Of(0L, 0L, tp, tq, nBuckets, alpha)))
    rows.toDF("bucket", "lam_e6")
  }

  /** Score documents against a frozen [[lambdaFrame]]: the serve half
    * of fit-once/serve-many, same output shape and same plan as
    * [[importanceWeights]]'s scoring pass — the ≤ nBuckets+1-row model
    * collects to a dense array (sentinel default filling the gaps) and
    * rides the plan as a literal. */
  def scoreAgainst(docs: DataFrame, lambda: DataFrame,
                   nBuckets: Int = 4096,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    val m = lambda.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dflt = m.getOrElse(-1, 0L)
    val arr = Array.tabulate(nBuckets)(b => m.getOrElse(b, dflt))
    scoreWith(docs, arr, nBuckets, idCol, textCol)
  }

  /** Deterministic DSIR selection: the k most target-like raw docs by
    * [[importanceWeights]], ties broken by id — the "resampling"
    * reduced to its reproducible core (heated Gumbel resampling is a
    * seeded-noise column away; the deterministic top-k is what
    * ablations can replay). Plans as TakeOrderedAndProject: k-bounded
    * driver result, no global sort materialization. */
  def importanceSelect(raw: DataFrame, target: DataFrame, k: Int,
                       nBuckets: Int = 4096, alpha: Double = 1.0,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    importanceWeights(raw, target, nBuckets, alpha, idCol, textCol)
      .orderBy(col("logratio").desc, col(idCol).asc).limit(k)
  }

  /** Temperature-flattened per-source keep rates — the multilingual
    * "α-sampling" rule (sample source s ∝ (n_s/N)^α): α = 1 preserves
    * the natural mix, α → 0 flattens toward uniform-over-sources,
    * boosting tail sources at the head's expense. Rates scale so the
    * EXPECTED kept total is `targetFrac`·N (capped at 1 per source —
    * a tail source whose boost exceeds its size keeps everything).
    *
    * Engine-exact arithmetic: weights quantize to w_e6 =
    * floor((n_s/N)^α · 1e6) — at the default α = ½ the power is ONE
    * correctly-rounded sqrt, identical on every IEEE engine (general α
    * goes through pow, where engines may drift a final ulp; the
    * operator takes any α, the oracle-checked surface pins ½) — and
    * the rate is pure 64-bit integer arithmetic from there:
    * rate_e6 = min(1e6, w_e6·target·1e6 div (Z·n_s)), overflow-safe
    * while w_e6·target·1e6 < 2^63 (target < 9.2e6 sources-weighted
    * docs per the w_e6 ≤ 1e6 bound — beyond that, pre-divide Z).
    *
    * Scale: one map-side-combined count per source, then all window
    * math runs on the |sources|-row frame (the bounded-global-window
    * pattern of [[mixturePlan]]). */
  def temperatureRates(docs: DataFrame, alpha: Double = 0.5,
                       targetFrac: Double = 0.3,
                       groupCol: String = "source"): DataFrame =
    temperatureRatesFromCounts(
      docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs")),
      alpha, targetFrac, groupCol)

  /** [[temperatureRates]] from an ALREADY-AGGREGATED per-group count
    * frame (groupCol, n_docs) — the form a persistent count store
    * serves ([[graft.streaming.StreamingMixture]]); same math, same
    * engine-exactness. */
  def temperatureRatesFromCounts(counts: DataFrame, alpha: Double = 0.5,
                                 targetFrac: Double = 0.3,
                                 groupCol: String = "source"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetFrac > 0 && targetFrac <= 1,
      s"targetFrac must be in (0, 1], got $targetFrac")
    val share = col("n_docs").cast("double") / col("total").cast("double")
    val wgt = if (alpha == 0.5) sqrt(share) else pow(share, lit(alpha))
    counts
      .withColumn("total", sum("n_docs").over(Window.partitionBy()))
      .withColumn("w_e6", floor(wgt * lit(1e6)).cast("long"))
      .withColumn("z", sum("w_e6").over(Window.partitionBy()))
      .withColumn("target",
        floor(col("total").cast("double") * lit(targetFrac)).cast("long"))
      .select(col(groupCol), col("n_docs"),
        least(lit(1000000L),
          expr("w_e6 * target * 1000000 div (z * n_docs)")).as("rate_e6"))
  }

  /** Apply [[temperatureRates]]: keep a doc when its id hash lands
    * under its source's rate in [0, 1e6) — the same deterministic
    * [[detHashMod]] gate as [[hashSample]], at 1e-6 granularity. The
    * rates frame is |sources| rows and broadcasts; the gate is one
    * predicate per row, no corpus shuffle. Output keeps the input
    * columns plus the source's `rate_e6`. */
  def temperatureSample(docs: DataFrame, alpha: Double = 0.5,
                        targetFrac: Double = 0.3,
                        groupCol: String = "source",
                        idCol: String = "doc_id"): DataFrame = {
    val rates = temperatureRates(docs, alpha, targetFrac, groupCol)
      .select(col(groupCol), col("rate_e6"))
    docs.join(broadcast(rates), groupCol)
      .where(detHashMod(col(idCol), 1000000L) < col("rate_e6"))
  }

  /** Token-budget selection: per group, keep the highest-priority
    * documents whose RUNNING token total fits the group's budget — the
    * operator that assembles "the best N billion tokens of web, the
    * best M of code" from scored candidates. Deterministic: order is
    * (priority desc, id asc), a doc is kept iff the cumulative token
    * count THROUGH it (its own tokens included) is within budget, so
    * the kept set never overshoots and is reproducible across runs.
    * Output: input columns + cum_tokens + kept. Groups absent from
    * `budgets` get `defaultBudget` (0 = drop all).
    *
    * Scale: one window shuffle keyed by group. With few large groups
    * the running sum serializes per group — the honest cost of an
    * EXACT budget cut; at corpus scale use
    * [[TextAnalysis.qualityCalibration]]-style per-source score
    * cutoffs (one aggregate, no sort) to approximate the budget, or
    * pre-bucket priorities and spend the window on the boundary
    * bucket only. */
  def budgetSelect(docs: DataFrame, budgets: Map[String, Long],
                   priority: Column, tokenCount: Column,
                   defaultBudget: Long = 0L,
                   groupCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "budgets must be non-negative")
    val b = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, v)) =>
      when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pr").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__pr", priority)
      .withColumn("__tok", tokenCount.cast("long"))
      .withColumn("cum_tokens", sum(col("__tok")).over(w))
      .withColumn("kept", col("cum_tokens") <= b)
      .drop("__pr", "__tok")
  }

  /** Epoch upsampling — the ≥ 1 counterpart of [[mixtureSample]]:
    * training mixes routinely REPEAT high-value sources ("3 epochs of
    * wiki, 1.5 of books, 0.3 of web"), and this emits each doc
    * ⌊epochs⌋ or ⌈epochs⌉ times so every group's expected replication
    * equals its epoch count exactly. The fractional epoch is resolved
    * by the same deterministic [[detHashMod]] gate as
    * [[temperatureSample]] (a doc's extra copy is a stable property of
    * its id, reproducible across runs and engines); rates < 1 degrade
    * to plain subsampling, rate 0 drops the group. Output keeps the
    * input columns plus `copy` (0-based replica index) — downstream
    * shuffles ([[epochShuffle]]) key on (id, copy) so replicas spread
    * across the epoch instead of clumping.
    *
    * Scale: map-only — the per-row explode fans out ⌈epochs⌉ rows with
    * no exchange, and the rate lookup is a literal CASE column (no
    * join). The output is deliberately NOT pre-shuffled; feed it to
    * [[epochShuffle]] for the serving order. */
  def upsampleByEpochs(docs: DataFrame, epochs: Map[String, Double],
                       defaultEpochs: Double = 1.0,
                       groupCol: String = "source",
                       idCol: String = "doc_id"): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0 && e <= 1000),
      "epochs must be in [0, 1000]")
    def e6(f: Double): Long = math.round(f * 1e6)
    // a null group key needs an isNull arm — `col === lit(null)` can
    // never match, which would silently freeze the group at the default
    val rate = epochs.foldLeft(lit(e6(defaultEpochs))) { case (acc, (g, f)) =>
      when(if (g == null) col(groupCol).isNull else col(groupCol) === g,
        lit(e6(f))).otherwise(acc)
    }
    docs
      .withColumn("__n",
        floor(rate.cast("double") / 1e6).cast("long") +
          when(detHashMod(col(idCol), 1000000L) < rate % 1000000L, 1L)
            .otherwise(0L))
      .where(col("__n") > 0) // guards the descending-sequence edge too
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Hard-domain reweighting — the DoReMi signal (Xie et al. 2023,
    * public) in its one-shot, integer-exact form: domains whose mean
    * bigram log-probability under the corpus's own LM sits BELOW the
    * corpus mean (harder / higher-perplexity text) get their mixture
    * share multiplied up, easier domains down, by a factor linear in
    * the normalized excess loss (the full DoReMi proxy-model loop
    * distills the same per-domain excess-loss ordering; the one-shot
    * form is what a pipeline can compute from corpus statistics
    * alone). Output per source, ordered:
    * (source, n_docs, mean_lp_e4, excess_e4, factor_e6, weight_e6)
    * where factor_e6 ∈ [1e6−η, 1e6+η] and weight_e6 is the
    * renormalized n_docs·factor share.
    *
    * Numerics: per-source means round through the SAME double
    * expression on every engine (the d_bigram_logprob discipline);
    * everything after is 64-bit integer arithmetic with divisions on
    * NON-NEGATIVE operands only (truncating division diverges between
    * engines on negatives), so the weights replay bit-for-bit.
    *
    * Scale: rides [[TextAnalysis.bigramScoreRaw]]'s one corpus-sized
    * (prev,cur) count; everything after is |sources|-row frames and
    * audited single-row broadcasts. */
  def hardDomainWeights(docs: DataFrame, etaE6: Long = 500000L,
                        lam: Double = 0.7,
                        srcCol: String = "source", idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val raw = TextAnalysis.bigramScoreRaw(docs, lam, idCol, textCol)
    hardDomainWeightsFromScores(
      docs.select(col(idCol), col(srcCol)).join(raw, idCol), etaE6, srcCol)
  }

  /** ITERATIVE hard-domain reweighting — the DoReMi loop (Xie et al.
    * 2023) over [[hardDomainWeights]]' one-shot signal: each round
    * re-fits the interpolated-bigram reference LM on the CURRENT
    * reweighted mixture (every source's bigram/unigram counts scaled
    * by its cumulative factor), re-scores each domain's unweighted
    * text under that LM, and multiplies the cumulative factor by the
    * round's linear-excess factor. Hard domains get progressively
    * upweighted until the reweighted reference stops seeing them as
    * excess-loss outliers — the fixed point the paper's proxy-model
    * loop approaches, computed from corpus statistics alone.
    *
    * Round 1 is BIT-FOR-BIT the one-shot operator (all cumulative
    * factors start at 1e6, so count scaling is skipped and the lexicon
    * is the plain corpus LM) — spec-pinned. Output adds
    * `cum_factor_e6` (the product of per-round factors, truncating
    * e6 arithmetic) to the one-shot schema; `mean_lp_e4` /
    * `excess_e4` / `factor_e6` are the LAST round's values and
    * `weight_e6` renormalizes n_docs · cum_factor.
    *
    * Numerics: the only floating-point is inside the lexicon log and
    * the e4 mean rounding — the same expressions as the one-shot path,
    * over weighted counts that stay exact 64-bit integers. Reweighted
    * rounds scale counts by the e3-QUANTIZED cumulative factor
    * (max(1, cum_factor_e6 div 1000)): tf × cum_e6 sums would overflow
    * int64 near ~10¹³ corpus tokens (exactly the design scale), while
    * tf × cum_e3 keeps ~200× headroom at K = 2 and the ≤0.4% weight
    * quantization sits far below the lexicon's own e6 log rounding.
    * Truncating division on non-negative operands — replays exactly.
    *
    * Scale: the upstream plan behind `docs` is evaluated ONCE (a
    * checkpointed two-column projection feeds all three statistics
    * passes); the three resulting count frames are vocab-bounded,
    * checkpointed, and reused every round — each round is vocab-sized
    * joins plus |sources|-row frames. The driver holds only the
    * |domains|-row factor vector between rounds (injected as a literal
    * CASE column, the [[upsampleByEpochs]] pattern) — domains are
    * dozens at 100 TB, not data-sized. */
  def doremiWeights(docs: DataFrame, rounds: Int = 2, etaE6: Long = 500000L,
                    lam: Double = 0.7,
                    srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    // lazy-safe: chain-fused — sg's EAGER materialization below is the
    // first consuming action and reads d from one site; su/nd then read
    // the already-materialized blocks
    val d = docs.select(col(srcCol), col(textCol)).sharedCheckpoint(eager = false)
    // the three count frames are read every round — checkpoint them
    // HERE (the from-stores entry leaves that to its caller: the
    // streaming controller passes already-localCheckpointed stores,
    // and re-checkpointing the corpus-scale gram frame per batch would
    // double its materialization)
    val sg = TextAnalysis.bigramPairCounts(d, Seq(srcCol), textCol)
      .sharedCheckpoint(eager = true)
    // lazy-safe: chain-fused — every round's plan references su at ONE
    // site (the wuf aggregate); round 1's driver collect materializes
    // it there, later rounds read the blocks
    val su = srcUnigramCounts(d, srcCol, textCol).sharedCheckpoint(eager = false)
    // n_docs counts SCORED docs (>= 2 tokens) — the one-shot operator's
    // inner join of docs against their bigram scores has exactly this
    // count, and the K = 1 ≡ one-shot pin needs it to match
    // lazy-safe: materialized by doremiWeightsFromGramStores' FIRST
    // statement — the cum-init `nd.select(srcCol).collect()` — before
    // any multi-site plan touches it
    val nd = d.where(size(Dedup.tokens(col(textCol))) >= 2)
      .groupBy(srcCol).agg(count(lit(1)).as("n_docs"))
      .sharedCheckpoint(eager = false)
    doremiWeightsFromGramStores(sg, su, nd, rounds, etaE6, lam, srcCol)
  }

  /** Per-source epoch counts from a domain-weight frame — the bridge
    * from [[hardDomainWeights]]/[[doremiWeights]] output to
    * [[upsampleByEpochs]]: a domain sampled at mixture share w from
    * natural share n_i/N repeats for w·N/n_i epochs. Integer-exact
    * (epochs_e6 = weight_e6 · N div n_docs, truncating on
    * non-negatives), capped at `maxEpochsE6` — repetition past a few
    * epochs has sharply diminishing returns (Muennighoff et al. 2023),
    * and the cap also bounds a tiny hard domain's blow-up. Output:
    * (srcCol, n_docs, weight_e6, epochs_e6), ordered.
    *
    * Numerics: weight_e6 ≤ 1e6 and N ≤ ~9·10¹² keeps the product in
    * int64 — two orders past a 100 TB corpus's ~5·10¹⁰ docs. */
  def epochsFromWeights(weights: DataFrame, maxEpochsE6: Long = 8000000L,
                        srcCol: String = "source"): DataFrame = {
    require(maxEpochsE6 >= 1000000L && maxEpochsE6 <= 1000000000L,
      s"maxEpochsE6 must be in [1e6, 1e9], got $maxEpochsE6")
    val tot = weights.agg(sum("n_docs").as("__N"))
    weights.select(col(srcCol), col("n_docs"), col("weight_e6"))
      .crossJoin(broadcast(tot)) // audited single-row
      .select(col(srcCol), col("n_docs"), col("weight_e6"),
        least(lit(maxEpochsE6),
          expr("weight_e6 * __N div n_docs")).as("epochs_e6"))
      .orderBy(srcCol)
  }

  /** Per-source unigram counts (srcCol, token, uf) — the third
    * sufficient statistic of the DoReMi loop (reweighting the lexicon's
    * unigram back-off needs counts SPLIT by source; the one-shot path
    * only ever needs their global sum). Shared by [[doremiWeights]] and
    * the streaming controller's `srcunis` store so the twin folds the
    * exact same frame. */
  private[graft] def srcUnigramCounts(docs: DataFrame, srcCol: String,
                                      textCol: String): DataFrame =
    docs
      .select(col(srcCol), explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy(srcCol, "token").agg(count(lit(1)).as("uf"))

  /** [[doremiWeights]]' K-round loop over the three sufficient-statistic
    * frames — per-source bigram counts (srcCol, prev, cur, tf),
    * per-source unigram counts (srcCol, token, uf), per-source scored
    * doc counts (srcCol, n_docs). The streaming controller's entry
    * (its cumulative stores have exactly these shapes), and the batch
    * operator delegates here after its two corpus passes. Each input is
    * read every round — the CALLER must pass cheaply re-readable frames
    * (both entries do: the batch operator checkpoints its count frames,
    * the streaming controller passes localCheckpointed stores; a second
    * checkpoint here would double-materialize the gram frame per batch).
    * Per-round factor frames never checkpoint at all: each round's
    * |sources|-row result is COLLECTED once, and the final output is a
    * local relation — nothing loop-scoped leaks into executor storage
    * or a reliable checkpoint dir. */
  private[graft] def doremiWeightsFromGramStores(srcGrams: DataFrame,
                                                 srcUnis: DataFrame,
                                                 srcDocs: DataFrame,
                                                 rounds: Int, etaE6: Long,
                                                 lam: Double,
                                                 srcCol: String): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sg = srcGrams
    val su = srcUnis
    val nd = srcDocs
    var cum: Map[String, Long] =
      nd.select(srcCol).collect().map(_.getString(0) -> 1000000L).toMap
    // last round's collected (source, n_docs, mean_lp_e4, excess_e4,
    // factor_e6) rows — the |domains|-row frame the output builds from
    var lastRows: Array[org.apache.spark.sql.Row] = Array.empty
    // a NULL-source domain is a real group (the weight math keys it
    // like any other); `col === lit(null)` can never be true, so the
    // CASE fold needs an isNull arm for the null key
    def keyIs(s: String): org.apache.spark.sql.Column =
      if (s == null) col(srcCol).isNull else col(srcCol) === s
    for (round <- 1 to rounds) {
      // ROUND 1 scores raw counts, so the lexicon is the plain corpus
      // LM and the round IS the one-shot operator — scaling by a
      // literal would perturb the lexicon's doubles by an ulp and
      // break the K=1 ≡ one-shot pin. Every LATER round scales
      // unconditionally by the e3-quantized cumulative factor — even
      // in the degenerate all-factors-exactly-1e6 state (single-domain
      // corpora), because the oracle SQL scales unconditionally and a
      // data-dependent plan switch there could flip a quantized lp_e6
      // by an ulp at a rounding boundary (r10 ADVICE). Overflow
      // headroom per scaladoc; truncating div on non-negatives,
      // orable as `cum // 1000`
      val uniform = round == 1
      def cumE3Expr = cum.foldLeft(lit(1000L)) { case (acc, (s, f)) =>
        when(keyIs(s), lit(math.max(1L, f / 1000L))).otherwise(acc)
      }
      val wbf =
        if (uniform) sg.groupBy("prev", "cur").agg(sum("tf").as("bfreq"))
        else sg.groupBy("prev", "cur")
          .agg(sum(col("tf") * cumE3Expr).as("bfreq"))
      val wuf =
        if (uniform) su.groupBy("token").agg(sum("uf").as("ufreq"))
        else su.groupBy("token").agg(sum(col("uf") * cumE3Expr).as("ufreq"))
      val lex = TextAnalysis.bigramLexiconOf(wbf, wuf, lam)
      // null-safe join: a NULL-source group must survive the n_docs
      // attach (an equi-join would silently drop it, diverging from
      // the one-shot operator's plain groupBy)
      val grouped = sg.join(lex, Seq("prev", "cur"))
        .groupBy(srcCol)
        .agg(sum("tf").as("n_bigrams"), sum(col("tf") * col("lp_e6")).as("s"))
      val scored = grouped.join(nd, grouped(srcCol) <=> nd(srcCol))
        .drop(nd(srcCol))
      lastRows = hardDomainWeightsFromScores(scored, etaE6, srcCol)
        .select(col(srcCol), col("n_docs"), col("mean_lp_e4"),
          col("excess_e4"), col("factor_e6"))
        .collect() // one driver round-trip per round, |sources| rows
      val roundFac = lastRows
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      cum = cum.map { case (s, c) =>
        // truncating div on non-negative operands — replays exactly
        s -> c * roundFac.getOrElse(s, 1000000L) / 1000000L
      }
    }
    // final frame assembled driver-side from the last round's rows —
    // same double expression as the Spark path (n·cum as doubles, ×1e6,
    // HALF_UP round), so the values are bit-identical to the previous
    // crossJoin(broadcast(den)) plan
    // exact accumulation: cum factors compound per round (up to
    // ~1.5^K · 1e6), so at design-scale doc counts the Σ n_docs·cum
    // product chain can approach int64 — overflow must fail loudly
    // (the refuse-loudly convention; epochsFromWeights bounds its
    // product the same way), not silently wrap every weight_e6
    val dsum = lastRows.foldLeft(0L) { (acc, r) =>
      Math.addExact(acc,
        Math.multiplyExact(r.getLong(1), cum.getOrElse(r.getString(0), 1000000L)))
    }
    val outRows: Seq[org.apache.spark.sql.Row] = lastRows.toSeq
      .map { r =>
        val src = r.getString(0)
        val nDocs = r.getLong(1)
        val cumF = cum.getOrElse(src, 1000000L)
        org.apache.spark.sql.Row(src, nDocs, r.getLong(2), r.getLong(3),
          r.getLong(4), cumF,
          math.round(nDocs.toDouble * cumF.toDouble * 1e6 / dsum.toDouble))
      }
      .sortBy(r => Option(r.getString(0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(srcCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("mean_lp_e4",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("excess_e4",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("factor_e6",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_factor_e6",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("weight_e6",
        org.apache.spark.sql.types.LongType, nullable = false)))
    srcGrams.sparkSession.createDataFrame(
      java.util.Arrays.asList(outRows: _*), schema)
  }

  /** [[hardDomainWeights]]' weight math over an already-scored frame
    * (srcCol, n_bigrams, s) — one row per doc (batch path) or
    * pre-aggregated per-source sums with an `n_docs` column (the
    * streaming twin's cumulative stores). Split out so the continuous
    * controller reuses the EXACT integer chain. */
  private[graft] def hardDomainWeightsFromScores(scored: DataFrame, etaE6: Long,
                                               srcCol: String): DataFrame = {
    require(etaE6 >= 0 && etaE6 < 1000000L, s"etaE6 must be in [0, 1e6), got $etaE6")
    val perDoc = !scored.columns.contains("n_docs")
    val bySrc = scored
      .groupBy(srcCol)
      .agg((if (perDoc) count(lit(1)) else sum("n_docs")).as("n_docs"),
        sum("n_bigrams").as("__nb"), sum("s").as("__ss"))
      .sharedCheckpoint(eager = true) // feeds the per-source frame AND the totals
    val srcMean = bySrc.select(col(srcCol), col("n_docs"),
      round(col("__ss").cast("double") / 100.0 / col("__nb").cast("double"))
        .cast("long").as("mean_lp_e4"))
    val overall = bySrc.agg(
      round(sum("__ss").cast("double") / 100.0 / sum("__nb").cast("double"))
        .cast("long").as("__o_e4"))
    val ex = srcMean.crossJoin(broadcast(overall)) // audited single-row
      .select(col(srcCol), col("n_docs"), col("mean_lp_e4"),
        (col("__o_e4") - col("mean_lp_e4")).as("excess_e4"))
    val mx = ex.agg(max(abs(col("excess_e4"))).as("__ma"))
    val fac = ex.crossJoin(broadcast(mx)) // audited single-row
      .select(col(srcCol), col("n_docs"), col("mean_lp_e4"), col("excess_e4"),
        when(col("__ma") === 0L, lit(1000000L))
          .when(col("excess_e4") >= 0L,
            lit(1000000L) + expr(s"($etaE6 * excess_e4) div __ma"))
          .otherwise(
            lit(1000000L) - expr(s"($etaE6 * (-excess_e4)) div __ma"))
          .as("factor_e6"))
    val den = fac.agg(sum(col("n_docs") * col("factor_e6")).as("__dsum"))
    fac.crossJoin(broadcast(den)) // audited single-row
      .select(col(srcCol), col("n_docs"), col("mean_lp_e4"), col("excess_e4"),
        col("factor_e6"),
        round(col("n_docs").cast("double") * col("factor_e6").cast("double") *
          1e6 / col("__dsum").cast("double")).cast("long").as("weight_e6"))
      .orderBy(srcCol)
  }

  /** [[hardDomainWeights]] priced over CUMULATIVE count stores — the
    * streaming controller's entry: per-source bigram tables
    * (srcCol, prev, cur, tf), global unigram counts (token, ufreq),
    * and per-source doc counts (srcCol, n_docs). The lexicon builds
    * from the CURRENT global sums, so every source's historical pairs
    * re-price as the corpus evolves (per-doc scores would freeze a
    * doc's contribution at ingest-time probabilities); a one-batch
    * stream therefore equals the batch operator EXACTLY. State is
    * |sources|·vocab² bounded — corpus-size-free. */
  private[graft] def hardDomainWeightsFromGramStores(srcGrams: DataFrame,
                                                     unigrams: DataFrame,
                                                     srcDocs: DataFrame,
                                                     etaE6: Long, lam: Double,
                                                     srcCol: String): DataFrame = {
    val bf = srcGrams.groupBy("prev", "cur").agg(sum("tf").as("bfreq"))
    val lex = TextAnalysis.bigramLexiconOf(bf, unigrams, lam)
    // null-safe n_docs attach — see doremiWeightsFromGramStores
    val grouped = srcGrams.join(lex, Seq("prev", "cur"))
      .groupBy(srcCol)
      .agg(sum("tf").as("n_bigrams"), sum(col("tf") * col("lp_e6")).as("s"))
    val scored = grouped.join(srcDocs, grouped(srcCol) <=> srcDocs(srcCol))
      .drop(srcDocs(srcCol))
    hardDomainWeightsFromScores(scored, etaE6, srcCol)
  }
}
