package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Checkpoints.SharedOps

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (Array[Float]).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the corpus once — no shuffle until the per-query top-k
  * (which AQE keeps tiny). The LSH path buckets by random-hyperplane
  * signature so candidate generation touches only same-bucket pairs;
  * at 100 TB the bucket join replaces the quadratic cross product.
  */
object Similarity {

  /** Codegen'd double-precision dot product (custom Catalyst
    * expression — the higher-order `aggregate(zip_with(...))` fallback
    * evaluates lambdas interpretively and dominated pairwise scans). */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every corpus vector scored against every
    * query vector (queries broadcast), ranked per query. Norms are
    * computed once per vector, not once per pair. Exact — the baseline
    * the ANN path is measured against. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_nrm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    val scored = q.crossJoin(c)
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
  }

  /** LSH (bits, tables) sized for a cosine threshold: per-hyperplane
    * agreement probability for a pair at exactly the threshold is
    * p = 1 − acos(t)/π; bits chosen so a table retains ≥ ~15% of
    * threshold pairs, tables so the residual miss probability per true
    * pair is ≤ targetMiss ((1−p^bits)^tables). Low thresholds (far
    * pairs) auto-degrade to few bits / many tables — the honest cost of
    * exactness near the all-pairs regime; high thresholds (true
    * near-dups) get many bits / few tables and sub-quadratic behavior. */
  def lshParamsFor(threshold: Double, targetMiss: Double = 1e-5): (Int, Int) = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val bits = math.max(1, math.floor(math.log(0.07) / math.log(p)).toInt)
    val pb = math.pow(p, bits)
    val tables = math.max(1, math.ceil(math.log(targetMiss) / math.log1p(-pb)).toInt)
    (bits, tables)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Below this signature width the LSH buckets stop pruning: per-table
    * candidate volume is ~ C(n,2)/2^bits, so at ≤ 8 bits a table retains
    * ≥ ~0.4% of ALL pairs and the job is effectively quadratic. */
  val DegenerateLshBits = 8

  /** On UNCLUSTERED vectors every table retains C(n,2)/2^bits random
    * pairs, so across tables the candidate volume is this fraction of
    * ALL pairs — still ∝ n². Above this retained fraction the sizing
    * is flagged even when `bits` alone looks healthy (the round-5
    * 200k-vector run measured threshold 0.7 ⇒ bits=9, tables=154 ⇒
    * 30% retained ⇒ a 6e9-candidate spill). */
  val DegenerateLshRetainedFraction = 0.05

  /** Retained-pair fraction of the (bits, tables) sizing on isotropic
    * data: tables / 2^bits (> 1 means cross-table repeats). */
  def lshRetainedFraction(bits: Int, tables: Int): Double =
    tables / math.pow(2.0, bits.toDouble)

  /** Projected LSH candidate volume when the (bits, tables) sizing has
    * degraded to the near-all-pairs regime; None when the parameters
    * are genuinely sub-quadratic on worst-case (unclustered) data.
    * Pure function of (n, bits, tables) so callers (and specs) can
    * evaluate the envelope without running the join. */
  def degenerateLshDiagnostic(n: Long, bits: Int, tables: Int): Option[String] = {
    val frac = lshRetainedFraction(bits, tables)
    if (bits > DegenerateLshBits && frac < DegenerateLshRetainedFraction) None
    else {
      val total = n.toDouble * (n.toDouble - 1) / 2.0 * frac
      Some(f"nearDupPairs is in the degenerate LSH regime: bits=$bits, " +
        f"tables=$tables, n=$n ⇒ projected candidate volume ≈ $total%.3g pairs " +
        f"(~${100.0 * frac}%.1f%% of all pairs incl. cross-table repeats) — " +
        "effectively quadratic on unclustered data. This is the honest cost of " +
        "near-perfect recall at this cosine threshold; real clustered corpora " +
        "retain less. For a bucket-bounded scale path use ivfNearDupPairs.")
    }
  }

  /** All pairs with cosine ≥ threshold (near-duplicate detection).
    * Candidates come from multi-table random-hyperplane LSH buckets —
    * only same-bucket pairs are ever materialized, so the plan has no
    * CartesianProduct node and at scale the pair volume is bounded by
    * bucket collisions, not n². Candidates are then exact-verified with
    * one codegen'd dot product (dot ≥ t·‖a‖·‖b‖, norms precomputed per
    * vector); ids only so the result is float-robust.
    *
    * Guardrail: when the recall sizing degrades below
    * [[DegenerateLshBits]] signature bits (low thresholds), the call
    * WARNs with the retained-pair FRACTION (tables/2^bits — scale-free,
    * so no job runs at plan-build time and the operator stays lazy);
    * [[degenerateLshDiagnostic]] turns a corpus size into the absolute
    * projected candidate volume for callers that want the number before
    * launching a 10⁹-vector job. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   dims: Int = 64): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val (bits, tables) = lshParamsFor(threshold)
    if (bits <= DegenerateLshBits ||
        lshRetainedFraction(bits, tables) >= DegenerateLshRetainedFraction)
      log.warn(f"nearDupPairs is in the degenerate LSH regime at threshold $threshold: " +
        f"bits=$bits, tables=$tables ⇒ buckets retain " +
        f"~${100.0 * lshRetainedFraction(bits, tables)}%.1f%% of all pairs (incl. " +
        "cross-table repeats) — effectively quadratic on unclustered corpora. This " +
        "is the honest cost of near-perfect recall at this cosine threshold; " +
        "real clustered corpora retain less. For a bucket-bounded scale path use " +
        "ivfNearDupPairs; Similarity.degenerateLshDiagnostic(n, bits, tables) " +
        "projects the candidate volume.")
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    val buckets = lshBuckets(base, "id", "v", bits, dims, tables)
    // Candidates are NOT deduped before verification: the verify dot is
    // one codegen'd multiply-add loop per row, far cheaper than the
    // wide-row distinct shuffle it would take to dedup millions of
    // (id_a, id_b) candidates. Dedup happens after the threshold test,
    // on the (tiny) surviving pair set.
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    cands
      .join(base.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      // positive-norm guard: for a zero vector the scale-free predicate
      // degenerates to 0 ≥ 0 and would pair it with every bucket-mate;
      // cosine is undefined there, so zero vectors never pair (matching
      // SQL engines, where list_cosine_similarity yields NaN)
      .where(col("na") > 0 && col("nb") > 0 &&
        dot(col("va"), col("vb")) >= lit(threshold) * col("na") * col("nb"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact all-pairs cosine near-dup via BLOCK-PARTITIONED pair
    * enumeration — the honest minimal-constant plan for the regime
    * where recall-sized LSH is degenerate (low thresholds on isotropic
    * data, where LSH retains ≥ 100% of all pairs INCLUDING cross-table
    * repeats plus n × tables bucket rows of fan-out). Nothing with
    * recall ~1 is sub-quadratic there, so the right plan evaluates
    * each of the C(n,2) pairs exactly once with no bucket machinery:
    *
    * Every vector hashes into one of `blocks` blocks; the driver
    * enumerates the blocks² ordered block pairs (a tiny broadcast
    * frame), each vector joins its block's row-pairs, and the two
    * legs meet on the (ba, bb) block-pair key — equi-joins throughout
    * (no CartesianProduct node), replication factor `blocks + 1` per
    * row versus the degenerate regime's ~150 LSH tables, and the
    * largest join partition holds ~2/blocks of the work. Cross-block
    * pairs arrive block-oriented, so ids are normalized with
    * least/greatest; same-block pairs keep `id_a < id_b`. The verify
    * is the same codegen'd scale-free dot as [[nearDupPairs]], zero
    * vectors never pair. */
  def bruteForcePairs(corpus: DataFrame, threshold: Double,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      blocks: Int = 32): DataFrame = {
    require(blocks >= 1, s"blocks must be positive, got $blocks")
    graft.functions.ensureRegistered(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      pmod(xxhash64(col(idCol)), lit(blocks.toLong)).cast("int").as("blk"))
    val blockPairs = broadcast(
      (for (i <- 0 until blocks; j <- i until blocks) yield (i, j))
        .toDF("ba", "bb"))
    val left = base.join(blockPairs, col("blk") === col("ba"))
      .select(col("id").as("ida"), col("v").as("va"), col("nrm").as("na"),
        col("ba"), col("bb"))
    val right = base
      .select(col("id").as("idb"), col("v").as("vb"), col("nrm").as("nb"),
        col("blk").as("bb"))
    // each unordered pair materializes exactly once: same-block pairs
    // through (i, i) with id order, cross-block pairs through the one
    // ordered (ba < bb) block combination their blocks form — so no
    // result-side distinct is needed
    left.join(right, Seq("bb"))
      .where(col("ba") === col("bb") && col("ida") < col("idb") ||
        col("ba") < col("bb"))
      .where(col("na") > 0 && col("nb") > 0 &&
        dot(col("va"), col("vb")) >= lit(threshold) * col("na") * col("nb"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"))
  }

  /** The diagnostic [[nearDupPairsAdaptive]] WARNs with when it takes
    * the exact block-partitioned arm — the O(n²) plan must be as loud
    * as the LSH arm's degenerate WARN (a caller at threshold 0.45 on
    * 10⁹ vectors is launching a ~5·10¹⁷-pair job and deserves the
    * number's shape in the log). Pure function of the routing inputs
    * (n is unknown at plan time — the blocks+1 replication is the
    * plan-time-known cost) so specs pin the message without running a
    * job; callers with a corpus estimate can price C(n,2) themselves. */
  def exactBlockDiagnostic(threshold: Double, bits: Int, tables: Int,
                           blocks: Int): String =
    f"nearDupPairsAdaptive routed threshold $threshold%.2f to the EXACT " +
    f"block-partitioned plan (recall-sized LSH here retains " +
    f"~${100.0 * lshRetainedFraction(bits, tables)}%.1f%% of ALL pairs incl. " +
    f"cross-table repeats, so bucket machinery only adds fan-out): every one " +
    f"of the C(n,2) pairs is evaluated exactly once, with ${blocks + 1} " +
    "replicas per row across the block join. Nothing with recall ~1 is " +
    "sub-quadratic in this regime — for BOUNDED-candidate approximate dedup " +
    "at scale use ivfNearDupPairs (cell-bounded candidates, probabilistic " +
    "recall)."

  /** [[nearDupPairs]] with the degenerate regime routed to
    * [[bruteForcePairs]] — the variant naive callers should use. The
    * decision is the same scale-free retained-fraction test the WARN
    * guardrail fires on: when recall-sized LSH would retain ≥
    * [[DegenerateLshRetainedFraction]] of ALL pairs (or degrade below
    * [[DegenerateLshBits]] signature bits), bucket machinery only adds
    * fan-out over an honest exact block plan, so exactness comes free;
    * otherwise the sub-quadratic LSH path runs with its sized
    * near-perfect recall. The exact arm WARNs with
    * [[exactBlockDiagnostic]] — it is still an O(n²) job, just the
    * cheapest one. For bounded-candidate approximate dedup at genuinely
    * low thresholds, use [[ivfNearDupPairs]] instead. */
  def nearDupPairsAdaptive(corpus: DataFrame, threshold: Double,
                           idCol: String = "vec_id", vecCol: String = "embedding",
                           dims: Int = 64, blocks: Int = 32): DataFrame = {
    val (bits, tables) = lshParamsFor(threshold)
    if (bits <= DegenerateLshBits ||
        lshRetainedFraction(bits, tables) >= DegenerateLshRetainedFraction) {
      log.warn(exactBlockDiagnostic(threshold, bits, tables, blocks))
      bruteForcePairs(corpus, threshold, idCol, vecCol, blocks)
    } else nearDupPairs(corpus, threshold, idCol, vecCol, dims)
  }

  /** Near-duplicate pairs via IVF bucketing — the BUCKET-BOUNDED scale
    * path for embedding near-dup. Every vector is assigned to its
    * `nprobe` nearest of `nlist` (deterministic-Lloyd) centroids;
    * candidate pairs share a probe cell and are verified with the same
    * exact scale-free cosine predicate as [[nearDupPairs]].
    *
    * Why it scales where hyperplane LSH cannot: LSH sized for
    * near-perfect recall retains a FIXED FRACTION of all C(n,2) pairs
    * on unclustered data (see [[degenerateLshDiagnostic]]; measured as
    * a 6e9-candidate spill at 200k vectors, threshold 0.7). IVF's
    * candidate volume is Σ_cells C(|cell|, 2) ≈ n²·nprobe²/(2·nlist) —
    * the operator of a growing corpus raises `nlist` with n (the
    * standard coarse-quantizer practice, nlist ∝ n/c keeps E|cell| and
    * per-vector work CONSTANT), bounded by the centroid broadcast
    * (nlist × dims doubles).
    *
    * Recall is probabilistic, not sized-for-1e-5: a true pair lands in
    * the same cell unless Voronoi boundaries separate it; `nprobe` ≥ 2
    * catches the standard boundary straddle (spec-measured ≥ 0.9 on
    * planted near-dups). Zero vectors never pair (norm guard, as in
    * [[nearDupPairs]]). */
  /** Two-level assignment engages BY DEFAULT at this nlist. Below it
    * the flat nlist-dot scan is cheap and exact; above it the flat term
    * is the measured scale-killer (§G11: 5.9× at just 200k vectors /
    * nlist 782, decade exponent 1.34 → 0.87). 256 = the
    * [[DefaultIvfCellTarget]] regime where nlist starts growing ∝ n. */
  val AutoSuperProbeNlist = 256

  /** Auto two-level width: 2 is the measured configuration — planted-
    * pair recall unchanged vs flat (OpsSpec), §G11's build numbers. */
  val AutoSuperProbeWidth = 2

  /** Explicit flat-assignment opt-out: a non-positive superProbe width
    * disables the two-level path even above [[AutoSuperProbeNlist]]
    * (exact flat ranking at any nlist — the oracle/debug config). */
  val FlatAssign: Option[Int] = Some(0)

  /** Effective superProbe for a concrete centroid count. `Some(w ≥ 1)`
    * = explicit width; `Some(w ≤ 0)` ([[FlatAssign]]) = explicit flat;
    * `None` = AUTO — two-level at width [[AutoSuperProbeWidth]] once
    * nlist ≥ [[AutoSuperProbeNlist]], flat below. Auto-on is the
    * round-9 default flip: every 100 TB-critical lever used to be
    * opt-in, and a caller who forgot got the flat n × nlist term back. */
  def resolveSuperProbe(nlist: Int, superProbe: Option[Int]): Option[Int] =
    superProbe match {
      case Some(sp) if sp >= 1 => Some(sp)
      case Some(_) => None
      case None =>
        if (nlist >= AutoSuperProbeNlist) Some(AutoSuperProbeWidth) else None
    }

  /** Probe column for a pinned centroid set: flat (nlist dots per
    * vector), or two-level — ≈ (1+superProbe)·√nlist dots, the
    * assignment-cost escape hatch once nlist is grown with corpus size
    * (see [[graft.functions.IvfProbeHier]]). The raw `superProbe` knob
    * is resolved HERE against the concrete centroid count (see
    * [[resolveSuperProbe]]), so every IVF entry point — serve, build,
    * Lloyd assignment, PQ encode — inherits the auto default from one
    * place and a pinned-centroid serve resolves against the pinned
    * set's true size. */
  private def probeExpr(vec: Column, cents: Seq[Seq[Double]], nprobe: Int,
                        superProbe: Option[Int]): Column =
    resolveSuperProbe(cents.length, superProbe) match {
      case Some(sp) => graft.functions.ivf_probe_hier(vec, cents, nprobe, sp)
      case None => graft.functions.ivf_probe(vec, cents, nprobe)
    }

  /** Empty pair frame with `idCol`'s type on both sides — the result
    * of any pair operator over a corpus too small to pair (an empty
    * stage-5 survivor set is a NORMAL state for a curation funnel
    * whose filters wiped the corpus, not an error). */
  private def noPairs(corpus: DataFrame, idCol: String): DataFrame =
    corpus.select(col(idCol).as("id_a"), col(idCol).as("id_b")).limit(0)

  /** A probed cell holding more than `hotCellFactor` × the balanced
    * membership (total/nlist, floored at [[HotCellMinTarget]]) is HOT
    * and gets split. 4× is far outside the spread balanced isotropic
    * assignments show, and far inside the 1–5%-of-corpus capture a
    * clustered corpus' dominant Voronoi cell exhibits at grown nlist —
    * the regime where one cell's Σ C(|cell|,2) silently re-introduces
    * the quadratic term the IVF family exists to avoid. */
  val DefaultHotCellFactor = 4.0

  /** Below this balanced size, cell imbalance is statistical noise on a
    * tiny corpus, not clustering structure — never split. */
  val HotCellMinTarget = 64L

  /** Sub-quantizer width cap: keeps the per-hot-cell Lloyd training
    * a bounded driver job even when one cell holds half the corpus. */
  val MaxSubCells = 256

  /** Expected cell membership the nlist ∝ n rule targets. 256 keeps
    * the per-cell candidate term C(E|cell|,2) ≈ 3·10⁴ pairs — small
    * enough that even the pair self-join's worst cell fits one task —
    * while leaving enough members per cell that nprobe = 2 recall
    * holds (the §G3 measurements all ran at this target). */
  val DefaultIvfCellTarget = 256L

  /** The documented "grow nlist with the corpus" practice as a
    * function: nlist ≈ ⌈n / targetCellSize⌉ keeps E|cell| CONSTANT as
    * the corpus scales, so the Σ C(|cell|,2) candidate bound grows
    * linearly in n instead of quadratically. Floored at 16 so tiny
    * corpora keep enough cell keys for join parallelism. Every IVF
    * entry point accepts `nlist ≤ 0` to mean "derive via this rule
    * from the corpus count" — turning the documented practice into
    * default behavior instead of a knob a caller must remember. */
  def suggestNlist(n: Long, targetCellSize: Long = DefaultIvfCellTarget): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive, got $targetCellSize")
    val raw = (n + targetCellSize - 1) / targetCellSize
    math.max(16L, math.min(Int.MaxValue.toLong, raw)).toInt
  }

  /** `nlist ≤ 0` ⇒ derive via [[suggestNlist]]. The count is one
    * columnar aggregate (parquet row-group metadata when the corpus is
    * a plain scan) against an operator that was about to run Lloyd
    * iterations over the same frame — noise, not a new pass. */
  private[ops] def resolveNlist(corpus: DataFrame, nlist: Int, opName: String): Int =
    if (nlist > 0) nlist
    else {
      val derived = suggestNlist(corpus.count())
      log.info(s"$opName: nlist ≤ 0 ⇒ derived nlist = $derived " +
        s"(target E|cell| = $DefaultIvfCellTarget; the nlist ∝ n rule)")
      derived
    }

  /** One hot cell's recursive split: its members re-quantize under
    * `cents` (sub-centroid ids re-keyed to `offset + subId`, ranges
    * disjoint from [0, nlist) and from every other split). */
  private[graft] case class HotSplit(cell: Int, offset: Int, cents: Seq[Seq[Double]])

  /** The WARN the hot-cell guard logs before splitting: the projected
    * candidate volume Σ C(|cell|,2) is the number the silent quadratic
    * blowup hides. Pure function of the measured counts so specs pin
    * it without a fixture job. */
  def hotCellDiagnostic(opName: String, counts: Map[Int, Long], nlist: Int,
                        cap: Long): String = {
    val total = counts.values.sum
    val projected = counts.values.map(c => c.toDouble * (c.toDouble - 1) / 2).sum
    val hot = counts.filter(_._2 > cap)
    val (hc, hn) = if (hot.isEmpty) (-1, 0L) else hot.maxBy(_._2)
    f"$opName hot-cell guard: ${hot.size} of ${counts.size} cells exceed the " +
    f"size cap $cap (hottest: cell $hc with $hn of $total probed members; " +
    f"balanced ≈ ${total / math.max(nlist, 1)}); projected candidate volume " +
    f"Σ C(|cell|,2) ≈ $projected%.3g pairs. Splitting each hot cell with a " +
    "recursive sub-quantizer (cell → offset+subcell) to re-bound the join — " +
    "cell-size skew on clustered corpora is exactly the regime IVF is " +
    "deployed for, and unsplit it is a silent quadratic term plus maximal " +
    "shuffle skew on the cell key."
  }

  /** Detect hot cells in an assignment frame and train one recursive
    * sub-quantizer per hot cell. The detection aggregate shuffles only
    * (cell, count) pairs — ≤ nlist rows reach the driver — and each
    * training job runs [[ivfCentroids]] over one cell's members (hot
    * cells are few by construction). `factor = ∞` disables the guard
    * and costs nothing. Returns Nil when nothing is hot. */
  private[graft] def detectHotSplits(assigned: DataFrame, nlist: Int,
                              idName: String, vName: String, iters: Int,
                              factor: Double, opName: String): Seq[HotSplit] = {
    if (!(factor > 0) || factor.isInfinite) return Nil
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    if (total == 0) return Nil
    val target = math.max(HotCellMinTarget,
      math.ceil(total.toDouble / math.max(nlist, 1)).toLong)
    val cap = math.ceil(factor * target).toLong
    val hot = counts.filter(_._2 > cap).toSeq.sortBy(_._1)
    if (hot.isEmpty) return Nil
    log.warn(hotCellDiagnostic(opName, counts, nlist, cap))
    var offset = nlist
    hot.map { case (cellId, cnt) =>
      val nsplit = math.max(2, math.min(MaxSubCells,
        math.ceil(cnt.toDouble / target).toInt))
      val members = assigned.where(col("cell") === cellId)
        .select(col(idName), col(vName))
      val cents = ivfCentroids(members, nsplit, iters, idName, vName)
      val s = HotSplit(cellId, offset, cents)
      offset += cents.length
      s
    }
  }

  /** Re-key an assignment frame's `cell` column under the hot splits:
    * rows in a hot cell re-probe that cell's sub-quantizer (`width`
    * nearest sub-cells, re-keyed past nlist), everything else keeps
    * its id. `width = 1` preserves partitioning (corpus side of a
    * top-k index); `width ≥ 2` is the boundary-straddle probe (query
    * side, pair generation); `Int.MaxValue` probes every sub-cell —
    * the exhaustive configuration that keeps `nprobe = nlist` exact. */
  private[graft] def applyHotSplits(df: DataFrame, splits: Seq[HotSplit],
                             vName: String, width: Int): DataFrame =
    if (splits.isEmpty) df
    else {
      val refined = splits.foldLeft(array(col("cell")): Column) { case (acc, s) =>
        val w = math.max(1, math.min(width, s.cents.length))
        when(col("cell") === s.cell,
          transform(graft.functions.ivf_probe(col(vName), s.cents, w),
            x => x + lit(s.offset)))
          .otherwise(acc)
      }
      df.withColumn("cell", explode(refined))
    }

  def ivfNearDupPairs(corpus: DataFrame, threshold: Double,
                      nlist: Int = 16, nprobe: Int = 2, iters: Int = 1,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      centroids: Option[Seq[Seq[Double]]] = None,
                      superProbe: Option[Int] = None,
                      hotCellFactor: Double = DefaultHotCellFactor): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val cents = centroids.getOrElse(ivfCentroids(corpus,
      resolveNlist(corpus, nlist, "ivfNearDupPairs"), iters, idCol, vecCol,
      superProbe = superProbe))
    // an empty corpus trains zero centroids; fewer vectors than nprobe
    // train fewer cells than the probe width — clamp, don't crash
    if (cents.isEmpty) return noPairs(corpus, idCol)
    val probed0 = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"),
        explode(probeExpr(col(vecCol), cents, math.min(nprobe, cents.length),
          superProbe)).as("cell"))
    // hot-cell guard: counts run over PROBED membership (that is the
    // Σ C(|cell|,2) candidate bound); both join legs re-key under the
    // same splits, with a 2-wide sub-probe for boundary straddles —
    // the same recall lever nprobe ≥ 2 is at the top level
    val splits = detectHotSplits(probed0, cents.length, "id", "v", iters,
      hotCellFactor, "ivfNearDupPairs")
    val pairWidth = if (nprobe >= cents.length) Int.MaxValue else 2
    val probed = applyHotSplits(probed0, splits, "v", width = pairWidth)
    probed.as("a").join(probed.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .where(col("a.nrm") > 0 && col("b.nrm") > 0 &&
        dot(col("a.v"), col("b.v")) >= lit(threshold) * col("a.nrm") * col("b.nrm"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Incremental embedding near-dup: IVF-bucketed pairs between a NEW
    * batch and an already-indexed corpus — the vector analog of
    * [[Dedup.minhashLshIncremental]], the nightly-batch shape a 100 TB
    * corpus ingests with (re-pairing the whole corpus per batch would
    * price the full job daily).
    *
    * Index semantics, exactly as a deployed IVF index works: each SEEN
    * vector lives in its single nearest-centroid cell (in a deployment
    * this assignment is computed once at ingest and PERSISTED, keyed by
    * centroid version — pass the stored `centroids` so the batch
    * probes the same Voronoi partition the store was built under; see
    * [[graft.streaming.StreamingVecNearDup]] for the persistent twin).
    * Each NEW vector probes its `nprobe` nearest cells; only cross
    * (new × seen) pairs sharing a probed cell materialize, then the
    * same exact scale-free cosine verify as [[ivfNearDupPairs]].
    *
    * `assignNprobe` is MULTIPLE ASSIGNMENT (the standard IVF recall
    * lever at index-build time): each seen vector is indexed into its
    * `assignNprobe` nearest cells, trading store size (×assignNprobe
    * rows of (id, cell) longs — vectors are not duplicated in a
    * columnar store) for boundary-straddle recall without re-probing
    * history. 1 is the classic index; the far-pair demo regime
    * (threshold 0.45 on isotropic vectors — near the all-pairs
    * boundary) needs symmetric generous probing for its exact-match
    * oracle, while planted near-dups at real thresholds pair at
    * assignNprobe = 1, nprobe = 2 (spec-measured).
    *
    * Per-batch cost: |new| × nlist centroid dots + Σ_probed-cells
    * |new ∩ cell| × |seen ∩ cell| candidates — independent of corpus
    * pair count, linear in batch size at fixed E|cell|. A re-ingested
    * id never pairs with itself (`id_a ≠ id_b`); zero vectors never
    * pair (norm guard). Returns (id_a = new, id_b = seen). */
  def ivfNearDupIncremental(newEmb: DataFrame, seenEmb: DataFrame, threshold: Double,
                            nlist: Int = 16, nprobe: Int = 2, iters: Int = 1,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            centroids: Option[Seq[Seq[Double]]] = None,
                            assignNprobe: Int = 1,
                            superProbe: Option[Int] = None): DataFrame = {
    graft.functions.ensureRegistered(newEmb.sparkSession)
    val cents = centroids.getOrElse(ivfCentroids(seenEmb, nlist, iters, idCol,
      vecCol, superProbe = superProbe))
    // empty seen corpus ⇒ no index ⇒ no cross pairs (clamp widths to
    // the trained cell count otherwise — see ivfNearDupPairs)
    if (cents.isEmpty) return noPairs(newEmb, idCol)
    val seen = seenEmb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      explode(probeExpr(col(vecCol), cents,
        math.min(assignNprobe, cents.length), superProbe)).as("cell"))
    val fresh = newEmb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      explode(probeExpr(col(vecCol), cents,
        math.min(nprobe, cents.length), superProbe)).as("cell"))
    fresh.as("a").join(seen.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
      .where(col("a.nrm") > 0 && col("b.nrm") > 0 &&
        dot(col("a.v"), col("b.v")) >= lit(threshold) * col("a.nrm") * col("b.nrm"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Random-hyperplane LSH signature: `bits` seeded ±1 hyperplanes;
    * sign of each projection becomes a signature bit. Delegates to the
    * codegen'd multi-table [[graft.functions.LshSigs]] expression with
    * one table (identical planes and bit order). */
  def lshSignature(vec: Column, bits: Int, dims: Int, seed: Int = 42): Column =
    element_at(graft.functions.lsh_sigs(vec, dims, bits, 1, seed), 1)

  /** (table, signature) bucket rows for every vector: one codegen'd
    * signature pass, then posexplode. Table t's planes are seeded
    * `seed + t`, matching per-table [[lshSignature]] calls. */
  private def lshBuckets(df: DataFrame, idName: String, vecName: String,
                         bits: Int, dims: Int, tables: Int, seed: Int = 42): DataFrame =
    df.select(col(idName), posexplode(
        graft.functions.lsh_sigs(col(vecName), dims, bits, tables, seed)).as(Seq("t", "sig")))

  /** ANN top-k via multi-table LSH: `tables` independent signatures of
    * `bits` hyperplanes each (distinct seeds); candidates = union over
    * tables of same-bucket vectors, then exact cosine rank within
    * candidates. Recall ≈ 1-(1-p^bits)^tables for per-bit agreement p.
    * On unclustered (near-random) embeddings LSH recall is inherently
    * modest — that is the worst case; real corpora cluster. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dims: Int,
              tables: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val sigCorpus = lshBuckets(
      corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id", "n_vec",
      bits, dims, tables)
    val sigQ = lshBuckets(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")), "q_id", "q_vec",
      bits, dims, tables)
    // dedup on bare (q_id, n_id) — running distinct over rows that carry
    // the vectors would shuffle ~dims×4 bytes per candidate copy; the
    // vectors join back once per unique candidate. Join strategy is left
    // to the planner: a small query table auto-broadcasts from stats, a
    // huge one degrades to a shuffle join instead of OOMing the driver.
    val cands = sigQ.join(sigCorpus, Seq("t", "sig"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id")).distinct()
    // norms precomputed per vector, not per pair: cosine() inline would
    // run three dot products per candidate (dot(q,n), dot(q,q), dot(n,n))
    val scored = cands
      .join(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_nrm")), "q_id")
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        norm(col(vecCol)).as("n_nrm")), "n_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * storage/bandwidth reduction for vector corpora (4× smaller than
    * float32, dot products stay SIMD-friendly). Per-vector scale
    * s = 127/max|v|, q_i = floor(v_i·s + 0.5) (explicit floor-of-
    * shifted, not round(), so any engine reproduces the exact IEEE
    * result). Zero vectors quantize to zeros with scale 0. Emits
    * summary columns rather than the array so results are
    * hash-comparable. Pure per-row expressions, no shuffle; each
    * intermediate is projected once (HOF subtrees are not CSE'd). */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .select(col(idCol), col("v"),
        array_max(transform(col("v"), abs(_))).as("m"))
      .select(col(idCol), col("m"),
        transform(col("v"),
          x => when(col("m") === 0.0, 0L)
            .otherwise(floor(x * (lit(127.0) / col("m")) + 0.5).cast("long"))).as("q"))
      .select(
        col(idCol),
        // scale ×1e4 as an integer: floor(x·1e4 + 0.5) is exact IEEE in
        // any engine, unlike decimal display rounding
        when(col("m") === 0.0, 0L)
          .otherwise(floor(lit(127.0) / col("m") * 10000.0 + 0.5).cast("long"))
          .as("scale_e4"),
        aggregate(col("q"), lit(0L), _ + _).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))

  /** Per-component fixed-point scale of the Lloyd mean: components are
    * float32 (|x| small), so ×2^30 sums stay far from Long overflow up
    * to ~2^32 vectors per cell while keeping ~9 decimal digits — more
    * precision than the float32 inputs carry. */
  private val CentroidQuant = 1L << 30

  /** Deterministic IVF coarse quantizer: init = the nlist lowest-id
    * vectors, then `iters` Lloyd steps with cosine assignment (the
    * per-cell mean, renormalized; empty cells keep their centroid).
    * Centroid count is tiny, so the per-step reduce is one
    * groupBy(cell, dim) over posexploded vectors and a driver-side
    * collect of nlist×dims values — the k-means pattern at any scale.
    *
    * BIT-deterministic, not just logically so: the per-cell mean sums
    * components as ×2^30 fixed-point LONGS (exact integer addition is
    * order-independent, where a double `avg` depends on partition and
    * merge order), so reruns under any partitioning yield identical
    * centroids — and identical downstream cell assignments. That
    * matters because boundary vectors sit arbitrarily close to Voronoi
    * edges: with float means, a re-run could flip one assignment and
    * change which candidate pairs the oracle-checked near-dup queries
    * see. */
  def ivfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   sampleInit: Boolean = false,
                   superProbe: Option[Int] = None): Seq[Seq[Double]] = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    def normalized(v: Seq[Double]): Seq[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum) max 1e-12
      v.map(_ / nrm)
    }
    // `sampleInit` draws the seed vectors UNIFORMLY across the corpus
    // (smallest xxhash64(id) — deterministic, distributed TakeOrdered,
    // no global sort) instead of the first nlist ids. First-k init is
    // fine for a one-shot build, but a RETRAIN over base ∪ appended
    // corpus never seeds a centroid inside the appended id range, so
    // concentrated new mass stays one hot cell no matter how far nlist
    // grows (§G11) — hash-sampled init seeds proportionally to mass
    // and lets Lloyd split it. Kept opt-in: the oracle queries replay
    // first-k init in SQL.
    val seedOrder =
      if (sampleInit) Seq(xxhash64(col(idCol)), col(idCol)) else Seq(col(idCol))
    var cents: Seq[Seq[Double]] = corpus.orderBy(seedOrder: _*).limit(nlist)
      .select(col(vecCol)).collect()
      .map(r => normalized(r.getSeq[Number](0).map(_.doubleValue()))).toSeq
    // an empty corpus trains no quantizer — return the empty set
    // rather than building a Lloyd plan over zero centroids (callers
    // treat it as "no index": no pairs, no neighbors)
    if (cents.isEmpty) return cents
    for (_ <- 0 until iters) {
      // `superProbe` runs the Lloyd ASSIGNMENT through the two-level
      // probe (≈ 3·√nlist dots/vector instead of nlist) — hierarchical
      // k-means, the same approximation FAISS-style IMI trainers use;
      // the super-grouping rebuilds per iteration from the current
      // centroids (driver-side k-means over nlist tiny points)
      val assigned = corpus.select(
        element_at(probeExpr(col(vecCol), cents, 1, superProbe), 1).as("cell"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      val sums = assigned.groupBy("cell", "dim")
        .agg(sum(round(col("x").cast("double") * CentroidQuant).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (sums.contains((c, 0)))
          normalized(old.indices.map { d =>
            val (sq, n) = sums((c, d))
            sq.toDouble / (n.toDouble * CentroidQuant)
          })
        else old
      }
    }
    cents
  }

  /** ANN top-k via IVF: corpus vectors live in their nearest-centroid
    * cell; each query probes its `nprobe` nearest cells and ranks
    * exactly within them. Cells partition the corpus, so candidates
    * need no dedup. `nprobe = nlist` degenerates to an exact full scan
    * (the oracle configuration on this unclustered corpus — see
    * lshTopK's note: random embeddings are the worst case for any
    * partition-pruned ANN; clustered real corpora are the win case). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              hotCellFactor: Double = DefaultHotCellFactor,
              superProbe: Option[Int] = None,
              centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    ivfTopKImpl(corpus, queries, k, nlist, nprobe, iters, idCol, vecCol,
      hotCellFactor, excludeLabel = None, superProbe = superProbe,
      centroids = centroids)

  private def ivfTopKImpl(corpus: DataFrame, queries: DataFrame, k: Int,
                          nlist: Int, nprobe: Int, iters: Int,
                          idCol: String, vecCol: String,
                          hotCellFactor: Double,
                          excludeLabel: Option[String],
                          superProbe: Option[Int] = None,
                          centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    // pinned centroids = the serve shape: train once (ivfCentroids or a
    // persisted index), answer every batch of queries with ZERO
    // training jobs — mirrors ivfNearDupPairs' `centroids`
    val cents = centroids.getOrElse(
      ivfCentroids(corpus, resolveNlist(corpus, nlist, "ivfTopK"),
        iters, idCol, vecCol, superProbe = superProbe))
    // empty corpus ⇒ no index ⇒ no neighbors for any query
    if (cents.isEmpty)
      return queries.select(col(idCol).as("q_id"), lit(0L).as("rank"),
        col(idCol).as("n_id")).limit(0)
    val nLabel = excludeLabel.map(l => Seq(col(l).as("n_label"))).getOrElse(Nil)
    val qLabel = excludeLabel.map(l => Seq(col(l).as("q_label"))).getOrElse(Nil)
    val assigned0 = corpus.select(Seq(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"),
      element_at(probeExpr(col(vecCol), cents, 1, superProbe), 1).as("cell"))
      ++ nLabel: _*)
    // hot-cell guard: a hot cell here means every query probing it
    // scans |cell| candidates (and corpus-as-queries kNN builds go
    // quadratic in it). Corpus side re-keys at width 1 — cells stay a
    // partition of the corpus, candidates stay dedup-free; the query
    // side probes 2 sub-cells for boundary recall, or EVERY sub-cell
    // when nprobe = nlist so the exhaustive configuration stays exact.
    val splits = detectHotSplits(assigned0, cents.length, "n_id", "n_vec", iters,
      hotCellFactor, "ivfTopK")
    val assigned = applyHotSplits(assigned0, splits, "n_vec", width = 1)
    val qWidth = if (nprobe >= cents.length) Int.MaxValue else 2
    val probed = applyHotSplits(
      queries.select(Seq(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_nrm"),
        explode(probeExpr(col(vecCol), cents,
          math.min(nprobe, cents.length), superProbe)).as("cell")) ++ qLabel: _*),
      splits, "q_vec", width = qWidth)
    // join strategy left to the planner (small probe sets auto-broadcast);
    // norms precomputed per vector — see lshTopK
    val scored = probed.join(assigned, "cell")
      .where(col("q_id") =!= col("n_id"))
      .where(excludeLabel.map(_ => col("q_label") =!= col("n_label"))
        .getOrElse(lit(true)))
      .select(col("q_id"), col("cell"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    // Cell-local prune before the global top-k: the global k best are a
    // subset of each probed cell's k best, so the (q_id, cell) window
    // — whose ClusteredDistribution the cell equi-join's partitioning
    // already satisfies on the shuffle-join path (hashpartitioning on
    // a SUBSET of the window keys ⇒ no new exchange, just a sort) —
    // shrinks the global window's shuffle from |candidates| rows
    // (n·nprobe·E|cell| — the term that dominates corpus-as-queries
    // kNN-graph builds) to k per probed cell.
    val wLocal = Window.partitionBy(col("q_id"), col("cell"))
      .orderBy(col("sim").desc, col("n_id").asc)
    val pruned = scored.withColumn("lr", row_number().over(wLocal))
      .where(col("lr") <= k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    pruned.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
  }

  /** kNN graph: every corpus vector's k nearest neighbors — the
    * corpus-as-queries self top-k that clustering / graph-dedup
    * pipelines start from. Same plan as [[ivfTopK]] (the probe side is
    * the corpus itself; candidates stay cell-bounded), same exact
    * degenerate configuration at `nprobe = nlist`. */
  def knnGraph(corpus: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
               iters: Int = 1,
               idCol: String = "vec_id", vecCol: String = "embedding",
               hotCellFactor: Double = DefaultHotCellFactor,
               superProbe: Option[Int] = None,
               centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    ivfTopK(corpus, corpus, k, nlist, nprobe, iters, idCol, vecCol, hotCellFactor,
      superProbe, centroids)

  /** Mutual-kNN edges: unordered pairs (id_a < id_b) where EACH vector
    * lists the other in its top-k — the standard symmetrization that
    * drops hub-to-orphan edges before graph clustering (a hub appears
    * in thousands of top-k lists; mutuality keeps only genuinely
    * reciprocal affinity). One self-join over the k·|corpus| edge
    * frame, checkpoint-shared so the graph builds once. */
  def mutualKnnPairs(corpus: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
                     iters: Int = 1,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     superProbe: Option[Int] = None,
                     centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val g = knnGraph(corpus, k, nlist, nprobe, iters, idCol, vecCol,
      DefaultHotCellFactor, superProbe, centroids)
      .select(col("q_id"), col("n_id"))
      .sharedCheckpoint(eager = true) // both sides of the mutuality join
    g.as("a").join(g.as("b"),
        col("a.q_id") === col("b.n_id") && col("a.n_id") === col("b.q_id") &&
          col("a.q_id") < col("a.n_id"))
      .select(col("a.q_id").as("id_a"), col("a.n_id").as("id_b"))
  }

  /** Semantic clusters: connected components over the mutual-kNN graph
    * — [[mutualKnnPairs]] composed with [[Dedup.dupClusters]] (the
    * same hybrid driver-union-find / label-propagation closure the
    * text near-dup path uses). Returns (vec_id, cluster_id) for every
    * vector in at least one mutual edge; cluster_id is the component's
    * minimum vec_id. */
  def semanticClusters(corpus: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
                       iters: Int = 1,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       superProbe: Option[Int] = None,
                       centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    Dedup.dupClusters(mutualKnnPairs(corpus, k, nlist, nprobe, iters, idCol, vecCol,
      superProbe, centroids))
      .select(col("doc_id").as(idCol), col("cluster_id"))

  /** PageRank-style centrality over an undirected edge frame (id_a,
    * id_b) — the "representativeness" score data-selection pipelines
    * rank by after building the mutual-kNN graph: central vectors sit
    * in dense, well-connected semantic neighborhoods (prototypical
    * examples); low-rank vectors are peripheral (outliers, noise, or
    * rare-but-novel content, depending on what the caller wants to
    * keep). Damping 0.85 as 17/20 in INTEGER arithmetic: ranks are
    * ×1e6 longs, each contribution floors `(r·17) div (20·deg)`, so
    * every iteration is an exact, partition-order-independent integer
    * sum any engine replays bit-for-bit (same discipline as the text
    * side's quantized-log scores). Returns (vec_id, degree, rank_e6)
    * for every endpoint; `iters` fixed power steps (default 3 — ranks
    * are an ORDERING signal, not a convergence study).
    *
    * Scale: per iteration one hash join of the symmetrized edge frame
    * (2·|E| rows of three longs) against the node-sized rank frame and
    * one groupBy on the node key — both partition on the same key, and
    * the frame sizes never grow with iterations. On a mutual-kNN graph
    * |E| ≤ k·n by construction, so 100 TB cost is iters · O(k·n)
    * shuffled longs.
    */
  def edgeCentrality(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // lazy-safe: chain-fused — deg's EAGER checkpoint right below is
    // the first consuming action and reads sym from its one groupBy
    // site; the per-round joins then read materialized blocks
    val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      .sharedCheckpoint(eager = false)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg")).sharedCheckpoint(eager = true)
    var rank = deg.select(col("u").as("v"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      rank = sym
        .join(rank.select(col("v").as("u"), col("r")), "u")
        .join(deg, "u")
        .select(col("v"), expr("(r * 17L) DIV (20L * deg)").as("c"))
        .groupBy("v").agg((lit(150000L) + sum(col("c"))).as("r"))
        // lazy-safe: each round's rank frame is consumed at ONE site (the next round's join, or the single final join)
        .sharedCheckpoint(eager = false)
    }
    rank.join(deg.select(col("u").as("v"), col("deg")), "v")
      .select(col("v").as("vec_id"), col("deg").as("degree"), col("r").as("rank_e6"))
  }

  /** Cluster-balanced (semantic-stratified) sampling: assign every
    * vector to its nearest pinned centroid by cosine (ties → lowest
    * centroid index, the argmax-first rule), then keep the `perCell`
    * deterministic-lowest-hash members of each cell — the "diversity
    * sample" that caps any one semantic region's share of a training
    * mix, where a plain hash sample would reproduce the corpus's own
    * cluster imbalance. Centroids are caller-pinned (typically
    * [[ivfCentroids]] output, or k exemplar vectors), so the selection
    * is reproducible run-to-run and engine-to-engine; the per-cell
    * pick reuses [[Sampling.stratifiedSample]]'s integer hash order.
    * Returns (cell, rk, `idCol`), rk = 1-based rank within the cell.
    *
    * Scale: assignment is a per-row argmax against plan-literal
    * centroids — no join, no shuffle, whole-stage codegen; the only
    * exchange is the per-cell top-k window (k·|cells| survivors). A
    * hot cell costs one partition's sort, never a candidate blowup —
    * there is no pair generation here.
    */
  def clusterBalancedSample(corpus: DataFrame, centroids: Seq[Seq[Double]],
                            perCell: Int, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(perCell > 0, s"perCell must be positive, got $perCell")
    graft.functions.ensureRegistered(corpus.sparkSession)
    val sims = array(centroids.map(c => cosine(col(vecCol), typedlit(c))): _*)
    val assigned = corpus
      .select(col(idCol), (array_position(sims, array_max(sims)) - 1L).as("cell"))
    Sampling.stratifiedSample(assigned, "cell", perCell, idCol)
      .select(col("cell"), col("rk"), col(idCol))
  }

  /** Per-dimension embedding drift between two corpus snapshots — the
    * monitoring table an embedding-backed pipeline checks after
    * re-crawls, encoder upgrades, or source-mix changes: a dimension
    * whose corpus mean moved is a feature the new data distributes
    * differently (encoder regressions show up as MANY dimensions
    * moving at once). One row per dimension: snapshot counts, mean
    * activation per side (4 dp), and the absolute shift.
    *
    * Numerics: per-row values quantize to ×1e6 longs, so the per-dim
    * sums are exact integers (partition-order-independent — the same
    * discipline as every quantized mean in this repo); the only float
    * work is the final rounded divisions, identical in any engine.
    *
    * Scale: one posexplode each side — (dim, long) pairs shuffle to a
    * dims-sized aggregate; nothing grows with corpus size except the
    * linear scan. The dims-row result joins dims-on-dims.
    */
  def dimensionDrift(embA: DataFrame, embB: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    def sums(df: DataFrame): DataFrame = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1e6).cast("long").as("xe6"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("xe6").as("s"))
    def mean(s: Column, n: Column): Column =
      round(s.cast("double") / 1e6 / n.cast("double"), 4)
    sums(embA).as("a").join(sums(embB).as("b"), "dim")
      .select(col("dim"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        mean(col("a.s"), col("a.n")).as("mean_a"),
        mean(col("b.s"), col("b.n")).as("mean_b"),
        round(abs(mean(col("a.s"), col("a.n")) - mean(col("b.s"), col("b.n"))), 4)
          .as("shift"))
  }

  /** Embedding-space anisotropy diagnostic (Ethayarajh 2019 /
    * Mu & Viswanath 2018): how concentrated the corpus is around its
    * mean direction. An isotropic embedding cloud has ‖μ‖² ≈ 0; a
    * collapsed one (every vector pointing the same way — the classic
    * failure of an undertrained or over-regularized encoder, and the
    * regime where cosine similarity stops discriminating) has
    * ‖μ‖² ≈ E‖x‖². One row out on quantized-integer arithmetic
    * (components → e3 fixed point, [[signProject]]'s convention, so
    * any engine replays it exactly): n, dims, mu_energy = Σ_j S_j²
    * with S_j the per-dimension component sum, total_energy = Σ q²,
    * and anisotropy_e6 = ‖μ‖²/mean‖x‖² = Σ S_j²/(n·Σ q²) as
    * (mu_energy div n) · 10⁶ div total_energy — the ratio every
    * embedding-health dashboard should chart before trusting a
    * cosine-threshold dedup run.
    *
    * Scale: one posexplode → per-dimension aggregate (dims rows) →
    * single-row reduce; map-side partials everywhere, nothing but
    * (dim, sums) longs shuffle. */
  def anisotropy(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val perDim = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim"), round(col("x") * 1000).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("s"),
        sum(col("q") * col("q")).as("e"))
    perDim.agg(max("n").as("n"), count(lit(1)).as("dims"),
      sum(col("s") * col("s")).as("mu_energy"),
      sum("e").as("total_energy"))
      .select(col("n"), col("dims"), col("mu_energy"), col("total_energy"),
        expr("CASE WHEN n = 0 OR total_energy = 0 THEN 0 " +
          "ELSE (mu_energy div n) * 1000000 div total_energy END")
          .as("anisotropy_e6"))
  }

  /** Matryoshka / dimension-prefix serve evaluation: recall@k of
    * brute-force cosine ranking over the FIRST `p` dimensions against
    * the full-dimension ranking, for each prefix width — the "can we
    * serve at 1/8th the vector bytes" question MRL-style embedding
    * models are trained to answer (truncation is the standard
    * cost/recall lever: a dim-prefix index reads p/d of the bytes and
    * prices dots at p/d the flops). Returns one row per prefix:
    * (dims, n_hits, recall_e6) — exact integers over the overlap of
    * (q_id, n_id) pairs, so any engine reproduces the row bit-for-bit.
    *
    * Scale: one |queries|-broadcast scored pass per prefix (the
    * [[bruteForceTopK]] plan) — prefixes.length passes over the corpus
    * with column pruning down to the sliced vector; the ground-truth
    * frame computes once and is shared. */
  def dimPrefixRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                      prefixes: Seq[Int],
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(prefixes.nonEmpty, "dimPrefixRecall needs at least one prefix width")
    import Checkpoints.SharedOps
    val truth = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("q_id"), col("n_id")).sharedCheckpoint(eager = true)
    val per = prefixes.map { p =>
      val c = corpus.select(col(idCol), slice(col(vecCol), 1, p).as(vecCol))
      val q = queries.select(col(idCol), slice(col(vecCol), 1, p).as(vecCol))
      bruteForceTopK(c, q, k, idCol, vecCol)
        .join(truth, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(p).as("dims"), col("n_hits"))
    }.reduce(_ unionAll _)
    val denom = broadcast(truth.groupBy().agg(count(lit(1)).as("__total")))
    per.crossJoin(denom) // audited single-row broadcast
      .select(col("dims"), col("n_hits"),
        expr("n_hits * 1000000 div __total").as("recall_e6"))
      .orderBy("dims")
  }

  /** Dim-prefix IVF serve — the serve-side sibling of
    * [[dimPrefixRecall]] (Matryoshka / MRL serving, Kusupati et al.
    * 2022, public): the ENTIRE probe stage — centroid training, cell
    * assignment, probe ranking, and the in-cell candidate shortlist —
    * runs on the first `prefix` dims (p/d of the bytes read, p/d of the
    * flops per dot), then ONLY the shortlist survivors are reranked
    * exactly at full width. This is the cheap-probe lever a serve fleet
    * sizes with once [[dimPrefixRecall]] says "p = 16 is fine": the
    * dominant probe term shrinks by d/p while the final ranking stays
    * full-precision.
    *
    * Exactness envelope (the oracle configuration, mirroring
    * [[ivfTopK]]'s): at `nprobe = nlist` and `rerank ≥ |corpus|` the
    * shortlist covers every candidate regardless of prefix geometry,
    * and the full-dim rerank IS brute force — so the result equals
    * [[bruteForceTopK]] bit-for-bit even at a narrow prefix. In the
    * pruned configuration recall follows the prefix's
    * [[dimPrefixRecall]] curve (spec-measured).
    *
    * Scale: the prefix shortlist is [[ivfTopK]]'s plan over sliced
    * vectors (cell-bounded candidates, hot-cell guard, local-then-
    * global top-k) with k = `rerank`; the full-width pass touches only
    * |queries| × rerank id-joined rows — the corpus's full vectors are
    * read once for the survivors, never scanned. Composes with a PQ
    * store via [[graft.ops.PqIndexStore.topK]]'s `probePrefix`: the
    * store's query-side cell ranking runs on the first p dims while
    * stored cells/codes/rerank stay full-width (spec-pinned exact at
    * the exhaustive config). */
  def dimPrefixTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    prefix: Int, nlist: Int = 16, nprobe: Int = 4,
                    rerank: Int = 50, iters: Int = 1,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    hotCellFactor: Double = DefaultHotCellFactor,
                    superProbe: Option[Int] = None,
                    centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(prefix >= 1, s"prefix width must be >= 1, got $prefix")
    require(rerank >= k, s"rerank $rerank must be >= k = $k")
    graft.functions.ensureRegistered(corpus.sparkSession)
    def sliced(df: DataFrame): DataFrame =
      df.select(col(idCol), slice(col(vecCol), 1, prefix).as(vecCol))
    // stage 1 (prefix space): IVF shortlist of `rerank` candidates per
    // query — inherits ivfTopK's whole plan (probe, hot-split, pruning)
    val shortlist = ivfTopKImpl(sliced(corpus), sliced(queries), rerank,
      nlist, nprobe, iters, idCol, vecCol, hotCellFactor,
      excludeLabel = None, superProbe = superProbe, centroids = centroids)
      .select(col("q_id"), col("n_id"))
    // stage 2 (full width): exact rerank of the survivors — full
    // vectors enter by id join, |queries| × rerank rows, one shuffle
    val cFull = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    val qFull = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm")))
    val scored = shortlist.join(cFull, "n_id").join(qFull, "q_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
  }

  /** [[edgeCentrality]] over the [[mutualKnnPairs]] graph. */
  def knnCentrality(corpus: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
                    powerIters: Int = 3, ivfIters: Int = 1,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    edgeCentrality(mutualKnnPairs(corpus, k, nlist, nprobe, ivfIters, idCol, vecCol),
      powerIters)

  /** OPQ rotation (Ge et al. 2014, public algorithm): a d×d orthogonal
    * R minimizing the PQ reconstruction error of R·x — alternate
    * (1) per-subspace k-means on the rotated sample and (2) the
    * orthogonal Procrustes update R = U·Vᵀ from SVD(Y·Xᵀ), where Y is
    * the quantized reconstruction. Plain PQ partitions dims into m
    * fixed blocks; on anisotropic embeddings a block spanning only
    * low-variance dims wastes its ksub codewords — the rotation
    * redistributes variance so every subspace carries signal.
    *
    * Runs ENTIRELY on the driver over a hash-sampled `sampleCap`
    * subset (unit-normalized — the geometry every PQ consumer here
    * uses): 5 alternations × m × n_s × ksub × dsub flops, seconds at
    * the default sizes, zero Spark jobs. Deterministic: fixed sample
    * (smallest xxhash64), first-k codeword init, fixed Jacobi sweep
    * order. Apply with [[rotated]]; because R is orthogonal, dots and
    * cosines are preserved exactly, so coarse assignment, rerank, and
    * every recall property are unchanged in rotated coordinates —
    * ONLY the subspace partition (and hence PQ fidelity) changes. */
  def opqRotation(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                  alternations: Int = 5, kmeansIters: Int = 4,
                  sampleCap: Int = 10000,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val rows = corpus.orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleCap)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    require(rows.nonEmpty, "opqRotation: empty corpus")
    val d = rows.head.length
    require(d % m == 0, s"dims $d not divisible into $m subspaces")
    val dsub = d / m
    val x = rows.map { v =>
      val nrm = math.max(math.sqrt(v.map(a => a * a).sum), 1e-12)
      v.map(_ / nrm)
    }
    val n = x.length
    var rot = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def mul(mat: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += mat(i)(j) * v(j); j += 1 }
        out(i) = s; i += 1
      }
      out
    }
    for (_ <- 0 until alternations) {
      val z = x.map(mul(rot, _))
      // per-subspace deterministic k-means → quantized reconstruction y
      val y = Array.fill(n)(new Array[Double](d))
      for (j <- 0 until m) {
        val off = j * dsub
        val kEff = math.min(ksub, n)
        val cb = Array.tabulate(kEff, dsub)((c, t) => z(c)(off + t))
        val assign = new Array[Int](n)
        for (_ <- 0 until kmeansIters) {
          var i = 0
          while (i < n) {
            var best = 0; var bestD = Double.MaxValue; var c = 0
            while (c < kEff) {
              var s = 0.0; var t = 0
              while (t < dsub) { val e = z(i)(off + t) - cb(c)(t); s += e * e; t += 1 }
              if (s < bestD) { bestD = s; best = c }
              c += 1
            }
            assign(i) = best; i += 1
          }
          val sums = Array.fill(kEff, dsub)(0.0)
          val cnt = new Array[Int](kEff)
          var i2 = 0
          while (i2 < n) {
            val c = assign(i2); cnt(c) += 1
            var t = 0
            while (t < dsub) { sums(c)(t) += z(i2)(off + t); t += 1 }
            i2 += 1
          }
          for (c <- 0 until kEff if cnt(c) > 0; t <- 0 until dsub)
            cb(c)(t) = sums(c)(t) / cnt(c)
        }
        var i = 0
        while (i < n) {
          var t = 0
          while (t < dsub) { y(i)(off + t) = cb(assign(i))(t); t += 1 }
          i += 1
        }
      }
      // Procrustes: R = U·Vᵀ from SVD(M), M = Y·Xᵀ (d×d)
      val mm = Array.fill(d, d)(0.0)
      var i = 0
      while (i < n) {
        var r = 0
        while (r < d) {
          val yr = y(i)(r)
          if (yr != 0.0) {
            var c = 0
            while (c < d) { mm(r)(c) += yr * x(i)(c); c += 1 }
          }
          r += 1
        }
        i += 1
      }
      rot = procrustesRotation(mm)
    }
    rot.map(_.toSeq).toSeq
  }

  /** U·Vᵀ of the input via deterministic one-sided Jacobi SVD —
    * the orthogonal Procrustes solution (also orthogonal when the
    * input is rank-deficient: zero-norm columns keep their rotated
    * basis direction). Driver-side, d ≤ a few hundred. */
  private[graft] def procrustesRotation(mIn: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mIn.length
    // column-major copies: a(:,k) mutated in place, v accumulates V
    val a = Array.tabulate(d, d)((r, c) => mIn(r)(c))
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    def colDot(p: Int, q: Int): Double = {
      var s = 0.0; var r = 0
      while (r < d) { s += a(r)(p) * a(r)(q); r += 1 }
      s
    }
    var sweep = 0
    var rotated = true
    while (sweep < 60 && rotated) {
      rotated = false
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val app = colDot(p, p); val aqq = colDot(q, q); val apq = colDot(p, q)
        if (math.abs(apq) > 1e-14 * math.sqrt(app * aqq) && apq != 0.0) {
          rotated = true
          val zeta = (aqq - app) / (2.0 * apq)
          val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
          val cs = 1.0 / math.sqrt(1.0 + t * t)
          val sn = cs * t
          var r = 0
          while (r < d) {
            val ap = a(r)(p); val aq = a(r)(q)
            a(r)(p) = cs * ap - sn * aq
            a(r)(q) = sn * ap + cs * aq
            val vp = v(r)(p); val vq = v(r)(q)
            v(r)(p) = cs * vp - sn * vq
            v(r)(q) = sn * vp + cs * vq
            r += 1
          }
        }
      }
      sweep += 1
    }
    // U columns = normalized columns of the rotated A. Zero-singular
    // columns have NO left singular direction (V's column spans the
    // row null space, which is not orthogonal to the column space —
    // copying it would make R non-orthogonal whenever M is rank
    // deficient, e.g. an OPQ sample with fewer vectors than dims), so
    // they complete deterministically by Gram–Schmidt: first the V
    // direction, then standard basis vectors, orthogonalized against
    // every filled U column.
    val u = Array.fill(d, d)(0.0)
    val filled = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (k <- 0 until d) {
      val nrm = math.sqrt(colDot(k, k))
      if (nrm > 1e-12) {
        var r = 0
        while (r < d) { u(r)(k) = a(r)(k) / nrm; r += 1 }
        filled += k
      }
    }
    for (k <- 0 until d if !filled.contains(k)) {
      val candidates =
        Iterator.single(Array.tabulate(d)(r => v(r)(k))) ++
          Iterator.tabulate(d)(e => Array.tabulate(d)(r => if (r == e) 1.0 else 0.0))
      val col = candidates.map { cand =>
        val w = cand.clone()
        filled.foreach { j =>
          var dot = 0.0; var r = 0
          while (r < d) { dot += w(r) * u(r)(j); r += 1 }
          r = 0
          while (r < d) { w(r) -= dot * u(r)(j); r += 1 }
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 1e-8) Some(w.map(_ / nrm)) else None
      }.collectFirst { case Some(w) => w }.get
      var r = 0
      while (r < d) { u(r)(k) = col(r); r += 1 }
      filled += k
    }
    // R = U·Vᵀ
    Array.tabulate(d, d) { (r, c) =>
      var s = 0.0; var k = 0
      while (k < d) { s += u(r)(k) * v(c)(k); k += 1 }
      s
    }
  }

  /** The corpus with `vecCol` replaced by its [[opqRotation]] image —
    * compose with any PQ entry point: train/encode/serve on the
    * rotated frame and every result (ids, ranks, recalls at the
    * exhaustive config) is geometrically identical, with PQ fidelity
    * improved by the variance redistribution. */
  def rotated(df: DataFrame, rotation: Seq[Seq[Double]],
              vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(df.sparkSession)
    df.withColumn(vecCol, graft.functions.vec_rotate(col(vecCol), rotation))
  }

  /** Deterministic per-subspace PQ codebooks (m × ksub × dsub): init =
    * the ksub lowest-id vectors' subvectors, then `iters` Lloyd steps
    * with squared-L2 assignment over UNIT-NORMALIZED vectors (so ADC
    * order matches cosine order downstream; empty codewords persist).
    * Same bit-determinism contract as [[ivfCentroids]]: per-codeword
    * means sum as ×2^30 fixed-point longs, so any partitioning yields
    * identical codebooks and identical downstream codes. One Spark job
    * per iteration covers all m subspaces (posexplode of the code
    * array, then of the assigned subvector). */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 1,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  normalize: Boolean = true,
                  sampleInit: Boolean = false): Seq[Seq[Seq[Double]]] = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    def normalized(v: Seq[Double]): Seq[Double] =
      if (!normalize) v
      else {
        val nrm = math.sqrt(v.map(x => x * x).sum) max 1e-12
        v.map(_ / nrm)
      }
    // hash-sampled seed codewords for retrains — see [[ivfCentroids]]
    val seedOrder =
      if (sampleInit) Seq(xxhash64(col(idCol)), col(idCol)) else Seq(col(idCol))
    val init = corpus.orderBy(seedOrder: _*).limit(ksub)
      .select(col(vecCol)).collect()
      .map(r => normalized(r.getSeq[Number](0).map(_.doubleValue()))).toSeq
    if (init.isEmpty) return Seq.empty
    val dims = init.head.length
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val dsub = dims / m
    var cbs: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => init.map(_.slice(j * dsub, (j + 1) * dsub)))
    val kEff = init.length // codebook width is fixed at init
    for (_ <- 0 until iters) {
      val assigned = corpus
        .select(col(vecCol).as("v"),
          (if (normalize) greatest(norm(col(vecCol)), lit(1e-12))
           else lit(1.0)).as("nrm"),
          posexplode(graft.functions.pq_unpack(
            graft.functions.pq_encode(col(vecCol), cbs, normalize), m, kEff))
            .as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("v"), col("j") * dsub + 1, lit(dsub))
            .cast("array<double>")).as(Seq("d", "x")),
          col("nrm"))
      val sums = assigned.groupBy("j", "code", "d")
        .agg(sum(round(col("x") / col("nrm") * CentroidQuant).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      cbs = cbs.zipWithIndex.map { case (cb, j) =>
        cb.zipWithIndex.map { case (old, c) =>
          if (sums.contains((j, c, 0)))
            (0 until dsub).map { d =>
              val (sq, n) = sums((j, c, d))
              sq.toDouble / (n.toDouble * CentroidQuant)
            }
          else old
        }
      }
    }
    cbs
  }

  /** ANN top-k via IVF-PQ (IVFADC without residual encoding): corpus
    * vectors live in their IVF cell carrying ONLY their m PQ codes —
    * at d=64 float32 that is a 32× cut (256 B → 8 B) in what the
    * candidate scan shuffles and holds. Each query probes `nprobe`
    * cells, scores candidates by ADC (m table lookups per pair against
    * the query's precomputed LUT), keeps the `rerank` best, and only
    * those join back to the base table for the exact cosine top-k —
    * the full-precision vectors never enter the scan.
    *
    * `nprobe = nlist` with `rerank >= |corpus|` degenerates to the
    * exact scan (the oracle configuration — see [[ivfTopK]]'s note on
    * unclustered corpora); realistic configs trade recall for a scan
    * that reads 1/32nd the bytes of IVF-Flat. */
  /** Trained IVF-PQ artifacts — what a PERSISTED index pins so that
    * serving a query runs ZERO training jobs. `centroids` is the coarse
    * quantizer, `codebooks` the m per-subspace codeword sets, `codes`
    * (when present) the pre-encoded corpus frame (n_id, cell, codes) —
    * the encode-once-at-ingest artifact; without it the corpus is
    * re-encoded per call (one codegen'd pass, no training). `residual`
    * records which encoding the codebooks were trained for — mixing
    * modes would ADC-score garbage, so [[ivfPqTopK]] asserts it.
    * [[PqIndexStore]] persists and versions all three. */
  /** `assignMode` is the RESOLVED assignment geometry the stored codes
    * were built under — `Some(None)` = flat nlist-dot assignment,
    * `Some(Some(w))` = two-level at super-probe width w, outer `None` =
    * not recorded (a pre-mode persisted store). Probing a store with a
    * different geometry than built it silently degrades recall (a
    * vector's nearest cell under the two-level probe can differ from
    * its flat assignment), so [[PqIndexStore]] persists the resolved
    * mode at build time and pins every append/serve to it. */
  case class PqIndexArtifacts(centroids: Seq[Seq[Double]],
                              codebooks: Seq[Seq[Seq[Double]]],
                              codes: Option[DataFrame] = None,
                              residual: Boolean = false,
                              rotation: Option[Seq[Seq[Double]]] = None,
                              assignMode: Option[Option[Int]] = None)

  /** The residual of a vector against its cell centroid, on the unit
    * sphere — classic IVFADC geometry (see [[ivfPqTopK]]). */
  private def residCol(cents: Seq[Seq[Double]])(v: Column, cell: Column): Column = {
    val centsLit = typedlit(cents)
    val unit = transform(v.cast("array<double>"), x => x / greatest(norm(v), lit(1e-12)))
    zip_with(unit, element_at(centsLit, cell + 1), (a, b) => a - b)
  }

  /** (n_id, __v, cell, codes) for a corpus under pinned artifacts: the
    * single-assignment cell and the packed PQ codes (of the vector, or
    * of its cell residual). One codegen'd pass, no training — shared
    * by [[ivfPqTopK]]'s inline path and [[PqIndexStore]]'s
    * build/append (encode-at-ingest). */
  private[graft] def pqEncodedBase(corpus: DataFrame, cents: Seq[Seq[Double]],
                                   cbs: Seq[Seq[Seq[Double]]], residual: Boolean,
                                   idCol: String, vecCol: String,
                                   superProbe: Option[Int] = None): DataFrame =
    if (!residual) corpus.select(col(idCol).as("n_id"), col(vecCol).as("__v"),
      element_at(probeExpr(col(vecCol), cents, 1, superProbe), 1).as("cell"),
      graft.functions.pq_encode(col(vecCol), cbs).as("codes"))
    else corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("__v"),
        element_at(probeExpr(col(vecCol), cents, 1, superProbe), 1).as("cell"))
      .select(col("n_id"), col("__v"), col("cell"),
        graft.functions.pq_encode(residCol(cents)(col("__v"), col("cell")), cbs,
          normalize = false).as("codes"))

  /** Train the PQ codebooks for a corpus (plain or residual mode) —
    * the second of the two training events a fresh [[ivfPqTopK]] call
    * runs, and the one [[PqIndexStore.build]] persists. */
  private[graft] def trainPqCodebooks(corpus: DataFrame, cents: Seq[Seq[Double]],
                                      m: Int, ksub: Int, iters: Int,
                                      residual: Boolean,
                                      idCol: String, vecCol: String,
                                      superProbe: Option[Int] = None,
                                      sampleInit: Boolean = false): Seq[Seq[Seq[Double]]] =
    if (!residual) pqCodebooks(corpus, m, ksub, iters, idCol, vecCol,
      sampleInit = sampleInit)
    else pqCodebooks(
      corpus.select(col(idCol), residCol(cents)(col(vecCol),
        element_at(probeExpr(col(vecCol), cents, 1, superProbe), 1)).as("__res")),
      m, ksub, iters, idCol, "__res", normalize = false, sampleInit = sampleInit)

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
                rerank: Int = 50, iters: Int = 1,
                idCol: String = "vec_id", vecCol: String = "embedding",
                residual: Boolean = false,
                hotCellFactor: Double = DefaultHotCellFactor,
                index: Option[PqIndexArtifacts] = None,
                superProbe: Option[Int] = None,
                probePrefix: Option[Int] = None): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    probePrefix.foreach(p => require(p >= 1, s"probePrefix must be >= 1, got $p"))
    index.foreach { art =>
      require(art.residual == residual,
        s"index artifacts encoded with residual=${art.residual}, call asks $residual")
      require(art.codebooks.isEmpty || art.codebooks.length == m,
        s"index has ${art.codebooks.length} subspaces, call asks $m")
    }
    graft.functions.ensureRegistered(corpus.sparkSession)
    val cents = index.map(_.centroids)
      .getOrElse(ivfCentroids(corpus,
        resolveNlist(corpus, nlist, "ivfPqTopK"), iters, idCol, vecCol,
        superProbe = superProbe))
    if (cents.isEmpty)
      return queries.select(col(idCol).as("q_id"), lit(0L).as("rank"),
        col(idCol).as("n_id")).limit(0)
    // Residual mode = classic IVFADC: encode v − centroid(cell) of the
    // UNIT-normalized vector rather than the vector itself. ADC then
    // approximates ‖(q−c) − (v−c)‖² = ‖q−v‖² — the same cosine order —
    // but the codewords quantize residuals, which concentrate near the
    // origin when cells capture structure, so the same m·ksub budget
    // buys materially less quantization error on clustered corpora.
    // The query-side LUT becomes per PROBED CELL (q's residual differs
    // per cell) — nprobe LUT builds per query instead of one.
    val residOf = residCol(cents) _
    val cbs = index.map(_.codebooks)
      .getOrElse(trainPqCodebooks(corpus, cents, m, ksub, iters, residual,
        idCol, vecCol, superProbe))
    val kEff = cbs.head.length // < ksub on a tiny corpus
    // codes and LUTs are computed under the TOP-LEVEL cell (residual
    // geometry is per Voronoi cell of the coarse quantizer); the
    // hot-cell guard then re-keys only the JOIN key, so a split never
    // changes what a code means — it only re-bounds which rows meet
    val (encoded, splits) = index.flatMap(_.codes) match {
      case Some(stored) =>
        // persisted codes carry their build-time cells: the hot-cell
        // guard belongs to index BUILD/retrain ([[PqIndexStore]] WARNs
        // there) — a serve path must not re-shape a stored Voronoi
        // partition it would then disagree with
        (stored.select(col("n_id"), col("cell"), col("codes")), Seq.empty[HotSplit])
      case None =>
        val base = pqEncodedBase(corpus, cents, cbs, residual, idCol, vecCol,
          superProbe)
        val s = detectHotSplits(base.select(col("n_id"), col("__v"), col("cell")),
          cents.length, "n_id", "__v", iters, hotCellFactor, "ivfPqTopK")
        (applyHotSplits(base, s, "__v", width = 1).drop("__v"), s)
    }
    val qWidth = if (nprobe >= cents.length) Int.MaxValue else 2
    // Dim-prefix probe (the Matryoshka × PQ-store composition,
    // [[dimPrefixTopK]]'s lever applied to a persisted index): the
    // query-side cell RANKING runs on the first `probePrefix` dims of
    // query and centroids — p/d of the probe flops per query — while
    // stored cells, codes, LUTs, and the exact rerank stay full-width.
    // At nprobe ≥ nlist every cell is probed regardless of ranking, so
    // the exhaustive config is unchanged bit-for-bit (spec-pinned).
    def queryProbe(vec: Column): Column = probePrefix match {
      case Some(p) if p < cents.head.length =>
        probeExpr(slice(vec, 1, p), cents.map(_.take(p)),
          math.min(nprobe, cents.length), superProbe)
      case _ =>
        probeExpr(vec, cents, math.min(nprobe, cents.length), superProbe)
    }
    val probedBase =
      if (!residual) queries.select(col(idCol).as("q_id"), col(vecCol).as("__v"),
        graft.functions.pq_lut(col(vecCol), cbs).as("lut"),
        explode(queryProbe(col(vecCol))).as("cell"))
      else queries
        .select(col(idCol).as("q_id"), col(vecCol).as("__v"),
          explode(queryProbe(col(vecCol))).as("cell"))
        .select(col("q_id"), col("__v"), col("cell"),
          graft.functions.pq_lut(residOf(col("__v"), col("cell")), cbs,
            normalize = false).as("lut"))
    val probed = applyHotSplits(probedBase, splits, "__v", width = qWidth)
      .drop("__v")
    val adc = probed.join(encoded, "cell")
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("cell"), col("n_id"),
        graft.functions.pq_adc(col("lut"), col("codes"), m, kEff).as("adist"))
    // same cell-local prune as [[ivfTopK]]: the global rerank set is a
    // subset of each cell's rerank best, and the local window rides
    // the join's cell partitioning — the global window then shuffles
    // rerank rows per probed cell instead of every ADC candidate
    val wLocalAdc = Window.partitionBy(col("q_id"), col("cell"))
      .orderBy(col("adist").asc, col("n_id").asc)
    val adcPruned = adc.withColumn("lr", row_number().over(wLocalAdc))
      .where(col("lr") <= rerank)
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("n_id").asc)
    val cands = adcPruned.withColumn("arank", row_number().over(wAdc))
      .where(col("arank") <= rerank).select("q_id", "n_id")
    // exact re-rank over |queries|·rerank rows only
    val cvec = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    val qvec = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_nrm"))
    val scored = cands.join(cvec, "n_id").join(qvec, "q_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
  }

  /** IVF near-dup pairs with a SYMMETRIC-PQ (SDC, Jégou et al. 2011
    * §III) prefilter — the pair-workload member of the PQ family: the
    * candidate self-join carries each side's PACKED 8-byte codes
    * instead of the full vector, approximates the pair distance as
    * Σ_j T_j[code_a_j][code_b_j] from a plan-literal m·ksub² codeword-
    * pair table (pure built-in bit-ops + array lookups — whole-stage
    * codegen, no custom expression needed), and only pairs whose
    * approximate cosine clears `threshold − sdcMargin` reach the exact
    * verify. At 10⁹ vectors the wide Σ C(|cell|,2) join shuffles
    * 16 B/row instead of ~260 B/row, and the exact cosine — the d-mult
    * term — runs on the SDC-surviving fraction only.
    *
    * Both sides are quantized (vs ADC's exact-query side), so the
    * approximation error is ~2× ADC's: `sdcMargin` is the recall
    * slack, spec-measured on planted near-dups. A margin ≥ 1 +
    * threshold disables the prefilter (every pair verifies exactly —
    * output then equals [[ivfNearDupPairs]] at the same probe
    * geometry, the oracle configuration). Same hot-cell guard and
    * multi-probe semantics as [[ivfNearDupPairs]]; pass pinned
    * `centroids`/`codebooks` (e.g. from [[PqIndexStore]]) to skip both
    * trainings.
    *
    * ADJUDICATION (BASELINE.md §G6, measured at 200k vectors / 64
    * dims): on a single node the flat [[ivfNearDupPairs]] wins 8.5× —
    * its verify runs INLINE in the one cell join, while this plan
    * re-joins survivors to their vectors, and at 64 dims the coarse
    * quantizer can't shrink the survivor frame enough to pay for
    * that. Reach for this operator when the candidate exchange is
    * NETWORK-bound (the 16 B vs 260+ B row is the term that dominates
    * a 1000-executor shuffle), when dims make the exact dot expensive
    * (1024+), or when serving from a persisted code store; at
    * moderate dims on one box, use [[ivfNearDupPairs]]. */
  def ivfPqNearDupPairs(corpus: DataFrame, threshold: Double,
                        nlist: Int = 16, nprobe: Int = 2,
                        m: Int = 8, ksub: Int = 16, iters: Int = 1,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        centroids: Option[Seq[Seq[Double]]] = None,
                        codebooks: Option[Seq[Seq[Seq[Double]]]] = None,
                        sdcMargin: Double = 0.3,
                        hotCellFactor: Double = DefaultHotCellFactor,
                        superProbe: Option[Int] = None): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val cents = centroids.getOrElse(ivfCentroids(corpus,
      resolveNlist(corpus, nlist, "ivfPqNearDupPairs"), iters, idCol, vecCol,
      superProbe = superProbe))
    if (cents.isEmpty) return noPairs(corpus, idCol)
    val cbs = codebooks.getOrElse(
      trainPqCodebooks(corpus, cents, m, ksub, iters, residual = false,
        idCol, vecCol, superProbe))
    if (cbs.isEmpty || cbs.head.isEmpty) return noPairs(corpus, idCol)
    val kEff = cbs.head.length
    // codeword-pair distance tables: T[(j·kEff + a)·kEff + b] =
    // ‖c_ja − c_jb‖² — m·kEff² doubles, shipped once per task via the
    // codegen references array (the equivalent element_at chain over a
    // plan-literal array measured 17× slower per candidate — §G6)
    val tbl: Seq[Double] = (for {
      j <- 0 until cbs.length; a <- 0 until kEff; b <- 0 until kEff
    } yield {
      val ca = cbs(j)(a); val cb = cbs(j)(b)
      var s = 0.0; var d = 0
      while (d < ca.length) { val x = ca(d) - cb(d); s += x * x; d += 1 }
      s
    }).toVector
    def sdcD2(a: Column, b: Column): Column =
      graft.functions.pq_sdc(a, b, tbl, cbs.length, kEff)
    // unit vectors: ‖a−b‖² = 2 − 2·cos ⇒ keep d2 ≤ 2(1 − t + margin)
    val maxD2 = 2.0 * (1.0 - threshold + sdcMargin)
    val probed0 = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.pq_encode(col(vecCol), cbs).as("codes"),
      explode(probeExpr(col(vecCol), cents, math.min(nprobe, cents.length),
        superProbe)).as("cell"))
    val splits = detectHotSplits(probed0, cents.length, "id", "v", iters,
      hotCellFactor, "ivfPqNearDupPairs")
    val pairWidth = if (nprobe >= cents.length) Int.MaxValue else 2
    // the wide join carries (id, cell, codes) ONLY — 16 B of payload
    val slim = applyHotSplits(probed0, splits, "v", width = pairWidth)
      .select("id", "cell", "codes")
    val cand = slim.as("a").join(slim.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .where(sdcD2(col("a.codes"), col("b.codes")) <= lit(maxD2))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // exact verify on survivors only (same scale-free form as
    // ivfNearDupPairs; zero vectors never pair). Multi-probe duplicate
    // candidates ride THROUGH the verify and dedupe at the end: a
    // distinct over the (small) verified pair set beats a full shuffle
    // of every SDC survivor, and duplicates are rare at nprobe ≪ nlist
    val vec = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    cand
      .join(vec.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), "id_a")
      .join(vec.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), "id_b")
      .where(col("na") > 0 && col("nb") > 0 &&
        dot(col("va"), col("vb")) >= lit(threshold) * col("na") * col("nb"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Embedding-space label consistency: each query's label vs the
    * majority label of its k nearest neighbors — the standard
    * label-noise / embedding-quality audit (a high disagreement rate
    * flags mislabeled rows or a poor embedding). Majority ties break
    * deterministically (votes desc, label asc); neighbor ranking
    * inherits [[bruteForceTopK]]'s (sim desc, id asc) order.
    *
    * Output: (q_id, own_label, knn_label, votes, agrees) per query,
    * ordered by q_id. Plan: the top-k frame is |queries|·k rows, so
    * every downstream join/aggregate is query-sized, not corpus-sized.
    */
  def knnLabelAgreement(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    val topk = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val votes = topk
      .join(corpus.select(col(idCol).as("n_id"), col(labelCol).as("n_label")), "n_id")
      .groupBy("q_id", "n_label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("n_label").asc)
    votes.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .join(queries.select(col(idCol).as("q_id"), col(labelCol).as("own_label")), "q_id")
      .select(col("q_id"), col("own_label"), col("n_label").as("knn_label"),
        col("votes"), (col("own_label") === col("n_label")).as("agrees"))
      .orderBy("q_id")
  }

  /** Hard-negative mining for contrastive/embedding training: each
    * query's top-k most-similar corpus vectors with a DIFFERENT label
    * — the highest-loss negatives a triplet/InfoNCE trainer wants in
    * its batches (same-label neighbors are positives, not negatives,
    * so they are excluded before ranking, not after — a query whose
    * entire neighborhood shares its label still gets k true
    * negatives). Output (q_id, rank, n_id), the [[bruteForceTopK]]
    * shape, ranked (sim desc, n_id asc).
    *
    * `nlist = None` is the exact arm: the brute-force scored frame
    * with the label predicate pushed below the ranking window.
    * `Some(nlist)` rides the IVF probe plan ([[ivfTopK]]'s machinery —
    * hot-cell guard, cell-local prune — with the label filter applied
    * inside the cell join, so excluded candidates never reach a
    * window); `Some(0)` derives nlist from the corpus count. At
    * `nprobe ≥ nlist` the IVF arm is exhaustive and equals the exact
    * arm (spec-pinned).
    *
    * NULL labels are excluded on BOTH sides (the `=!=` predicate is
    * null-rejecting): an unlabeled corpus vector never serves as a
    * negative — it might share the query's class — and an unlabeled
    * query gets no negatives rather than arbitrary ones. Label your
    * data or filter nulls upstream if that is not the intent.
    *
    * Scale: labels ride the existing probe/assign frames as one extra
    * column; the filter TIGHTENS every downstream frame (candidates
    * drop before the top-k windows), so the plan is never wider than
    * the unfiltered [[ivfTopK]] at the same config. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label",
                    nlist: Option[Int] = None, nprobe: Int = 4,
                    iters: Int = 1,
                    hotCellFactor: Double = DefaultHotCellFactor,
                    superProbe: Option[Int] = None,
                    centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    nlist match {
      case Some(n) =>
        ivfTopKImpl(corpus, queries, k, n, nprobe, iters, idCol, vecCol,
          hotCellFactor, excludeLabel = Some(labelCol), superProbe = superProbe,
          centroids = centroids)
      case None =>
        graft.functions.ensureRegistered(corpus.sparkSession)
        val q = broadcast(queries.select(col(idCol).as("q_id"),
          col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"),
          col(labelCol).as("q_label")))
        val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
          norm(col(vecCol)).as("n_nrm"), col(labelCol).as("n_label"))
        val scored = q.crossJoin(c)
          .where(col("q_id") =!= col("n_id") &&
            col("q_label") =!= col("n_label"))
          .select(col("q_id"), col("n_id"),
            (dot(col("q_vec"), col("n_vec")) /
              (col("q_nrm") * col("n_nrm"))).as("sim"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id").asc)
        scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
          .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
    }

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
    * embedding-cosine near-dup pairs at `threshold` → connected
    * components over the pair graph → keep exactly one (the min-id)
    * member per component. Returns every corpus id with a `kept` flag,
    * so callers can either filter (`where(kept)`) or audit the drop
    * set; singletons that never paired are kept by construction.
    *
    * Composition, not new machinery: candidate pairs come from
    * [[nearDupPairsAdaptive]] (recall-sized LSH, with the degenerate
    * low-threshold regime routed to the exact block-partitioned plan —
    * no cartesian node either way) or, when `ivfNlist` is set, from
    * [[ivfNearDupPairs]] — the bucket-bounded scale path for large
    * unclustered corpora (see the retained-fraction discussion on
    * [[degenerateLshDiagnostic]]); `Some(0)` derives nlist from the
    * corpus count via [[suggestNlist]] (the nlist ∝ n rule as default
    * behavior);
    * components from [[Dedup.dupClusters]] (bounded driver union-find,
    * else distributed min-label propagation). At 100 TB the only
    * frames that shuffle are (long, long) pairs and the loser-id
    * set — embeddings stay where the bucket join put them, and the
    * final flag join broadcasts only loser ids (bounded by the
    * duplicate count, not the corpus). */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    dims: Int = 64, ivfNlist: Option[Int] = None,
                    ivfNprobe: Int = 2): DataFrame = {
    val pairs = ivfNlist match {
      case Some(nlist) =>
        ivfNearDupPairs(corpus, threshold, nlist, ivfNprobe, idCol = idCol, vecCol = vecCol)
      case None => nearDupPairsAdaptive(corpus, threshold, idCol, vecCol, dims)
    }
    val losers = Dedup.dupClusters(pairs)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol), lit(false).as("kept"))
    corpus.select(col(idCol))
      .join(losers, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Semantic decontamination — the embedding-space twin of
    * [[Dedup.contamination]]'s n-gram check: flag every corpus vector
    * whose cosine to ANY benchmark vector reaches `threshold`.
    * Paraphrased or lightly-rewritten eval items share no 8-token
    * shingle with their source, so they sail through lexical
    * decontamination; in embedding space they sit at cosine ≈ 1 to the
    * benchmark item — this is the release gate that catches them.
    * Returns one row per corpus id with a `kept` flag ([[semanticDedup]]'s
    * contract: filter with `where(kept)` or audit the drop set); ids
    * equal across the two sets are treated as the same item and never
    * pair (the shared-id-space convention of the incremental ops).
    *
    * Composition, not new machinery: cross (corpus × benchmark) pairs
    * come from [[ivfNearDupIncremental]] with the BENCHMARK as the
    * indexed side — eval suites are tiny next to a 100 TB corpus, so
    * the index trains on the small frame and the corpus streams
    * through one probe pass (|corpus| × nlist centroid dots + cell-
    * bounded verifies); only (long, long) id pairs ever shuffle, and
    * the final flag join touches contaminated ids only (bounded by the
    * hit count, not the corpus). For attribution — WHICH benchmark
    * item a doc leaks — call [[ivfNearDupIncremental]] directly: its
    * (id_a, id_b) pairs are this op's evidence frame. `nlist ≤ 0`
    * derives from the benchmark count via [[suggestNlist]].
    *
    * Exactness envelope (the oracle configuration): at `nprobe` =
    * nlist every corpus vector probes every cell, so all qualifying
    * pairs materialize regardless of geometry and the flags equal the
    * brute-force cross scan bit-for-bit. In pruned configurations
    * recall follows the IVF boundary-straddle discussion on
    * [[ivfNearDupIncremental]] (`assignNprobe` is the index-side
    * recall lever, spec-measured there). */
  def semanticDecontam(corpusEmb: DataFrame, benchEmb: DataFrame,
                       threshold: Double,
                       nlist: Int = 0, nprobe: Int = 2, iters: Int = 1,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       centroids: Option[Seq[Seq[Double]]] = None,
                       assignNprobe: Int = 1,
                       superProbe: Option[Int] = None): DataFrame = {
    val n = resolveNlist(benchEmb, nlist, "semanticDecontam")
    val hits = ivfNearDupIncremental(corpusEmb, benchEmb, threshold, n, nprobe,
        iters, idCol, vecCol, centroids, assignNprobe, superProbe)
      .select(col("id_a").as(idCol)).distinct()
      .withColumn("kept", lit(false))
    corpusEmb.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Random-sign (Achlioptas 2001) projection to `outDims` dimensions —
    * the Johnson–Lindenstrauss dimensionality reducer that makes every
    * downstream pair/scan operator cheaper: distances are preserved to
    * 1±ε with outDims = O(ln n / ε²), and a ±1 matrix needs no storage
    * because entry (i, j) derives from an integer hash. Components are
    * quantized to 1e-3 first, so the projection is exact integer
    * arithmetic — any engine replays it bit-for-bit (and the quantized
    * corpus is what [[quantizeInt8]]-style serving would scan anyway).
    *
    * Output one row per (id, out_dim) with y_e3 = Σ_i q_i · s(i, j),
    * s(i, j) = ±1 by the parity of h² mod (10⁹+7) where h =
    * (i·2654435761 + j·97) mod (10⁹+7) — the squaring step matters:
    * the affine hash alone has near-duplicate sign columns (measured
    * mean inter-column |dot| ≈ 30/64; squared-mod ≈ 5/64, the random
    * ±1 expectation), and correlated columns break the JL guarantee.
    * All intermediates < 2⁶³ (h < 10⁹+7 ⇒ h² ≈ 10¹⁸ < 9.2·10¹⁸).
    *
    * Scale: map-only — the projection is a per-row expression, the
    * explode adds no exchange; at 100 TB this is one scan producing an
    * outDims× smaller corpus for the ANN family to index. The HOF
    * evaluates interpretively (dims·outDims adds per row); if a
    * profile ever shows it hot, the [[graft.functions.PqEncode]]
    * codegen pattern applies directly. */
  def signProject(emb: DataFrame, outDims: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(outDims > 0, s"outDims must be positive, got $outDims")
    val q = transform(col(vecCol).cast("array<double>"),
      x => round(x * 1000).cast("long"))
    val sign = (i: Column, j: Column) => {
      val h = (i * 2654435761L + j * 97L) % 1000000007L
      when((h * h % 1000000007L) % 2L === 0L, 1L).otherwise(-1L)
    }
    val proj = transform(sequence(lit(0L), lit(outDims - 1L)), j =>
      aggregate(sequence(lit(0L), size(col("__q")) - 1L), lit(0L),
        (acc, i) => acc + element_at(col("__q"), (i + 1L).cast("int")) * sign(i, j)))
    emb.select(col(idCol), q.as("__q"))
      .select(col(idCol), posexplode(proj).as(Seq("out_dim", "y_e3")))
      .select(col(idCol), col("out_dim").cast("long").as("out_dim"), col("y_e3"))
  }

  /** Per-group centroid outliers: squared-L2 distance of each vector to
    * its group's centroid over 1e-3-quantized components, top `k` most
    * distant per group — the corpus-QA signal (mislabeled / off-
    * distribution vectors surface first) and the prune list for
    * prototypicality-based selection (SemDeDup's outlier end). Exact
    * integer arithmetic: centroid component = floor(Σq / n) (explicit
    * floor, so engines agree on negative sums), dist2 = Σ (q − c)².
    *
    * Scale: one posexplode → (group, dim) centroid aggregate (groups ×
    * dims rows — broadcasts back), one map-side diff join, one id-keyed
    * sum shuffle, one per-group top-k window. Nothing quadratic; the
    * window partitions by group over k-bounded candidates after an
    * AQE-sized shuffle. */
  def centroidOutliers(emb: DataFrame, k: Int = 5, groupCol: String = "label",
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = emb
      .select(col(idCol), col(groupCol).as("grp"),
        posexplode(transform(col(vecCol).cast("array<double>"),
          x => round(x * 1000).cast("long"))).as(Seq("dim", "qx")))
      .sharedCheckpoint(eager = true)
    val cent = q.groupBy("grp", "dim")
      .agg(floor(sum("qx").cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("c"))
    val d2 = q.join(broadcast(cent), Seq("grp", "dim"))
      .groupBy(col(idCol), col("grp"))
      .agg(sum((col("qx") - col("c")) * (col("qx") - col("c"))).as("dist2"))
    d2.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("dist2").desc, col(idCol).asc)))
      .where(col("rk") <= k)
      .select(col("grp").as(groupCol), col("rk").cast("long").as("rk"),
        col(idCol), col("dist2"))
  }

  /** Strategy for [[filteredTopK]] — the classic filtered-vector-search
    * fork every production ANN stack exposes (pre- vs post-filtering;
    * see e.g. the public Milvus/Vespa/pgvector design discussions). */
  sealed trait FilteredMode
  object FilteredMode {
    /** Filter the corpus BEFORE indexing: the index is built (or the
      * pinned centroids re-probed) over survivors only, so ranking
      * quality is unaffected by selectivity — the win when the
      * predicate is sharp and the shortlist would otherwise drown in
      * filtered-out candidates. Prices one per-predicate index pass. */
    case object Pre extends FilteredMode
    /** Probe the FULL-corpus index for an `oversample`·k shortlist,
      * then keep the top-k survivors — the shared-index serve shape
      * (one index answers every predicate). Wins when the predicate is
      * mild; starves when it is sharp (expected survivors per query ≈
      * oversample·k·selectivity). */
    case object Post extends FilteredMode
    /** Measure selectivity with one counting scan and route: Post iff
      * survivors/corpus ≥ 2/oversample (expected shortlist survivors
      * ≥ 2k — a 2× safety margin on "enough to rank"), else Pre. */
    case object Auto extends FilteredMode
  }

  /** [[FilteredMode.Auto]]'s routing rule, exposed for tests and for
    * callers who already know their counts. */
  private[graft] def filteredRoute(n: Long, nKeep: Long, oversample: Int): FilteredMode =
    if (n > 0 && nKeep.toDouble / n.toDouble >= 2.0 / oversample) FilteredMode.Post
    else FilteredMode.Pre

  /** Metadata-filtered ANN top-k: the k nearest corpus vectors AMONG
    * THOSE SATISFYING `predicate` — "nearest in-stock products",
    * "nearest docs with lang = en and quality ≥ cut", the shape almost
    * every retrieval call at 100 TB actually has. Output contract is
    * [[ivfTopK]]'s (q_id, rank, n_id); a query whose reachable
    * survivor set holds fewer than k vectors returns that many rows.
    *
    * Two arms (see [[FilteredMode]]): Pre filters then indexes —
    * exact-over-survivors at `nprobe` = nlist; Post probes the full
    * index for an `oversample`·k shortlist, semi-joins the survivor id
    * set (ids only — vectors never reshuffle), and re-ranks by the
    * shortlist's own sim order (rank order is preserved under
    * filtering, so no dot product recomputes). Auto routes on one
    * counting scan of the predicate columns (Post iff selectivity ≥
    * 2/oversample — the starvation-safety rule).
    *
    * DEFAULT = Pre, by measurement, not taste: this API recomputes
    * cell assignments per call, so Post's probe pass covers the FULL
    * corpus while Pre's covers only the survivors — Pre's cost is
    * ~selectivity × Post's, with equal recall (§G20: 2.6 vs 11.4 s at
    * 200k vectors / 50% selectivity; 1.7 vs 6.6 s at 2%, where Post
    * also starves and pays the top-up). Post/Auto stay for the
    * shared-shortlist semantics; the shape where Post genuinely wins —
    * assignments and codes already on disk, no per-call index pass —
    * is [[PqIndexStore.filteredTopK]], the persisted-serve twin.
    *
    * Post-arm starvation guard (`topUp`, on by default): queries whose
    * shortlist yields fewer than k survivors are detected with one
    * |queries|-sized count and re-answered by the Pre arm — their Post
    * rows are discarded wholesale, never mixed. The escalation prices
    * one filtered index pass over ONLY the starved queries, and the
    * detection count is free relative to the probe it follows. With
    * `topUp = false` a starved query just returns short (documented,
    * for latency-bounded serves).
    *
    * Exactness envelope (the oracle configuration): at `nprobe` =
    * nlist and oversample·k ≥ |corpus| the Post shortlist is the full
    * brute ranking, so top-k-of-survivors equals brute force over the
    * filtered corpus bit-for-bit; the Pre arm matches at `nprobe` =
    * nlist by [[ivfTopK]]'s own envelope. In pruned configurations
    * recall follows the IVF curve, degraded by starvation only below
    * the routing margin. `nlist ≤ 0` derives via [[suggestNlist]]
    * (over survivors in the Pre arm, the corpus in Post). */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   predicate: Column,
                   nlist: Int = 0, nprobe: Int = 4, oversample: Int = 8,
                   mode: FilteredMode = FilteredMode.Pre,
                   topUp: Boolean = true, iters: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   hotCellFactor: Double = DefaultHotCellFactor,
                   superProbe: Option[Int] = None,
                   centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    def preArm(qs: DataFrame): DataFrame =
      ivfTopK(corpus.where(predicate), qs, k, nlist, nprobe, iters, idCol,
        vecCol, hotCellFactor, superProbe, centroids)
    val routed = mode match {
      case FilteredMode.Auto =>
        val (n, nk) = predicateCounts(corpus, predicate)
        filteredRoute(n, nk, oversample)
      case m => m
    }
    routed match {
      case FilteredMode.Pre | FilteredMode.Auto => preArm(queries)
      case FilteredMode.Post =>
        val shortK = math.multiplyExact(oversample, k)
        val shortlist = ivfTopKImpl(corpus, queries, shortK, nlist, nprobe,
          iters, idCol, vecCol, hotCellFactor, excludeLabel = None,
          superProbe = superProbe, centroids = centroids)
        val keepIds = corpus.where(predicate).select(col(idCol).as("n_id"))
        postFilterTopK(shortlist, keepIds, queries, k, topUp, idCol)(preArm)
    }
  }

  /** ONE counting scan, pruned to the predicate's columns: (total,
    * survivors). Shared by [[filteredTopK]]'s Auto route and
    * [[PqIndexStore.filteredTopK]]'s shortlist sizing. */
  private[graft] def predicateCounts(corpus: DataFrame,
                                   predicate: Column): (Long, Long) = {
    val row = corpus.agg(count(lit(1)).as("n"),
      sum(when(predicate, 1L).otherwise(0L)).as("nk")).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** The shared Post-filter tail — [[filteredTopK]]'s Post arm and
    * [[PqIndexStore.filteredTopK]]'s persisted-index serve both end
    * here: semi-join the shortlist against the survivor id set (ids
    * only — vectors never reshuffle), renumber in the shortlist's own
    * rank order (order is preserved under filtering, so no sim
    * recomputes), then detect starved queries with one |queries|-row
    * count and re-answer them WHOLESALE via `starvedAnswer` (their
    * partial Post rows are discarded, never mixed). */
  private[graft] def postFilterTopK(shortlist: DataFrame, keepIds: DataFrame,
                                  queries: DataFrame, k: Int, topUp: Boolean,
                                  idCol: String)
                                 (starvedAnswer: DataFrame => DataFrame): DataFrame = {
    // survivors keep the shortlist's sim-desc order; renumber only
    val kept = shortlist.join(keepIds, Seq("n_id"), "left_semi")
      .sharedCheckpoint(eager = true)
    val ranked = kept
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rank").asc)))
      .where(col("__r") <= k)
      .select(col("q_id"), col("__r").cast("long").as("rank"), col("n_id"))
    if (!topUp) ranked
    else {
      val perQ = kept.groupBy("q_id").agg(count(lit(1)).as("__nk"))
      val starved = queries.select(col(idCol).as("q_id"))
        .join(perQ, Seq("q_id"), "left")
        .where(coalesce(col("__nk"), lit(0L)) < k)
        // lazy-safe: materialized by the isEmpty probe on the next line
        .select("q_id").sharedCheckpoint(eager = false)
      if (starved.isEmpty) ranked
      else {
        val starvedQs = queries.join(
          starved.withColumnRenamed("q_id", idCol), Seq(idCol), "left_semi")
        ranked.join(starved, Seq("q_id"), "left_anti")
          .unionByName(starvedAnswer(starvedQs))
      }
    }
  }
}
