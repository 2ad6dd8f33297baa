package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-produced ranked candidate
  * lists (a lexical BM25 arm, a dense ANN arm, …) into one ranking via
  * reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the standard
  * score-free combiner a RAG-ish training-data stack runs above its
  * retrievers. RRF needs only ranks, so arms with incomparable score
  * scales (quantized BM25 longs vs cosine doubles) fuse without
  * calibration.
  *
  * Determinism: each rank contributes floor(1e6 / (kRrf + rank)) as an
  * exact long — floor, not round, so no half-boundary can disagree
  * across engines (1e6/(60+r) IS exactly x.5 at r = 68; round would be
  * engine-ambiguous there, floor never is). Ties in the fused score
  * break by candidate id.
  *
  * Scale: each input arm is a per-query top-`depth` list — the frames
  * entering the fusion are |queries|·depth rows, never corpus-sized.
  * The fusion is one groupBy on (q_id, n_id) with map-side partials and
  * one window partitioned by q_id; both parallelize across queries.
  */
object Retrieval {

  /** Fuse ranked lists. Each input frame carries (q_id, n_id, rank)
    * with rank 1-based within its (arm, q_id); extra columns are
    * ignored. Returns the per-query top-`k` of the fused ranking as
    * (q_id, rank, n_id, rrf_e6). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(kRrf >= 0, s"kRrf must be non-negative, got $kRrf")
    val contribs = rankings.map(
      _.select(col("q_id"), col("n_id"),
        floor(lit(1e6) / (lit(kRrf).cast("double") + col("rank").cast("double")))
          .cast("long").as("c_e6")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("q_id", "n_id").agg(sum("c_e6").as("rrf_e6"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf_e6").desc, col("n_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("rrf_e6"))
  }

  /** Attach 1-based ranks to a scored candidate frame (q_id, n_id,
    * scoreCol), keeping the per-query top-`depth`: the adapter that
    * turns a scored arm (BM25's quantized longs, a reranker's floats)
    * into [[rrfFuse]] input. The window partitions by q_id — bounded
    * when the arm is, parallel across queries always. */
  def rankByScore(scored: DataFrame, scoreCol: String, depth: Int): DataFrame = {
    require(depth > 0, s"depth must be positive, got $depth")
    val w = Window.partitionBy("q_id")
      .orderBy(col(scoreCol).desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= depth)
      .select(col("q_id"), col("n_id"), col("rank"))
  }

  /** Diversity-aware top-k: Maximal Marginal Relevance (Carbonell &
    * Goldstein, SIGIR 1998) over a per-query candidate shortlist —
    * greedily pick the candidate maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, so the
    * result covers the query's neighborhood instead of returning k
    * near-copies of the top hit (the dedup-aware serving shape, and
    * the diverse-exemplar selector for training-data inspection).
    *
    * `cands` carries (q_id, n_id, rel_e6, n_vec): a per-query
    * shortlist (any arm's top-`depth` with its vectors re-attached —
    * [[mmrTopK]] wires the brute-force arm). All MMR arithmetic is
    * exact-integer over 1e6-quantized cosines: score =
    * λ_e6·rel_e6 − (1e6−λ_e6)·maxsim_e6, ties by n_id — so any engine
    * replays pick-for-pick. λ_e6 = 1e6 degenerates to the relevance
    * ranking; 0 to pure diversity after the first pick. Output
    * (q_id, rank, n_id) — every arm's shape, [[rrfFuse]]- and
    * [[Eval.rankMetrics]]-compatible.
    *
    * Scale: candidate pair similarities are computed ONCE
    * (|queries|·depth² rows, query-bounded — depth is tens); each of
    * the k−1 greedy rounds is one join + one keyed max + one per-query
    * argmax window over |queries|·depth-bounded frames, all
    * partitioned by q_id — rounds are sequential BY DEFINITION (greedy
    * data dependence), the work inside each is fully distributed. Each
    * round is a fixed number of Spark jobs, so at bounded depth the
    * cost is job-count overhead, not data: for shortlists that fit in
    * one task (any real depth — see [[mmrRerankLocal]]) the in-task
    * variant computes the SAME picks in one shuffle and is the default
    * arm of [[mmrTopKIvf]]; this global plan remains for candidate
    * frames too wide for one task. */
  def mmrRerank(cands: DataFrame, k: Int, lambdaE6: Long = 700000L,
                vecCol: String = "n_vec"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaE6 >= 0L && lambdaE6 <= 1000000L,
      s"lambdaE6 must be in [0, 1e6], got $lambdaE6")
    import graft.ops.Checkpoints.SharedOps
    graft.functions.ensureRegistered(cands.sparkSession)
    val base = cands.select(col("q_id"), col("n_id"), col("rel_e6"),
        col(vecCol).as("__v"))
      .sharedCheckpoint(eager = true) // pair sims + every greedy round read it
    // both orientations, so a round's lookup is (q_id, cand, picked)
    val ps = base.as("a").join(base.as("b"),
        col("a.q_id") === col("b.q_id") && col("a.n_id") =!= col("b.n_id"))
      .select(col("a.q_id").as("q_id"), col("a.n_id").as("cand"),
        col("b.n_id").as("other"),
        floor(Similarity.dot(col("a.__v"), col("b.__v")) /
          (Similarity.norm(col("a.__v")) * Similarity.norm(col("b.__v")))
          * 1e6).cast("long").as("sim_e6"))
      // lazy-safe: consumed at ONE site per round action (maxSim); blocks exist before later rounds
      .sharedCheckpoint(eager = false)
    val w = Window.partitionBy("q_id").orderBy(col("__score").desc, col("n_id").asc)
    def pick(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("q_id"), col("n_id"), lit(rank.toLong).as("rank"))
    var sel = pick(base.withColumn("__score", col("rel_e6")), 1)
    var i = 2
    var exhausted = false
    while (i <= k && !exhausted) {
      val remaining = base.join(sel.select("q_id", "n_id"), Seq("q_id", "n_id"),
        "left_anti")
      val maxSim = ps.join(sel.select(col("q_id"), col("n_id").as("other")),
          Seq("q_id", "other"))
        .groupBy(col("q_id"), col("cand").as("n_id"))
        .agg(max("sim_e6").as("__ms"))
      val scored = remaining.join(maxSim, Seq("q_id", "n_id"))
        .withColumn("__score",
          lit(lambdaE6) * col("rel_e6") - lit(1000000L - lambdaE6) * col("__ms"))
      // each round's picks are tiny (one row per query): checkpoint so
      // round i+1's plan does not re-derive rounds 1..i
      // lazy-safe: materialized by the isEmpty probe below
      val picked = pick(scored, i).sharedCheckpoint(eager = false)
      // every query out of candidates -> later rounds are dead work
      // (the isEmpty probe reads the just-materialized tiny frame)
      if (picked.isEmpty) exhausted = true
      // lazy-safe: cheap-lineage — a union of two already-materialized
      // block sets; the next round reads it from two sites, but the racy
      // recompute is bounded block reads, never corpus compute (an eager
      // job per round costs more than the race it prevents)
      else { sel = sel.unionByName(picked).sharedCheckpoint(eager = false); i += 1 }
    }
    sel.select(col("q_id"), col("rank"), col("n_id"))
      .orderBy("q_id", "rank")
  }

  /** Per-query LOCAL MMR rerank — [[mmrRerank]]'s semantics (same
    * greedy argmax, same exact-integer scores, same tie-breaks;
    * spec-pinned bit-identical) with a one-shuffle plan: one query's
    * shortlist fits comfortably in one task (depth × dim floats —
    * depth 1000 × 1024-d is 4 MB), so the k-round greedy loop runs
    * IN-TASK over the grouped candidates instead of as k global
    * join+window+checkpoint jobs. The §G18 adjudication: at 1000
    * queries × depth 100 this is ~30× faster than the global k-round
    * plan, and the gap is pure fixed job-count overhead — use THIS for
    * any bounded-depth shortlist (every real serving shape); the
    * global [[mmrRerank]] remains for shortlists too wide or wide-dim
    * to sit in one task.
    *
    * Work is O(k·depth·dims) per query (incremental max-sim update
    * against the last pick) vs the global plan's O(depth²·dims) pair
    * materialization — strictly less arithmetic for k < depth, on top
    * of the job-count win. Ids/rel are cast to long, vectors widen to
    * double (exact) so the in-task cosine replays [[Similarity.dot]]'s
    * left-to-right double accumulation bit-for-bit. */
  def mmrRerankLocal(cands: DataFrame, k: Int, lambdaE6: Long = 700000L,
                     vecCol: String = "n_vec"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaE6 >= 0L && lambdaE6 <= 1000000L,
      s"lambdaE6 must be in [0, 1e6], got $lambdaE6")
    // the in-task path keys its groupByKey on long ids: a fractional
    // double id would TRUNCATE (silently merging two queries' short-
    // lists into one rerank) and a string id would cast to NULL (an
    // opaque encoder crash later) — refuse non-integral id types up
    // front; mmrRerank (the global arm) handles exotic id types
    Seq("q_id", "n_id").foreach { c =>
      val dt = cands.schema(c).dataType
      require(Seq(org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.ByteType).contains(dt),
        s"mmrRerankLocal needs an integral $c (got $dt) — " +
          "re-key, or use mmrRerank for exotic id types")
    }
    val ss = cands.sparkSession
    import ss.implicits._
    val lam = lambdaE6
    val kk = k
    cands.select(
        col("q_id").cast("long"), col("n_id").cast("long"),
        col("rel_e6").cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Long, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (q: Long, it: Iterator[(Long, Long, Long, Array[Double])]) =>
        // deterministic candidate order = round-1 pick order: rel desc,
        // n_id asc (mmrRerank's Window.orderBy)
        val srt = it.toArray.sortBy(t => (-t._3, t._2))
        val n = srt.length
        val m = math.min(kk, n)
        val picked = new Array[Boolean](n)
        val maxSim = Array.fill(n)(Long.MinValue)
        val out = new Array[(Long, Long, Long)](m)
        if (m > 0) { picked(0) = true; out(0) = (q, 1L, srt(0)._2) }
        var last = 0
        var r = 2
        while (r <= m) {
          // fold the last pick into each survivor's max-sim (equivalent
          // to mmrRerank's max over ALL picked, computed incrementally)
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val s = simE6(srt(i)._4, srt(last)._4)
              if (s > maxSim(i)) maxSim(i) = s
            }
            i += 1
          }
          var best = -1
          var bestScore = Long.MinValue
          var bestId = Long.MaxValue
          i = 0
          while (i < n) {
            if (!picked(i)) {
              val sc = lam * srt(i)._3 - (1000000L - lam) * maxSim(i)
              if (best < 0 || sc > bestScore ||
                  (sc == bestScore && srt(i)._2 < bestId)) {
                best = i; bestScore = sc; bestId = srt(i)._2
              }
            }
            i += 1
          }
          picked(best) = true
          last = best
          out(r - 1) = (q, r.toLong, srt(best)._2)
          r += 1
        }
        out.iterator
      }
      .toDF("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** In-task replica of the column-side floored cosine —
    * floor(vec_dot(a,b) / (√vec_dot(a,a)·√vec_dot(b,b)) · 1e6) —
    * bit-identical because [[graft.functions.VecDot]] is plain
    * left-to-right double accumulation and float→double widening is
    * exact (pinned by the mmrRerankLocal ≡ mmrRerank spec). */
  private def simE6(a: Array[Double], b: Array[Double]): Long = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i) * b(i); i += 1 }
    math.floor(d / (nrm(a) * nrm(b)) * 1e6).toLong
  }

  private def nrm(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** Re-attach vectors and 1e6-floored relevance to a ranked shortlist
    * (q_id, rank, n_id) → the (q_id, n_id, rel_e6, n_vec) candidate
    * shape both rerank arms take: one n_id equi-join against the
    * corpus plus a broadcast of the query vectors. `private[graft]` so
    * [[graft.tools]] measurement harnesses exercise THE production
    * candidate frame rather than a drift-prone copy. */
  private[graft] def attachCandidates(corpus: DataFrame, queries: DataFrame,
                                      ranking: DataFrame, idCol: String,
                                      vecCol: String): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv")))
    ranking
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id")
      .join(q, "q_id")
      .select(col("q_id"), col("n_id"),
        floor(Similarity.dot(col("__qv"), col("n_vec")) /
          (Similarity.norm(col("__qv")) * Similarity.norm(col("n_vec")))
          * 1e6).cast("long").as("rel_e6"),
        col("n_vec"))
  }

  /** [[mmrRerank]] over the exact brute-force shortlist: top-`depth`
    * cosine candidates per query with 1e6-quantized relevance, then
    * the k-step greedy diversity rerank. The oracle-exact
    * configuration; at scale use [[mmrTopKIvf]] (ANN shortlist +
    * in-task rerank) or call [[mmrRerankLocal]] with your own arm. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int, depth: Int,
              lambdaE6: Long = 700000L, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(depth >= k, s"depth ($depth) must be >= k ($k)")
    val short = Similarity.bruteForceTopK(corpus, queries, depth, idCol, vecCol)
    mmrRerank(attachCandidates(corpus, queries, short, idCol, vecCol), k, lambdaE6)
  }

  /** The production diverse-retrieval shape: [[Similarity.ivfTopK]]
    * shortlist (partition-pruned ANN — never a corpus cross join) →
    * [[mmrRerankLocal]] (one-shuffle in-task greedy rerank). Recall
    * against the brute-MMR reference is bounded by the shortlist arm's
    * recall (MMR reranks whatever candidates it is given); with
    * `nprobe = nlist` the shortlist is exact and the picks match
    * [[mmrTopK]] bit-for-bit (spec-pinned). Pass pinned `centroids`
    * (e.g. from a persisted [[PqIndexStore]] index) to serve with zero
    * training jobs. `nlist` defaults to 0 = AUTO (the package's
    * nlist ∝ n rule via [[Similarity.suggestNlist]] inside ivfTopK),
    * so a naked caller's cells stay bounded as the corpus grows
    * instead of inheriting a toy-sized fixed 16. */
  def mmrTopKIvf(corpus: DataFrame, queries: DataFrame, k: Int, depth: Int,
                 lambdaE6: Long = 700000L, nlist: Int = 0, nprobe: Int = 4,
                 iters: Int = 1, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(depth >= k, s"depth ($depth) must be >= k ($k)")
    val short = Similarity.ivfTopK(corpus, queries, depth, nlist, nprobe,
      iters, idCol, vecCol, centroids = centroids)
    mmrRerankLocal(attachCandidates(corpus, queries, short, idCol, vecCol),
      k, lambdaE6)
  }

  /** Hybrid lexical + dense top-k for ONE query (`qId` labels it in the
    * output): BM25 over `docs` for `queryTerms`, fused with a
    * caller-supplied dense ranking (q_id, rank, n_id) — the output of
    * [[Similarity.ivfTopK]] / [[Similarity.bruteForceTopK]] /
    * [[graft.ops.PqIndexStore.topK]], so the caller picks the dense
    * arm's scale/recall point. Both arms are cut at `depth` before
    * fusing. Batched multi-query callers should call [[rrfFuse]]
    * directly with per-q_id arms. */
  def hybridTopK(docs: DataFrame, denseRanking: DataFrame,
                 queryTerms: Seq[String], k: Int,
                 depth: Int = 20, kRrf: Int = 60, qId: Long = 0L,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lexical = rankByScore(
      TextAnalysis.bm25TopK(docs, queryTerms, depth, idCol = idCol, textCol = textCol)
        .select(lit(qId).as("q_id"), col("doc_id").as("n_id"), col("score_e6")),
      "score_e6", depth)
    val dense = denseRanking
      .where(col("q_id") === qId && col("rank") <= depth)
      .select(col("q_id"), col("n_id"), col("rank"))
    rrfFuse(Seq(lexical, dense), k, kRrf)
  }
}
