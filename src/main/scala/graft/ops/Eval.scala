package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation operators — the third leg of train/serve/EVAL for the
  * pipeline's learned components. All metrics are exact-integer
  * (counts and `div`-quantized ratios), so any engine replays them
  * bit-for-bit and a regression gate can compare artifacts across
  * engines/runs without float tolerance.
  */
object Eval {

  /** Confusion counts + quantized P/R/F1 for binary predictions.
    * `preds` carries (idCol, keep BOOLEAN) — [[TextAnalysis.classifierScore]]'s
    * output shape; `labels` carries (idCol, y ∈ {0,1}) for EVERY eval
    * doc. Docs absent from `preds` (e.g. zero-gram docs the featurizer
    * drops) count as predicted-negative — the honest accounting for a
    * filter that passes only what it scores. One row out:
    * (tp, fp, fn, tn, precision_e6, recall_e6, f1_e6), ratios by exact
    * integer div with 0 for empty denominators.
    *
    * Scale: one broadcast-or-hash join on ids and one global count
    * aggregate with map-side partials — nothing wider than the eval
    * set ever shuffles. */
  def binaryClassification(preds: DataFrame, labels: DataFrame,
                           idCol: String = "doc_id"): DataFrame =
    labels.select(col(idCol), col("y").cast("long").as("y"))
      .join(preds.select(col(idCol), col("keep")), Seq(idCol), "left")
      .withColumn("p", coalesce(col("keep"), lit(false)))
      .agg(
        sum(when(col("p") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!col("p") && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("p") && col("y") === 0L, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 div (tp + fp) END")
          .as("precision_e6"),
        expr("CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 div (tp + fn) END")
          .as("recall_e6"),
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN 0 " +
          "ELSE 2 * tp * 1000000 div (2 * tp + fp + fn) END").as("f1_e6"))

  /** Per-query retrieval metrics against a relevance set: recall@k,
    * reciprocal rank, and binary-gain DCG@k, exact-integer quantized.
    * `ranking` carries (q_id, rank, n_id) — any ANN/BM25/hybrid arm's
    * output shape; `qrels` carries the relevant (q_id, n_id) pairs.
    * One row per query WITH relevance judgments (metrics are undefined
    * for unjudged queries): (q_id, n_rel, hits, recall_e6, rr_e6,
    * dcg_e6), where rr_e6 = 1e6 div (first relevant rank) and dcg_e6 =
    * Σ_hits floor(1e6 / log2(rank + 1)), both 0 when nothing relevant
    * ranked in the top k. log2 of a small integer is computed
    * identically on IEEE engines (exact at the power-of-two ranks
    * where floor boundaries sit), so the quantization is replayable.
    *
    * Scale: the hit join touches |queries|·k ranking rows against the
    * qrels frame; everything downstream is per-query aggregates. */
  def rankMetrics(ranking: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val nrel = qrels.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    val hit = ranking.where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
      .join(qrels.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"), min("rank").as("best"),
        sum(floor(lit(1e6) / log2(col("rank").cast("double") + lit(1.0)))
          .cast("long")).as("dcg"))
    nrel.join(hit, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(col("q_id"), col("n_rel"), col("hits"),
        expr("hits * 1000000 div n_rel").as("recall_e6"),
        coalesce(expr("1000000 div best"), lit(0L)).as("rr_e6"),
        coalesce(col("dcg"), lit(0L)).as("dcg_e6"))
  }

  /** Token-overlap P/R/F1 between prediction/reference text pairs —
    * the unigram-overlap metric (ROUGE-1/SQuAD-F1 family) for
    * summarization, QA-answer, and extraction evals at corpus scale.
    * Overlap is MULTISET intersection (per token, the smaller of the
    * two occurrence counts — a prediction repeating a reference word
    * five times gets credit for the reference's count, not five), on
    * the package's normalized whitespace tokens. One row per pair:
    * (idCol, n_pred, n_ref, n_overlap, precision_e6, recall_e6,
    * f1_e6), exact-integer quantized, zero for empty denominators.
    *
    * Scale: two tokenize-explode aggregates keyed (id, token) and one
    * id-keyed reduce — per-pair cost is the text length, nothing
    * corpus-wide. */
  def textOverlapF1(pairs: DataFrame, idCol: String = "doc_id",
                    predCol: String = "pred", refCol: String = "ref"): DataFrame = {
    import graft.ops.Dedup.tokens
    val pt = pairs.select(col(idCol), explode(tokens(col(predCol))).as("t"))
      .groupBy(idCol, "t").agg(count(lit(1)).as("np"))
    val rt = pairs.select(col(idCol), explode(tokens(col(refCol))).as("t"))
      .groupBy(idCol, "t").agg(count(lit(1)).as("nr"))
    val ov = pt.join(rt, Seq(idCol, "t"))
      .groupBy(idCol).agg(sum(least(col("np"), col("nr"))).as("n_overlap"))
    pairs.select(col(idCol),
        size(tokens(col(predCol))).cast("long").as("n_pred"),
        size(tokens(col(refCol))).cast("long").as("n_ref"))
      .join(ov, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .select(col(idCol), col("n_pred"), col("n_ref"), col("n_overlap"),
        expr("CASE WHEN n_pred = 0 THEN 0 " +
          "ELSE n_overlap * 1000000 div n_pred END").as("precision_e6"),
        expr("CASE WHEN n_ref = 0 THEN 0 " +
          "ELSE n_overlap * 1000000 div n_ref END").as("recall_e6"),
        expr("CASE WHEN n_pred + n_ref = 0 THEN 0 " +
          "ELSE 2 * n_overlap * 1000000 div (n_pred + n_ref) END").as("f1_e6"))
  }

  /** ROC-AUC of a continuous score against a binary label — the
    * threshold-free complement to [[binaryClassification]] ("how well
    * does this score RANK positives above negatives", before any keep
    * cutoff is chosen). Computed as the Mann–Whitney U statistic with
    * tie-averaged ranks, entirely in exact integer arithmetic: tied
    * scores each take the group's average rank, and DOUBLED rank sums
    * keep the half-steps integral. One row out: (n_pos, n_neg,
    * auc_e6 = floor(1e6 · AUC)), NULL when either class is empty
    * (AUC is undefined, and a silent 0 would read as "worst score").
    *
    * `scored` carries (scoreCol numeric, labelCol ∈ {0,1}); grouping
    * is by the [[scoreKey]] — round(score·1e6) by default — so scores
    * already coarser than 1e-6 (the package's 4-dp / e6 convention)
    * group injectively and the result is bit-identical to exact mode.
    *
    * Scale: one groupBy on the score KEY (map-side combine), one
    * serial window over the distinct-key frame (the
    * [[Sampling.epochShuffle]] bucket-count pattern), one single-row
    * aggregate. The key is e6-QUANTIZED BY DEFAULT (see [[scoreKey]]),
    * so the serial frame is bounded at (score range)·1e6 + 1 rows no
    * matter how large the corpus — raw continuous doubles would make
    * it corpus-sized, the one-task scale-killer shape. The doubled
    * rank sum is accumulated in decimal(38,0) (the [[Packing]]
    * fill-rate precedent), so the n·(2n+1) intermediate cannot wrap
    * int64 at corpus scale; the output division is decimal too. */
  /** Binary label validated at the row: NULL or out-of-{0,1} labels
    * would silently count as negatives in the rank evals (n_neg =
    * count − Σy), skewing the metric with no error — refuse loudly
    * instead (the package's poisonous-NULL convention). */
  private def binaryLabel(labelCol: String) = {
    val y = col(labelCol).cast("long")
    when(y === 0L || y === 1L, y).otherwise(raise_error(concat(
      lit(s"binary eval needs $labelCol in {0, 1}, got "),
      coalesce(col(labelCol).cast("string"), lit("NULL")))))
  }

  /** Score validated at the row, same convention as [[binaryLabel]]:
    * a NULL score would silently sort NULLS-FIRST in the rank evals
    * (counting as the LOWEST score) and emit a phantom NULL bin in
    * [[calibrationBins]]; a NaN score sorts ABOVE every real double in
    * Spark's ordering (silently becoming the top operating point) and
    * floor-casts to key 0 under quantization — refuse both loudly.
    * Both are reachable in practice (a quality scorer over NULL text,
    * a 0/0 ratio feature), so the poisonous-value check belongs here,
    * not on the caller. */
  private def validScore(scoreCol: String) =
    when(col(scoreCol).isNotNull && !isnan(col(scoreCol)), col(scoreCol))
      .otherwise(raise_error(
        lit(s"eval needs a non-NULL, non-NaN $scoreCol (NULL would " +
          "silently rank lowest, NaN highest)")))

  /** The threshold-eval group key: round(score · 10^e) when quantized
    * (the default), the raw score in exact mode. Quantization is what
    * BOUNDS the serial window in [[rocAuc]]/[[prCurve]]: the distinct-
    * key frame is at most (score range)·10^e + 1 rows regardless of
    * corpus size — ≤ 1e6 + 1 for the package's [0, 1] quality scores
    * at the default e = 6 — where raw continuous doubles would make it
    * corpus-sized and serialize one task. round(·10^e) is monotone
    * (non-decreasing), so the threshold sweep order is preserved, and
    * — unlike floor, whose boundary sits ON the grid — it is EXACT on
    * scores that are 10^-e-grid multiples stored as doubles (the
    * nearest double to k·10^-e is within half an ulp, far inside the
    * half-integer rounding window; floor would collapse ~25% of
    * adjacent e6-grid pairs whose double representation lands just
    * below the boundary). So scores on the 10^-e grid or coarser (the
    * package's 4-dp / e6 convention) map injectively and quantized
    * mode is bit-identical to exact mode on them (spec-pinned). */
  private def scoreKey(scoreCol: String, quantE: Option[Int]) = quantE match {
    case Some(e) =>
      require(e >= 0 && e <= 15, s"scoreQuantumE must be in [0, 15], got $e")
      round(validScore(scoreCol) * lit(math.pow(10, e))).cast("long")
    case None => validScore(scoreCol)
  }

  /** @param scoreQuantumE scores group by round(score · 10^e) — the
    *   serial distinct-score window is bounded at (range)·10^e + 1 rows
    *   (see [[scoreKey]]); `None` opts out to exact raw-score grouping
    *   (tie structure exact, frame UNBOUNDED on continuous scores —
    *   only for inputs known coarse). Quantization can only merge
    *   near-ties (< 10^-e apart) into ties; on scores already coarser
    *   than 10^-e the result is bit-identical to exact mode. */
  def rocAuc(scored: DataFrame, scoreCol: String = "score",
             labelCol: String = "y",
             scoreQuantumE: Option[Int] = Some(6)): DataFrame = {
    val g = scored
      .select(scoreKey(scoreCol, scoreQuantumE).as("__s"),
        binaryLabel(labelCol).as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum("__y").as("__cp"))
    // rows strictly below this score group: the only serial window,
    // over the distinct-score frame
    val w = org.apache.spark.sql.expressions.Window.orderBy("__s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    g.withColumn("__cb", coalesce(sum("__c").over(w), lit(0L)))
      // 2 × (tie-averaged rank of each positive in the group)
      // = 2·cb + c + 1, summed in decimal against int64 wrap
      .agg(
        sum("__cp").as("n_pos"),
        (sum("__c") - sum("__cp")).as("n_neg"),
        sum(col("__cp").cast("decimal(38,0)")
          * (col("__cb") * 2L + col("__c") + 1L)).as("__r2"))
      .select(col("n_pos"), col("n_neg"),
        expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST((__r2 - cast(n_pos as decimal(38,0)) * (n_pos + 1)) " +
          "* 1000000 div (2 * cast(n_pos as decimal(38,0)) * n_neg) AS BIGINT) END")
          .as("auc_e6"))
  }

  /** Precision–recall curve of a continuous score against a binary
    * label: one row per DISTINCT score value s — the operating point
    * "keep everything scoring ≥ s" — with exact-integer confusion
    * counts and quantized precision/recall/F1. The threshold-sweep
    * companion to [[rocAuc]] (one number for ranking power) and
    * [[binaryClassification]] (one chosen threshold): this is the
    * frame a threshold DECISION is read off. Output (score, tp, fp,
    * precision_e6, recall_e6, f1_e6), ordered by score descending —
    * curve order, the direction a threshold sweep reads.
    *
    * Scale: the same shape as [[rocAuc]] — one groupBy on the score
    * KEY (e6-quantized by default, bounding the serial frame at
    * (range)·1e6 + 1 rows; see [[scoreKey]]), then cumulative sums
    * over that frame in ONE serial window pass (descending key order;
    * the class totals ride the same pass as unbounded-frame sums).
    * The emitted `score` is the MIN raw score in each key group — an
    * EXACT operating point even under quantization: every row in the
    * group scores ≥ that min and every row in lower groups scores
    * strictly below it, so "keep ≥ score" selects precisely the
    * cumulative set the row's counts describe. Quantized ratios are
    * plain int64 (`x·1e6 div n`, safe to ~9.2e12 rows — the package's
    * eval convention).
    *
    * @param scoreQuantumE see [[rocAuc]]; `None` = exact raw-score
    *   grouping (one point per distinct raw score, frame unbounded on
    *   continuous scores). Bit-identical to exact mode on scores
    *   already coarser than 10^-e. */
  def prCurve(scored: DataFrame, scoreCol: String = "score",
              labelCol: String = "y",
              scoreQuantumE: Option[Int] = Some(6)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored
      .select(scoreKey(scoreCol, scoreQuantumE).as("__sk"),
        col(scoreCol).as("__raw"), binaryLabel(labelCol).as("__y"))
      .groupBy("__sk")
      .agg(min("__raw").as("score"),
        count(lit(1)).as("__c"), sum("__y").as("__cp"))
    val desc = Window.orderBy(col("__sk").desc)
    val cum = desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = desc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("tp", sum("__cp").over(cum))
      .withColumn("__n_at", sum("__c").over(cum))
      .withColumn("__pos", sum("__cp").over(all))
      .select(col("score"), col("tp"), (col("__n_at") - col("tp")).as("fp"),
        expr("tp * 1000000 div __n_at").as("precision_e6"),
        expr("CASE WHEN __pos = 0 THEN 0 " +
          "ELSE tp * 1000000 div __pos END").as("recall_e6"),
        expr("CASE WHEN __n_at + __pos = 0 THEN 0 " +
          "ELSE 2 * tp * 1000000 div (__n_at + __pos) END").as("f1_e6"))
      .orderBy(col("score").desc)
  }

  /** Calibration (reliability) bins of a [0, 1] score against a binary
    * label: the score range split into `nBins` equal-width bins, one
    * row per non-empty bin with the bin's exact empirical positive
    * rate next to its mean score — the "is a 0.8 score actually right
    * 80% of the time" diagram, read before treating a quality score as
    * a probability. Output (bin, n, n_pos, mean_score_e6,
    * pos_rate_e6), ordered by bin; scores are clamped into [0, 1]
    * (score = 1.0 lands in the top bin, not a phantom nBins-th one).
    * Exact integers: scores quantize to floor(1e6·s) before summing,
    * rates by integer div — any engine replays the rows bit-for-bit.
    *
    * Scale: ONE groupBy on the bin id (≤ nBins groups, map-side
    * combine) — the cheapest eval in the package; int64-safe to
    * ~9.2e12 rows per bin (the package's eval convention). */
  def calibrationBins(scored: DataFrame, nBins: Int = 10,
                      scoreCol: String = "score",
                      labelCol: String = "y"): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val bin = least(greatest(floor(validScore(scoreCol) * nBins), lit(0L)),
      lit(nBins - 1L))
    // the mean clamps like the bin does: an out-of-[0,1] score must
    // not put a reliability-diagram point outside probability space
    val clamped = least(greatest(col(scoreCol), lit(0.0)), lit(1.0))
    scored
      .select(bin.as("bin"), binaryLabel(labelCol).as("__y"),
        floor(clamped * 1e6).cast("long").as("__s6"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"), sum("__s6").as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("__ss div n").as("mean_score_e6"),
        expr("n_pos * 1000000 div n").as("pos_rate_e6"))
      .orderBy("bin")
  }

  /** Pair-set agreement: precision/recall of a candidate pair
    * generator against a reference pair set — the audit every
    * approximate dedup family owes its operator ("what fraction of
    * true near-dup pairs does the SimHash/LSH/IVF proxy surface, and
    * how much junk rides along"). Both frames carry (id_a, id_b) with
    * id_a < id_b (every pair generator in [[Dedup]]/[[Similarity]]'s
    * shape); extra columns are ignored. One row out: (n_ref, n_cand,
    * n_hit, precision_e6, recall_e6), ratios by exact integer div
    * with 0 for empty denominators.
    *
    * Scale: one equi-join on the pair keys plus three count
    * aggregates, each with map-side partials; the single-row frames
    * combine via broadcast — nothing wider than the pair frames
    * shuffles, and those are the generators' own outputs. */
  def pairAgreement(candidates: DataFrame, reference: DataFrame): DataFrame = {
    // defensive distinct: a generator that emits a pair twice (e.g. a
    // multi-band candidate frame taken before its own dedup) must not
    // inflate the counts — the metric is over pair SETS
    val cand = candidates.select(col("id_a"), col("id_b")).distinct()
    val ref = reference.select(col("id_a"), col("id_b")).distinct()
    val nRef = ref.agg(count(lit(1)).as("n_ref"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    val nHit = cand.join(ref, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_hit"))
    // audited single-row broadcasts (see PlanAuditSpec's crossJoin note)
    nRef.crossJoin(broadcast(nCand)).crossJoin(broadcast(nHit))
      .select(col("n_ref"), col("n_cand"), col("n_hit"),
        expr("CASE WHEN n_cand = 0 THEN 0 ELSE n_hit * 1000000 div n_cand END")
          .as("precision_e6"),
        expr("CASE WHEN n_ref = 0 THEN 0 ELSE n_hit * 1000000 div n_ref END")
          .as("recall_e6"))
  }
}
