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
