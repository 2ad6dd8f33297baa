package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Release reporting — the dataset-card rows a corpus ships with.
  * Composes the measurement operators in this package into per-slice
  * summaries; nothing here introduces new semantics, only the
  * aggregation shapes a release pipeline publishes.
  */
object Reports {

  /** Per-source dataset card: document/token volume, median quality,
    * dominant language (ties break lexicographically), and the
    * exact-duplicate share — the one-row-per-source summary table at
    * the top of every corpus release ("what is in this source, how
    * clean is it, how much of it is copies"). Duplicate attribution is
    * GLOBAL (a doc is a dup if any earlier doc anywhere has the same
    * normalized text), so two sources mirroring each other both show
    * elevated dup rates except for the copy that came first — read it
    * next to [[Dedup.sourceOverlap]] for the pairwise picture.
    * Output: (source, n_docs, n_tokens, quality_p50, top_lang,
    * dup_rate_e6), one row per source.
    *
    * Scale: one text scan computes tokens/quality/digest together;
    * the dup window shuffles 8-byte digests; everything downstream
    * aggregates to |sources| (× |langs|) rows. The exact median is a
    * per-source percentile buffer — at extreme per-source cardinality
    * swap in approx_percentile, as [[TextAnalysis.lengthOutliers]]
    * documents. */
  def sourceCard(docs: DataFrame, srcCol: String = "source",
                 idCol: String = "doc_id", textCol: String = "text",
                 langCol: String = "lang"): DataFrame = {
    import graft.ops.Checkpoints.SharedOps
    val toks: Column = Dedup.tokens(col(textCol))
    val base = docs
      .select(col(srcCol), col(idCol), col(langCol), col(textCol), toks.as("__w"))
      .select(col(srcCol), col(idCol), col(langCol),
        size(col("__w")).cast("long").as("__nt"),
        round(TextAnalysis.qualityScoreOf(col("__w"), col(textCol)), 4).as("__q"),
        xxhash64(Dedup.normText(col(textCol))).as("__h"))
      .sharedCheckpoint(eager = true) // dup window + the two aggregates share one scan
    val dupW = Window.partitionBy(col("__h")).orderBy(col(idCol).asc)
    val flagged = base.withColumn("__dup",
      (row_number().over(dupW) > 1).cast("long"))
    val agg = flagged.groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"),
        expr("percentile(__q, 0.5d)").as("__q50"),
        sum("__dup").as("__ndup"))
    val langW = Window.partitionBy(srcCol)
      .orderBy(col("__n").desc, col(langCol).asc)
    val topLang = base.groupBy(srcCol, langCol).agg(count(lit(1)).as("__n"))
      .withColumn("__r", row_number().over(langW)).where(col("__r") === 1)
      .select(col(srcCol), col(langCol).as("top_lang"))
    agg.join(topLang, srcCol)
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        round(col("__q50"), 4).as("quality_p50"), col("top_lang"),
        expr("__ndup * 1000000 div n_docs").as("dup_rate_e6"))
  }

  /** Order-invariant release manifest: per source, (n_docs, n_chars,
    * content_sum) where content_sum is the mod-(10⁹+7) SUM of the
    * per-doc polynomial text fingerprints ([[TextAnalysis.polyHash]]
    * over normalized text — the d_text_stats fingerprint). Because
    * addition commutes, the checksum is independent of row order,
    * partitioning, and file layout — re-verifying a copied/re-sharded
    * release is one scan + one aggregate, and any engine recomputes it
    * exactly (no engine-specific hash). A changed, added, or dropped
    * doc moves the sum with probability ≈ 1 − 1/10⁹.
    *
    * Scale: one scan; the shuffle carries (source, partial sums). */
  def releaseManifest(docs: DataFrame, srcCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession) // poly_hash
    docs
      .select(col(srcCol),
        length(col(textCol)).cast("long").as("__nc"),
        TextAnalysis.polyHash(Dedup.normText(col(textCol))).as("__fp"))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"), sum("__nc").as("n_chars"),
        // accumulate in decimal(38,0): per-doc fingerprints reach ~1e9,
        // so a plain long sum silently wraps past ~9.2e9 docs/source and
        // would diverge from any wide-integer recompute of the manifest
        (sum(col("__fp").cast("decimal(38,0)")) % lit(1000000007L))
          .cast("long").as("content_sum"))
  }
}
