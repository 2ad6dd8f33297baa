package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training: documents are concatenated in id
  * order into one token stream and chopped into fixed-length context
  * windows ("concat-then-chunk"). The operator assigns every document
  * its start offset in that stream and the context window it begins in
  * — the frame a training-data writer keys off to emit packed
  * sequences.
  *
  * The global running token total is a prefix sum, which a naive
  * `Window.orderBy` without partitioning would compute on a SINGLE
  * partition — a non-starter at corpus scale. This implements the
  * classic two-level distributed prefix sum instead:
  *
  *   1. docs are bucketed by `id DIV bucketSize`; a per-bucket token
  *      total is aggregated (map-side partials, one shuffle of
  *      n/bucketSize rows);
  *   2. bucket totals are prefix-summed — the only unpartitioned
  *      window, over the tiny bucket frame (1M docs @ bucketSize 4096
  *      = 245 rows);
  *   3. bucket offsets broadcast-join back and a bucket-partitioned
  *      window adds the local cumulative sum.
  *
  * Every per-row step is partitioned; the serial step touches
  * n/bucketSize rows. Offsets are exact integers, so any engine
  * reproduces the assignment bit-for-bit.
  */
object Packing {

  /** Per-document packing assignment over the corpus token stream.
    *
    * Output: (idCol, n_tokens, start_offset, pack_id, pack_offset)
    * where `start_offset` is the document's first-token position in the
    * concatenated stream, `pack_id = start_offset DIV contextLen` the
    * context window it starts in, and `pack_offset` the position within
    * that window. Ordered by id. Ids must be integral (the bucketing
    * divides them); token counts come from [[Dedup.tokens]] whitespace
    * tokenization of `textCol`.
    */
  def packAssignments(docs: DataFrame, contextLen: Long,
                      idCol: String = "doc_id", textCol: String = "text",
                      bucketSize: Long = 4096L): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // a string id would cast to null and silently collapse into one
    // bucket — refuse anything non-integral up front (same contract as
    // Dedup.dupClusters' driver path)
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"packAssignments needs an integral id column; $idCol is $idType")
    // lazily checkpointed: the (id, count, bucket) frame — 24 B/doc —
    // feeds BOTH the bucket-total aggregate and the final join;
    // without it the corpus is scanned and tokenized twice
    val base = docs.select(
      col(idCol).cast("long").as(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"),
      expr(s"CAST($idCol AS BIGINT) DIV $bucketSize").as("__bucket"))
      .sharedCheckpoint(eager = true)
    val bucketTotals = base.groupBy("__bucket").agg(sum("n_tokens").as("__bt"))
    // the one serial window: n/bucketSize rows, driver-trivial
    val wBuckets = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals
      .withColumn("__boff", coalesce(sum("__bt").over(wBuckets), lit(0L)))
      .drop("__bt")
    // n_tokens tiebreak: duplicate ids would otherwise tie with shuffle-
    // dependent order, making the running sum (and every offset after
    // the tie) differ between runs — with the tiebreak, equal (id, n)
    // rows are interchangeable and the output is one deterministic
    // multiset, preserving the bit-for-bit reproducibility contract
    val wLocal = Window.partitionBy("__bucket")
      .orderBy(col(idCol), col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), "__bucket")
      .withColumn("start_offset",
        col("__boff") + coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset DIV $contextLen").as("pack_id"),
        (col("start_offset") % contextLen).as("pack_offset"))
      .orderBy(idCol)
  }

  /** Per-context-window occupancy: how many documents start in each
    * window and how many of its `contextLen` slots the stream fills
    * (every window is full except possibly the last). A pack whose
    * `n_docs` is large is stuffed with short documents — the signal a
    * curriculum/packing-efficiency report reads.
    *
    * Windows where NO document starts — the interior of a document
    * longer than `contextLen` — are deliberately absent: they are 100%
    * filled by construction and carry no packing signal, and a report
    * row per interior window would make the output grow with total
    * tokens rather than documents. Consumers needing the full window
    * count use ⌈Σ n_tokens / contextLen⌉ ([[efficiencyReport]]'s
    * `packed_contexts`), not a row count or `sum(filled)` over this
    * frame. */
  def packSummary(assignments: DataFrame, contextLen: Long): DataFrame = {
    val totalEnd = max(col("start_offset") + col("n_tokens"))
    assignments
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), totalEnd.as("__max_end"))
      .withColumn("filled",
        least(lit(contextLen), greatest(lit(0L),
          col("__max_end") - col("pack_id") * contextLen)))
      .select(col("pack_id"), col("n_docs"), col("filled"))
      .orderBy("pack_id")
  }

  /** Context-length tradeoff curve: for each candidate `contextLen`,
    * the cost of BOTH packing disciplines a trainer chooses between —
    * one-doc-per-context (pad short docs to L, truncate long ones:
    * `pad_tokens`, `trunc_tokens`, `fill_rate_e6` = kept/(n·L)) and
    * concat-then-chunk (`packed_contexts` = ⌈Σtokens/L⌉ windows, zero
    * padding, but `split_docs` documents straddle a window boundary —
    * the rows whose attention masking/loss a trainer must handle).
    * This is the report that picks L before a [[packAssignments]] run:
    * small L wastes long docs to truncation, large L wastes short docs
    * to padding or splits more documents. All exact integers.
    *
    * Scale: the token counts + the two-level prefix sum compute ONCE
    * (start offsets are contextLen-independent); each candidate L is
    * then one map-side-combined aggregate over an exploded
    * (doc, L) frame — |Ls| × n rows of three longs, no extra scan of
    * the text. */
  def efficiencyReport(docs: DataFrame, contextLens: Seq[Long],
                       idCol: String = "doc_id", textCol: String = "text",
                       bucketSize: Long = 4096L): DataFrame = {
    require(contextLens.nonEmpty, "efficiencyReport needs candidate lengths")
    // every candidate validates, not just the head that packAssignments
    // range-checks — a zero L would otherwise emit a silent null row
    // (integer division by zero) instead of failing fast
    contextLens.foreach(l =>
      require(l > 0, s"contextLen must be positive, got $l"))
    // a duplicated candidate L would make explode emit its row twice and
    // the groupBy silently double n_docs/pad_tokens/trunc_tokens for
    // that L (fill_rate alone stays correct-looking)
    require(contextLens.distinct.size == contextLens.size,
      s"contextLens must be distinct, got $contextLens")
    val base = packAssignments(docs, contextLens.head, idCol, textCol, bucketSize)
      .select(col(idCol), col("n_tokens"), col("start_offset"))
    val l = col("context_len")
    base
      .select(col("n_tokens"), col("start_offset"),
        explode(array(contextLens.map(lit): _*)).as("context_len"))
      .groupBy("context_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(greatest(l - col("n_tokens"), lit(0L))).as("pad_tokens"),
        sum(greatest(col("n_tokens") - l, lit(0L))).as("trunc_tokens"),
        sum(least(col("n_tokens"), l)).as("__kept"),
        sum(col("n_tokens")).as("__total"),
        sum((col("n_tokens") > 0 &&
          expr("start_offset DIV context_len") =!=
            expr("(start_offset + n_tokens - 1) DIV context_len"))
          .cast("long")).as("split_docs"))
      .select(l, col("n_docs"), col("pad_tokens"), col("trunc_tokens"),
        // decimal(38,0) intermediates: __kept * 1e6 overflows int64 past
        // ~9.2e12 kept tokens (inside the 100 TB design scale — the
        // DuckDB oracle already computes this in hugeint); div stays the
        // integral divide, so the value is bit-identical where both fit
        expr("cast(__kept as decimal(38,0)) * 1000000 div " +
          "(cast(n_docs as decimal(38,0)) * context_len)").as("fill_rate_e6"),
        expr("(__total + context_len - 1) DIV context_len").as("packed_contexts"),
        col("split_docs"))
      .orderBy("context_len")
  }
}
