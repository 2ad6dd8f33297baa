package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-run preparation — the composition a user
  * actually ships: [[Curation]]'s full gate chain (quality → exact
  * dedup → near-dup clusters → decontamination), then [[Sampling
  * .epochShuffle]]'s seeded deterministic permutation, then contiguous
  * striping of the shuffled order into `nShards` training shards
  * (`shard = pos mod nShards` — every shard is an unbiased
  * interleaved sample of the shuffled stream, and shard-local order
  * follows the global epoch order). Each stage is the already-tested
  * operator, wired so the corpus is curated ONCE (the curated frame is
  * lazily checkpointed and shared by the permutation and the token
  * counts).
  *
  * Two views: [[prepare]] returns the per-document assignment
  * (id, pos, shard) a writer would partition by; [[summary]] returns
  * the per-shard (n_docs, n_tokens) manifest a training job reads
  * first. Both are deterministic for a (corpus, benchmark, params,
  * seed) tuple — rerunning an epoch reproduces it bit-for-bit.
  */
object TrainingRun {

  private def assignment(corpus: DataFrame, benchmark: DataFrame, nShards: Int,
                         seed: Long, p: Curation.Params,
                         idCol: String, textCol: String): (DataFrame, DataFrame) = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // keep the curation stage's carried per-doc token count (8 bytes):
    // summary()'s manifest reads it directly instead of re-scanning and
    // re-tokenizing the full surviving text — the single most expensive
    // per-row pass the pipeline has
    // lazy-safe: chain-fused — the first consuming action is a
    // downstream EAGER checkpoint's materializing job that reads this
    // frame from exactly one site, so its compute fuses there and the
    // blocks exist before any multi-site reader runs
    val curated = Curation
      .curateWithTokenCounts(corpus, benchmark, p, idCol, textCol)
      .sharedCheckpoint(eager = false)
    // NOT checkpointed: epochShuffle already checkpoints its hash base,
    // so re-deriving the rank per consumer is one cheap window — and a
    // checkpoint here would truncate the visible plan, hiding the
    // audited bounded global window from PlanAuditSpec's honesty check
    val asg = Sampling.epochShuffle(curated, seed, idCol = idCol)
      .select(col(idCol), col("pos"),
        pmod(col("pos"), lit(nShards.toLong)).as("shard"))
    (curated, asg)
  }

  /** Per-document (idCol, pos, shard) assignment. */
  def prepare(corpus: DataFrame, benchmark: DataFrame, nShards: Int,
              seed: Long = 0L, p: Curation.Params = Curation.Params(),
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    assignment(corpus, benchmark, nShards, seed, p, idCol, textCol)._2

  /** The packed token stream IN EPOCH ORDER — the frame an LM
    * training-data writer actually emits: documents concatenate in the
    * shuffled order (not id order; consecutive contexts must not
    * follow crawl order) and chop into `contextLen` windows. The
    * shuffled position is a dense integral id, so [[Packing
    * .packAssignments]]'s two-level distributed prefix sum runs on it
    * UNCHANGED with perfectly balanced buckets. Output: (idCol, pos,
    * n_tokens, start_offset, pack_id, pack_offset), ordered by id. */
  def packed(corpus: DataFrame, benchmark: DataFrame, contextLen: Long,
             nShards: Int = 1, seed: Long = 0L,
             p: Curation.Params = Curation.Params(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (curated, asg) = assignment(corpus, benchmark, nShards, seed, p, idCol, textCol)
    val ordered = curated.join(asg.select(col(idCol), col("pos")), idCol)
    Packing.packAssignments(
        ordered.select(col("pos"), col(textCol)), contextLen,
        idCol = "pos", textCol = textCol)
      .join(asg.select(col(idCol), col("pos")), "pos")
      .select(col(idCol), col("pos"), col("n_tokens"), col("start_offset"),
        col("pack_id"), col("pack_offset"))
      .orderBy(idCol)
  }

  /** Upsampled training order: curation → [[Sampling.upsampleByEpochs]]
    * (per-source epoch counts, fractional epochs resolved by the
    * deterministic id-hash gate) → [[Sampling.epochShuffle]] over the
    * REPLICA key — the end-to-end shape of a multi-epoch mix ("3
    * epochs of wiki, 1.5 of books") where copies of a document must
    * spread across the epoch stream rather than clump. The replica key
    * is id·1024 + copy (injective: epochs ≤ 1000 bounds copies below
    * 1024), so two copies of one doc hash to unrelated positions.
    * Output: (idCol, copy, pos, shard) — pos a dense permutation of
    * the upsampled stream, shard = pos mod nShards.
    *
    * Scale: the upsample is a map-only explode over the curated frame;
    * the shuffle inherits epochShuffle's two-level prefix-sum shape
    * (the only serial window is the bucket-count frame). */
  def prepareUpsampled(corpus: DataFrame, benchmark: DataFrame,
                       epochs: Map[String, Double], nShards: Int,
                       seed: Long = 0L, p: Curation.Params = Curation.Params(),
                       groupCol: String = "source",
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // lazy-safe: chain-fused into the downstream eager checkpoint's
    // single-site materializing job (see curateWithTokenCounts sites)
    val curated = Curation.curate(corpus, benchmark, p, idCol, textCol)
      .sharedCheckpoint(eager = false)
    upsampledTail(curated, epochs, nShards, seed, groupCol, idCol)
  }

  /** The shared upsample → replica-key shuffle → stripe tail.
    * `private[graft]`: [[graft.streaming.StreamingTrainingPrep]]
    * publishes its manifest through this EXACT code path so the
    * N-batch ≡ batch equality pin holds by construction. Needs only
    * (`idCol`, `groupCol`) columns. */
  private[graft] def upsampledTail(curated: DataFrame, epochs: Map[String, Double],
                                   nShards: Int, seed: Long, groupCol: String,
                                   idCol: String): DataFrame = {
    val up = replicas(curated, epochs, groupCol, idCol)
    val asg = Sampling.epochShuffle(up, seed, idCol = "rep_id")
    up.join(asg, "rep_id")
      .select(col(idCol), col("copy"), col("pos"),
        pmod(col("pos"), lit(nShards.toLong)).as("shard"))
  }

  /** The shared upsample → guarded replica key step of every
    * multi-epoch tail: (idCol, copy, rep_id = id·1024 + copy).
    * rep_id is only injective while the product fits int64 — a 64-bit
    * hash/snowflake id would wrap (silently colliding replica keys
    * with ANSI off, aborting mid-job with it on). Refuse out-of-range
    * ids loudly AT the row, with the fix named; the comparison is one
    * codegen'd branch per row. */
  private def replicas(curated: DataFrame, epochs: Map[String, Double],
                       groupCol: String, idCol: String): DataFrame = {
    val maxSafeId = (Long.MaxValue - 1023L) / 1024L
    val guardedId = when(col(idCol) >= 0L && col(idCol) <= maxSafeId, col(idCol))
      .otherwise(raise_error(concat(lit(
        s"training-prep replica key needs 0 <= $idCol <= $maxSafeId " +
          "(id*1024+copy must stay in int64); re-key hash/snowflake ids " +
          "first, got "), col(idCol).cast("string"))))
    Sampling.upsampleByEpochs(curated, epochs, 1.0, groupCol, idCol)
      .select(col(idCol), col("copy"),
        (guardedId * 1024L + col("copy")).as("rep_id"))
  }

  /** DoReMi-driven training order — the deployment loop closed: curate
    * ONCE, fit [[Sampling.doremiWeights]] (K iterative reweighting
    * rounds) on the CURATED corpus, convert the learned mixture to
    * per-source epoch counts ([[Sampling.epochsFromWeights]]: a domain
    * at mixture share w and natural share n/N repeats w·N/n epochs,
    * capped), then the standard upsample → replica-key shuffle →
    * stripe tail. Hard (high-excess-loss) domains repeat more; easy
    * ones thin toward their factor floor. Output:
    * (idCol, copy, pos, shard) — deterministic for a (corpus,
    * benchmark, params, rounds, seed) tuple.
    *
    * Scale: the weights fit adds two vocab-bounded count passes over
    * the curated frame (already checkpointed) plus K vocab-sized
    * rounds; the |domains|-row epoch vector crosses the driver (the
    * [[Sampling.upsampleByEpochs]] literal-CASE contract — domains are
    * dozens at 100 TB). Sources the fit never scored (only sub-2-token
    * docs) keep 1.0 epochs. */
  def prepareDoremi(corpus: DataFrame, benchmark: DataFrame, nShards: Int,
                    rounds: Int = 2, maxEpochsE6: Long = 8000000L,
                    seed: Long = 0L, p: Curation.Params = Curation.Params(),
                    groupCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // lazy-safe: chain-fused into the downstream eager checkpoint's
    // single-site materializing job (see curateWithTokenCounts sites)
    val curated = Curation.curate(corpus, benchmark, p, idCol, textCol)
      .sharedCheckpoint(eager = false)
    val w = Sampling.doremiWeights(curated, rounds, srcCol = groupCol,
      textCol = textCol)
    val epochs = Sampling.epochsFromWeights(w, maxEpochsE6, groupCol)
      .select(col(groupCol), col("epochs_e6")).collect()
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    upsampledTail(curated, epochs, nShards, seed, groupCol, idCol)
  }

  /** DoReMi × curriculum — the two learned orderings composed the way
    * a real run consumes them: the DoReMi mixture decides HOW OFTEN
    * each domain repeats (weighted epochs), the curriculum decides the
    * ORDER WITHIN each epoch (easy → hard by the carried token count).
    * Curate ONCE, fit [[Sampling.doremiWeights]] → per-source epoch
    * counts → deterministic upsample ([[prepareDoremi]]'s head), then
    * rank the replica stream EPOCH-MAJOR: all of epoch 0 in curriculum
    * order, then epoch 1, … (the composed difficulty key is
    * copy·2³² + token count — injective because token counts are
    * guarded below 2³²), with the seeded within-difficulty shuffle on
    * the replica key so two copies of one doc land at unrelated
    * positions inside their epochs. Output (idCol, copy, pos, shard),
    * deterministic for a (corpus, benchmark, params, rounds, seed)
    * tuple.
    *
    * Scale: [[prepareDoremi]]'s fit cost plus [[Sampling
    * .curriculumOrder]]'s three-level prefix sum — the only serial
    * window is the |copies|·|distinct token count| frame (copies are
    * single digits by the epoch cap; the product stays
    * resolution-bounded, never corpus-sized). */
  def prepareDoremiCurriculum(corpus: DataFrame, benchmark: DataFrame,
                              nShards: Int, rounds: Int = 2,
                              maxEpochsE6: Long = 8000000L, seed: Long = 0L,
                              p: Curation.Params = Curation.Params(),
                              groupCol: String = "source",
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // lazy-safe: chain-fused — the first consuming action is a
    // downstream EAGER checkpoint's materializing job that reads this
    // frame from exactly one site, so its compute fuses there and the
    // blocks exist before any multi-site reader runs
    val curated = Curation
      .curateWithTokenCounts(corpus, benchmark, p, idCol, textCol)
      .sharedCheckpoint(eager = false)
    val w = Sampling.doremiWeights(curated, rounds, srcCol = groupCol,
      textCol = textCol)
    val epochs = Sampling.epochsFromWeights(w, maxEpochsE6, groupCol)
      .select(col(groupCol), col("epochs_e6")).collect()
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    doremiCurriculumTail(curated, epochs, nShards, seed, groupCol, idCol,
      Curation.TokCol)
  }

  /** The shared upsample → epoch-major curriculum rank → stripe tail.
    * `private[graft]`: [[graft.streaming.StreamingTrainingPrep]]'s
    * curriculum mode publishes through this EXACT code path so the
    * N-batch ≡ batch equality pin holds by construction. Needs
    * (`idCol`, `groupCol`, `tokCol`) columns. */
  private[graft] def doremiCurriculumTail(curated: DataFrame,
                                          epochs: Map[String, Double],
                                          nShards: Int, seed: Long,
                                          groupCol: String, idCol: String,
                                          tokCol: String): DataFrame = {
    // the epoch-major key composes by bit-shift: token counts above
    // 2^32 would bleed into the epoch index — absurd for one document,
    // but refuse loudly rather than reorder silently
    val maxTok = 4294967295L
    val guardedTok = when(col(tokCol) >= 0L && col(tokCol) <= maxTok,
        col(tokCol).cast("long"))
      .otherwise(raise_error(concat(lit(
        s"curriculum difficulty needs 0 <= $tokCol <= $maxTok, got "),
        col(tokCol).cast("string"))))
    val rep = replicas(curated, epochs, groupCol, idCol)
      .join(curated.select(col(idCol), guardedTok.as("__nt")), idCol)
      .withColumn("__cd", col("copy") * lit(4294967296L) + col("__nt"))
    val ord = Sampling.curriculumOrder(
      rep.select(col("rep_id"), col("__cd")), "__cd", seed, idCol = "rep_id")
    rep.join(ord, "rep_id")
      .select(col(idCol), col("copy"), col("pos"),
        pmod(col("pos"), lit(nShards.toLong)).as("shard"))
  }

  /** Curriculum training order (Bengio et al. 2009): curate ONCE, then
    * order the survivors easy-to-hard by the carried per-doc token
    * count — the classic short-to-long LM curriculum — with a seeded
    * deterministic shuffle WITHIN each length (equal-length docs must
    * not follow crawl order), then stripe. Output (idCol, pos, shard):
    * pos the dense curriculum position, shard = pos mod nShards, so
    * every shard reads in curriculum order and the shard set at any
    * prefix of training is an unbiased sample of that difficulty band.
    * Deterministic for a (corpus, benchmark, params, seed) tuple.
    *
    * Scale: the difficulty signal is the curation stage's carried
    * 8-byte token count — no re-tokenization — and the ordering is
    * [[Sampling.curriculumOrder]]'s three-level prefix sum (the only
    * serial window is over the |distinct length| frame). */
  def prepareCurriculum(corpus: DataFrame, benchmark: DataFrame, nShards: Int,
                        seed: Long = 0L, p: Curation.Params = Curation.Params(),
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // lazy-safe: chain-fused — the first consuming action is a
    // downstream EAGER checkpoint's materializing job that reads this
    // frame from exactly one site, so its compute fuses there and the
    // blocks exist before any multi-site reader runs
    val curated = Curation
      .curateWithTokenCounts(corpus, benchmark, p, idCol, textCol)
      .sharedCheckpoint(eager = false)
    curriculumTail(curated, nShards, seed, idCol, Curation.TokCol)
  }

  /** The shared curriculum-rank → stripe tail. `private[graft]`:
    * [[graft.streaming.StreamingCurriculumPrep]] publishes its manifest
    * through this EXACT code path so the N-batch ≡ batch equality pin
    * holds by construction. Needs only (`idCol`, `tokCol`) columns. */
  private[graft] def curriculumTail(curated: DataFrame, nShards: Int, seed: Long,
                                    idCol: String, tokCol: String): DataFrame =
    Sampling.curriculumOrder(curated, tokCol, seed, idCol = idCol)
      .select(col(idCol), col("pos"),
        pmod(col("pos"), lit(nShards.toLong)).as("shard"))

  /** Per-shard manifest (shard, n_docs, n_tokens), ordered by shard. */
  def summary(corpus: DataFrame, benchmark: DataFrame, nShards: Int,
              seed: Long = 0L, p: Curation.Params = Curation.Params(),
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (curated, asg) = assignment(corpus, benchmark, nShards, seed, p, idCol, textCol)
    // the carried curation token count — NOT a fresh tokenizer pass
    val tok = curated.select(col(idCol), col(Curation.TokCol).as("__nt"))
    asg.join(tok, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"))
      .orderBy("shard")
  }
}
