package graft.ops

import org.apache.spark.sql.DataFrame

/** The ONE switch for how multi-stage batch pipelines (curation stages,
  * dedup frames, connected-components rounds) share an intermediate
  * frame across consumers.
  *
  * Default: `localCheckpoint` — truncates lineage and materializes to
  * executor-local blocks with zero configuration. Its documented cliff:
  * blocks live in executor storage, so losing an executor mid-pipeline
  * loses them AND the lineage that could recompute them — fine on
  * local[n] (one JVM: if the "executor" dies the job is gone anyway),
  * a real risk on a 1000-executor run where single-executor loss is
  * routine.
  *
  * Opt-in: set `spark.graft.checkpoint.reliable=true` (plus the
  * standard `sparkContext.setCheckpointDir(...)`) and every sharing
  * point upgrades to a RELIABLE `checkpoint` — frames are written to
  * the checkpoint dir's fault-tolerant storage and survive executor
  * loss, at the price of a write+read round-trip per shared frame.
  * That is the right trade on long multi-stage runs at corpus scale;
  * the default is the right trade everywhere else.
  *
  * Streaming foreachBatch internals deliberately stay on
  * `localCheckpoint`: a per-trigger frame is re-derivable by the
  * source replay that at-least-once semantics already guarantee, and
  * a reliable checkpoint per micro-batch would churn the dir at
  * trigger cadence for no added durability.
  */
object Checkpoints {

  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Whether this session opted into reliable checkpoints. */
  def reliableOn(ss: org.apache.spark.sql.SparkSession): Boolean =
    ss.conf.getOption(ReliableKey).exists(_.toBoolean)

  /** Share `df` across multiple downstream consumers; see class doc.
    *
    * `eager` is REQUIRED (r14): every sharing point must declare its
    * race class, because a LAZY shared checkpoint whose first
    * materialization is pulled from MULTIPLE plan sites inside one
    * action (a probe side plus a broadcast subquery, or two
    * independent exchange subtrees AQE submits concurrently) is raced
    * by the per-block getOrCompute lock into a pathological schedule —
    * bit-correct but up to 18× slower, schedule-dependent (BASELINE.md
    * §G16 addendum 2: 19.7 s vs 353 s on identical code).
    *
    * Decision rule, pinned by CheckpointAuditSpec:
    *   - `eager = true` when the frame's FIRST consuming action reads
    *     it from more than one plan subtree (self-joins, probe +
    *     aggregate, per-round reuse). The materializing job is work
    *     the first consumer was going to do anyway, at a race-free
    *     point.
    *   - `eager = false` ONLY when one of three arguments holds, each
    *     written as a `lazy-safe:` comment at the site:
    *     (a) immediate action — a FULL-FRAME driver action (count /
    *         collect) at the call site materializes every partition
    *         single-site before anything else can race it. Limit-style
    *         probes (head / isEmpty) materialize only the partitions
    *         they touch, so they qualify ONLY for frames of
    *         per-query-row size (≤ a few rows, e.g. Retrieval.mmr's
    *         picked/starved probes) where the un-materialized remainder
    *         is at most one near-empty partition's recompute — never
    *         for corpus-sized frames;
    *     (b) chain-fused — the first consuming action is a DOWNSTREAM
    *         eager checkpoint's materializing job that reads this
    *         frame from exactly one site, so the compute fuses there
    *         (an eager job here would double-materialize the chain);
    *     (c) cheap-lineage — every parent is already materialized and
    *         the racy recompute is bounded block reads (per-round loop
    *         frames), where an eager job per round costs more than the
    *         race it prevents. */
  def shared(df: DataFrame, eager: Boolean): DataFrame = {
    val ss = df.sparkSession
    val reliable = ss.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(ss.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir(...)")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Scale-adaptive spread for a frame about to be MATERIALIZED and
    * then consumed by several plan sites (r15, guide §2.5 "input skew:
    * one huge unsplittable file … repartition immediately after the
    * read"): when the frame's plan carries fewer partitions than the
    * session's default parallelism — a single-row-group parquet scan
    * plans ONE task, so the materialization and every downstream
    * probe/aggregate over the blocks run on one core — insert a
    * round-robin repartition to the session parallelism. The exchange
    * folds into the materializing job the caller was about to pay, and
    * the blocks then feed all consumers across the executor pool.
    * Identity at corpus scale, where the plan already has ≥ cores
    * partitions — derived from the plan, never a local constant.
    * Measured (tools.JoinParProbe, sf0.1): the inverted-index pair
    * join over a 1-block vs 32-block shingle frame = 1.94 → 1.23 s md.
    *
    * The scan partition count is ESTIMATED from the file-source
    * relation's size statistics with Spark's own split formula
    * (maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    * bytesPerCore))) rather than read off `df.rdd` — building the RDD
    * would run physical planning (and, on plans with exchanges, AQE
    * stage materialization) at frame-construction time.
    *
    * `keys` picks HASH partitioning over round-robin: a frame whose
    * downstream consumers aggregate per key must be spread key-aligned
    * — round-robin scatters every key's rows across all partitions, so
    * each per-key partial aggregate emits one partial row per
    * partition (measured 3× REGRESSION on the 96-column minhash
    * signature aggregate) — and hashpartitioning(keys) additionally
    * satisfies downstream groupBy(keys…) clustering, removing those
    * exchanges outright. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    // measurement lever (same convention as Curation.EagerStagesKey):
    // spark.graft.spread=false restores the unspread shape for A/B runs
    if (!df.sparkSession.conf.getOption(SpreadKey).forall(_.toBoolean)) return df
    // Spread at the READ only: a frame rooted in an already-
    // materialized checkpoint (LogicalRDD leaf — e.g. a curation stage
    // frame) keeps the partitioning its pipeline laid out. Re-spreading
    // those measured a PAIRED −1.0 s on the curation funnel (every
    // downstream single-row stage job inflates to 32 tasks), while
    // spreading scan-rooted pair ops measured +0.4–1.0 s wins.
    val leaves = df.queryExecution.analyzed.collectLeaves()
    if (leaves.exists(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
      return df
    val rels = leaves.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }
    if (rels.isEmpty || rels.size != leaves.size) return df // unknown root
    val ss = df.sparkSession
    val par = ss.sparkContext.defaultParallelism
    val conf = ss.sessionState.conf
    val totalBytes = rels.map(_.sizeInBytes).sum
    // A relation without real statistics reports sizeInBytes =
    // spark.sql.defaultSizeInBytes (Long.MaxValue), which would wrap the
    // sums below negative and collapse estParts to nFiles — spreading an
    // arbitrarily large frame. Treat "no stats" as "big": bail out
    // (identity), the same outcome real stats ≥ cores·splitSize produce.
    if (totalBytes < 0 || totalBytes >= conf.defaultSizeInBytes / 2) return df
    val nFiles = rels.map {
      case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        f.location.inputFiles.length.toLong
      case _ => 1L
    }.sum
    val bytesPerCore = (totalBytes + conf.filesOpenCostInBytes * nFiles) / math.max(1, par)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(conf.filesOpenCostInBytes, bytesPerCore))
    val estParts = math.max(nFiles, (totalBytes + maxSplit - 1) / math.max(1L, maxSplit))
    if (estParts >= par) df
    else if (keys.isEmpty) df.repartition(par)
    else df.repartition(par, keys: _*)
  }

  val SpreadKey = "spark.graft.spread"

  /** Per-round checkpoint for ITERATIVE loops (label propagation):
    * ALWAYS `localCheckpoint`, even in reliable mode. Each round's
    * frame supersedes the last within milliseconds, but a reliable
    * `checkpoint` file is only ever deleted by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set (off by
    * default) — so reliable per-round checkpoints would grow the
    * checkpoint dir by one never-cleaned frame per iteration of every
    * long propagation run. Losing an executor mid-loop just re-runs
    * the (pairs-only, cheap) loop; the frames that OUTLIVE the loop —
    * its inputs and final result — flow through [[shared]], which does
    * honor reliable mode. */
  def iterative(df: DataFrame, eager: Boolean = true): DataFrame =
    df.localCheckpoint(eager)

  /** Postfix syntax so call sites read like the Dataset API:
    * `.sharedCheckpoint(eager = true)` for multi-site first
    * consumption, `.sharedCheckpoint(eager = false)` + a `lazy-safe:`
    * comment when a single-site action at the call site materializes
    * it (see [[shared]]'s decision rule — the parameter has no default
    * on purpose); `.iterativeCheckpoint()` for loop-round frames. */
  implicit class SharedOps(private val df: DataFrame) extends AnyVal {
    def sharedCheckpoint(eager: Boolean): DataFrame =
      Checkpoints.shared(df, eager)
    def iterativeCheckpoint(eager: Boolean = true): DataFrame =
      Checkpoints.iterative(df, eager)
  }
}
