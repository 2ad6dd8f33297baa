package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines.
  *
  * Scale notes: every operator here is one-or-two shuffle jobs with
  * map-side reduction; nothing collects to the driver.
  *  - exact: groupBy(text-hash) — shuffle carries (hash, id) pairs only.
  *  - jaccard: inverted-index join on shingles — the only pairs that
  *    materialize are those sharing ≥1 shingle; with stopword-light
  *    shingles this is near-linear in corpus size, not O(n²).
  *  - minhash LSH: fixed-width signatures (one row per doc) then
  *    band-bucket join — at 100 TB the candidate set is bounded by
  *    bucket collision counts, independent of corpus pair count.
  */
object Dedup {

  /** Normalized text: lowercase, collapsed whitespace. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  def tokens(text: Column): Column =
    filter(split(normText(text), " "), t => length(t) > 0)

  /** Distinct word k-shingles via the single-pass custom expression
    * (the equivalent split/transform/slice higher-order chain evaluates
    * lambdas interpretively and was the dedup pipeline's bottleneck).
    * Callers must have graft functions registered on the session. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.word_shingles(text, k)

  /** New-batch exact dedup against an already-ingested corpus — the
    * incremental-rebuild shape: a nightly batch dedups against
    * yesterday's digest set without reprocessing it. Anti-join on the
    * 256-bit digest (broadcast or shuffled, planner's choice; either
    * way only digests travel), then the within-batch [[exact]] pass.
    * Returns (keep_id, n_dups) over the genuinely-new documents. */
  def exactIncremental(newDocs: DataFrame, seenDocs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val seen = seenDocs.select(sha2(normText(col(textCol)), 256).as("digest")).distinct()
    digestGroups(
      newDocs.select(sha2(normText(col(textCol)), 256).as("digest"), col(idCol))
        .join(seen, Seq("digest"), "left_anti"),
      idCol)
  }

  /** [[exactIncremental]] with a bloom pre-filter over the seen-digest
    * set — the route that matters at 100 TB. The plain anti-join
    * re-shuffles every seen digest on every nightly run; here the seen
    * store is scanned ONCE to build a compact bloom filter (~1.2 GB per
    * 10⁹ digests at 1% fpp, conf-capped), which ships in the plan and
    * routes each new doc with a codegen'd membership probe:
    *  - bloom-negative docs are definitely unseen — they skip the join
    *    entirely (the common case: most of a crawl is new);
    *  - bloom-positive docs (true dups + ~fpp·|new| false positives)
    *    form a frame small enough to broadcast, so the exact residual
    *    check runs as a broadcast semi-join the seen store STREAMS
    *    through, then a broadcast anti-join against the (tiny) hit set
    *    — no seen-side exchange anywhere.
    * Output is identical to [[exactIncremental]]: the bloom only
    * routes; the residual joins keep exactness (a false positive just
    * takes the slow lane). Falls back to the plain anti-join when the
    * seen set is empty or exceeds `maxSeenItems` — past Spark's
    * conf-capped filter size the saturated bloom would route everything
    * to the residual join anyway (raise
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * and `maxSeenItems` together for larger stores). Prices one extra
    * job over the seen digests (count + filter build) — a scan, not a
    * shuffle. */
  def exactIncrementalBloom(newDocs: DataFrame, seenDocs: DataFrame,
                            idCol: String = "doc_id", textCol: String = "text",
                            fpp: Double = 0.01,
                            maxSeenItems: Long = 4000000L): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    graft.functions.ensureRegistered(newDocs.sparkSession)
    val seen = seenDocs.select(sha2(normText(col(textCol)), 256).as("digest"))
      .distinct()
      // lazy-safe: materialized by the nSeen count below
      .sharedCheckpoint(eager = false) // reused: count, bloom build, hits probe
    val newDig = newDocs.select(sha2(normText(col(textCol)), 256).as("digest"), col(idCol))
    val nSeen = seen.count()
    if (nSeen == 0L || nSeen > maxSeenItems)
      return digestGroups(newDig.join(seen, Seq("digest"), "left_anti"), idCol)
    // optimal bit count for the target fpp: -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      math.ceil(-nSeen * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloom = seen
      .agg(graft.functions.bloom_agg(xxhash64(col("digest")), nSeen, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probed = newDig.withColumn("maybe_seen",
      graft.functions.bloom_might_contain(lit(bloom), xxhash64(col("digest"))))
    val fresh = probed.where(!col("maybe_seen")).drop("maybe_seen")
    val maybe = probed.where(col("maybe_seen")).drop("maybe_seen")
      .sharedCheckpoint(eager = true) // reused: hits probe + residual anti-join
    // digests that are REALLY seen, among the candidates: the seen
    // store streams through a broadcast semi-join (candidate set is
    // dup-rate + fpp sized), producing a hit set no bigger than it
    val hits = seen.join(maybe.select("digest").distinct(), Seq("digest"), "left_semi")
    val residual = maybe.join(hits, Seq("digest"), "left_anti")
    digestGroups(fresh.unionByName(residual), idCol)
  }

  /** Shared dedup tail: (keep_id, n_dups) per distinct digest. */
  private def digestGroups(withDigest: DataFrame, idCol: String): DataFrame =
    withDigest
      .groupBy("digest")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("digest")

  /** (cols..., s = xxhash64 of each distinct k-shingle) — the ONE
    * shingle-hash projection behind both decontamination views; a
    * hashing/normalization change lands here once. */
  private def shingleHashFrame(df: DataFrame, k: Int, textCol: String,
                               cols: Column*): DataFrame =
    df.select(cols :+ explode(shingles(col(textCol), k)).as("s0"): _*)
      .withColumn("s", xxhash64(col("s0"))).drop("s0")

  /** Test-set decontamination: corpus documents sharing at least
    * `minShared` distinct k-shingles with ANY benchmark document — the
    * standard leakage check before training. The benchmark's shingle
    * SET is deduped before the join (its size is what matters, not its
    * doc count) and both sides travel as 8-byte xxhash64 keys; the join
    * is a bucket-equi-join on the shingle hash, never a doc×doc
    * product. Returns (idCol, n_shared) for contaminated docs. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    k: Int = 3, minShared: Int = 2,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val bench = shingleHashFrame(benchmark, k, textCol).select("s").distinct()
    shingleHashFrame(corpus, k, textCol, col(idCol))
      .join(bench, "s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // corpus shingles are distinct per doc
      .where(col("n_shared") >= minShared)
  }

  /** Corpus-level containment: what fraction of a benchmark's DISTINCT
    * shingles appears anywhere in the corpus — the go/no-go aggregate
    * a release pipeline logs before shipping a training set (the
    * per-document view is [[contamination]]). One row:
    * (n_bench_shingles, n_contained, containment).
    *
    * Scale: both sides reduce to distinct xxhash64 shingle sets before
    * the join (8-byte keys, text never shuffles), and the small
    * benchmark set is the BUILD side of a left-semi join from the
    * corpus (a left-outer with bench as the stream side could never
    * broadcast — Spark only builds the right side of an outer join),
    * so the corpus-side distinct is the only wide exchange. The bench
    * frame is lazily checkpointed: the semi-join build and the
    * denominator count share one evaluation. */
  def containmentReport(corpus: DataFrame, benchmark: DataFrame, k: Int = 3,
                        textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val bench = shingleHashFrame(benchmark, k, textCol).select("s").distinct()
      .sharedCheckpoint(eager = true)
    val corp = shingleHashFrame(corpus, k, textCol).select("s").distinct()
    // |corpus ∩ bench| as rows tagged 1, |bench| as rows tagged 0;
    // one union + one aggregate — no join of 1-row aggregates (which
    // would plan the nested-loop shape the plan audit forbids)
    val contained = corp.join(bench, Seq("s"), "left_semi")
      .select(lit(1L).as("tag"))
    bench.select(lit(0L).as("tag")).union(contained)
      .agg(
        // aggregates over ZERO rows yield null — an empty benchmark
        // must still report (0, 0, 0.0)
        coalesce(sum(when(col("tag") === 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_bench_shingles"),
        coalesce(sum(col("tag")), lit(0L)).as("n_contained"))
      .select(col("n_bench_shingles"), col("n_contained"),
        round(when(col("n_bench_shingles") === 0L, lit(0.0))
          .otherwise(col("n_contained").cast("double") /
            col("n_bench_shingles").cast("double")), 6).as("containment"))
  }

  /** Exact dedup: one surviving (min) id per distinct normalized text.
    * Returns (keep_id, n_dups). The shuffle key is a 256-bit digest of
    * the normalized text, not the text itself — at 100 TB the exchange
    * carries (digest, id) pairs (~72 B/row) instead of full documents. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    digestGroups(
      docs.select(sha2(normText(col(textCol)), 256).as("digest"), col(idCol)), idCol)

  /** (id, shingle-hash) exploded frame, materialized once per operator
    * call graph — both sides of the self-join, the size lookup, and the
    * candidate-verify join all reuse it. Shingles are joined by
    * xxhash64, not by string: the shuffle then carries 8-byte keys
    * instead of k-word text, and the join compares longs. A 64-bit
    * collision (p ≈ n²/2^65 over distinct shingles) could only merge two
    * shingles into one inverted-index posting — negligible, and the
    * exact intersection verify still bounds the damage to one count.
    *
    * Materialization is `localCheckpoint`, not `persist`: a CacheManager
    * entry lives until someone explicitly unpersists it (nobody can —
    * the frame is internal), so repeated dedup calls in a long session
    * would pin storage without bound (and re-persisting the same
    * lineage logs `Asked to cache already cached data`). Checkpoint
    * blocks are reference-tracked — the ContextCleaner frees them when
    * the result DataFrame is garbage-collected. AQE supplies the
    * runtime stats the truncated lineage no longer carries.
    *
    * `eager = false` defers the blocks' materialization to the first
    * action — with one subtlety, measured and spec-pinned in
    * EventAnalyticsSpec: under AQE, building the checkpointed RDD
    * materializes the frame's upstream EXCHANGES (their map stages run
    * at plan-build time); only the final result stage waits for the
    * action. Caveat, inherent to localCheckpoint:
    * blocks are stored non-replicated on executors with lineage
    * truncated, so losing an executor mid-query (spot nodes, dynamic
    * allocation) fails the query instead of recomputing — on such
    * clusters opt into reliable `checkpoint()` via
    * [[Checkpoints.ReliableKey]] plus a checkpoint dir, trading a
    * distributed-FS write per shared frame.
    */
  private def shingleFrame(docs: DataFrame, k: Int,
                           idCol: String, textCol: String,
                           spread: Boolean = true): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    val sh0 = docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("s0"))
      .select(col("id"), xxhash64(col("s0")).as("s"))
    // key-aligned spread: sizes/signature/pack aggregates are per id.
    // The two-sided INCREMENTAL paths opt out (spread = false) on
    // MEASURED grounds: the paired A/B put the extra exchanges at a net
    // loss there (−0.61 s md on d_minhash_incremental with spread on).
    // The new side is also small by contract (per-batch); the seen side
    // is the accumulated corpus, where the spread is identity at scale
    // anyway (estParts ≥ cores), so nothing is lost by opting out.
    (if (spread) Checkpoints.spread(sh0, col("id")) else sh0)
      // EAGER (r13): every consumer embeds this frame at several plan
      // sites at once (candidate probe + verify + size/df aggregates,
      // some on broadcast-exchange threads), and concurrent threads
      // racing a LAZY checkpoint serialize on the per-block
      // getOrCompute lock — the pathology profiled in the curation
      // facade (Curation.stageFrames note: a 1-task stage pinned 172 s
      // behind its 32-task sibling). The frame is 16 B/shingle and is
      // ALWAYS consumed by at least two sites, so eager is mandatory
      // work at a race-free point.
      .sharedCheckpoint(eager = true)
  }

  /** jaccard-filtered output from per-pair intersection counts. */
  private def finishPairs(inter: DataFrame, sizes: DataFrame,
                          threshold: Double): DataFrame =
    finishPairsSized(inter, sizes, sizes, threshold)

  /** [[finishPairs]] with per-side size frames — the two-frame verify
    * paths keep each side's set sizes separate so an id that appears
    * on both sides (e.g. a re-ingested doc) can't corrupt either. */
  private def finishPairsSized(inter: DataFrame, sizesA: DataFrame, sizesB: DataFrame,
                               threshold: Double): DataFrame =
    inter
      .join(sizesA.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizesB.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  /** Exact |A∩B| per candidate (id_a, id_b) pair, then jaccard filter —
    * the shared verify tail of the prefix and LSH paths.
    *
    * The intersection runs against each doc's PACKED shingle-set array
    * (one row per doc, shingle hashes collected once), so the verify
    * shuffles O(|candidates|) rows and intersects per row in codegen.
    * The previous shape — exploding both sides' shingle rows through
    * the candidate list — shuffled |candidates| × |set| rows; the
    * round-5 scale study measured that as a 430× per-decade blowup on
    * a 50k-doc corpus (BASELINE.md §G) where this one is
    * candidate-linear. */
  private def verifyExact(candidates: DataFrame, sh: DataFrame,
                          threshold: Double): DataFrame =
    verifyExactSided(candidates, sh, sh, threshold)

  /** [[verifyExact]] with per-side shingle frames — the incremental
    * path keeps each side's sets separate so an id present in both
    * frames (a re-submitted, possibly edited doc) keeps per-side stats
    * intact instead of merging shingle sets through a union. */
  private def verifyExactSided(candidates: DataFrame, shA: DataFrame, shB: DataFrame,
                               threshold: Double): DataFrame = {
    def packs(sh: DataFrame, side: String) = sh.groupBy("id")
      .agg(collect_list(col("s")).as(s"__s$side"), count(lit(1)).as(s"sz_$side"))
      .withColumnRenamed("id", s"id_$side")
    candidates
      .join(packs(shA, "a"), "id_a")
      .join(packs(shB, "b"), "id_b")
      .withColumn("inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join:
    * explode shingles → join docs sharing a shingle → |A∩B| per pair →
    * jaccard from precomputed set sizes. Exact for all pairs with
    * jaccard > 0 (pairs sharing no shingle can't pass any threshold). */
  def jaccardPairs(docs: DataFrame, k: Int, threshold: Double,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardPairsFrom(shingleFrame(docs, k, idCol, textCol), threshold)

  private def jaccardPairsFrom(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz")) // shingles are distinct already
    val pairs = sh.as("a").join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    finishPairs(pairs, sizes, threshold)
  }

  /** Adaptive variant (the one pipelines should call): measures the
    * inverted index's candidate-pair volume Σ_s C(df_s, 2) — the exact
    * row count the plain join would materialize — with one tiny
    * aggregate over the shingle-frequency frame, then picks the plain
    * join (low-collision corpora: near-linear, no ranking overhead) or
    * the PPJoin prefix filter (hot-shingle corpora: removes the
    * quadratic hot-shingle blowup). The driver-side decision scalar is
    * the same pattern AQE uses: plan from measured stats, not hopes.
    * Output is identical either way. The shingle frame is materialized
    * once and shared by the measurement and whichever plan wins.
    *
    * `maxCandidatePairs` default: 100M candidate rows ≈ a few GB of
    * shuffle — comfortably under a single stage's budget; beyond it the
    * prefix filter's extra passes pay for themselves. */
  def jaccardPairsAdaptive(docs: DataFrame, k: Int, threshold: Double,
                           idCol: String = "doc_id", textCol: String = "text",
                           maxCandidatePairs: Long = 100000000L): DataFrame = {
    val sh = shingleFrame(docs, k, idCol, textCol)
    if (candVolumeOf(sh) <= maxCandidatePairs) jaccardPairsFrom(sh, threshold)
    else jaccardPairsPrefixFrom(sh, threshold)
  }

  /** Σ_s C(df_s, 2) over a shingle frame — the candidate volume every
    * EXACT pair path must materialize (the plain inverted-index join
    * shuffles exactly this many rows; the PPJoin prefix join prunes a
    * fraction that VANISHES as the threshold drops or shingles run
    * hot). One aggregate over 8-byte hashes. */
  private def candVolumeOf(sh: DataFrame): Long =
    sh.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2)).head().getAs[Any](0) match {
        case null          => 0L
        case d: java.math.BigDecimal => d.longValue()
        case n: Number     => n.longValue()
      }

  /** Near-dup pairs with a MEASURED-volume route between exact and
    * banded: candidate volume ≤ `maxCandidatePairs` → plain exact
    * inverted-index join (recall 1); above it → MinHash+LSH with exact
    * verify (banded recall). The r13 closing of the Auto footgun the
    * survivor-count route alone left open: a corpus whose SHINGLES run
    * hot (fixed-vocab / boilerplate-heavy text at a low threshold)
    * explodes BOTH exact paths long before the 100k-survivor line —
    * measured at the 50k decade, shingleK 3 / t 0.5: plain and prefix
    * exact both > 150 s (prefix never finished a 10-min budget; the
    * prefix at t = 0.5 keeps ~half of every doc's shingles, so
    * hot-shingle pruning does nothing), MinHash 7 s. Doc counts say
    * nothing about this — only the measured Σ C(df, 2) does, and it
    * costs one aggregate over the shingle frame both winners reuse.
    *
    * Default cap 20M: the plain join's verify shuffle at 100M
    * candidates measured 44-175 s on 32 cores (r13 profile); 20M keeps
    * the exact arm's worst case around thirty seconds while preserving
    * recall 1 for every corpus whose near-dup structure is sane. */
  def nearDupPairsAuto(docs: DataFrame, k: Int, threshold: Double,
                       maxCandidatePairs: Long = 20000000L,
                       numHashes: Int = 96, bands: Int = 32,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = shingleFrame(docs, k, idCol, textCol)
    if (candVolumeOf(sh) <= maxCandidatePairs) jaccardPairsFrom(sh, threshold)
    else {
      val buckets = bandBuckets(minhashSignaturesFrom(sh, numHashes),
        bands, numHashes / bands)
      val candidates = buckets.as("a")
        .join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      verifyExact(candidates, sh, threshold)
    }
  }

  /** Exact Jaccard pairs with prefix filtering (PPJoin-style): sort each
    * doc's shingles by global rarity; a pair with J ≥ t must share a
    * shingle within each side's first |s| − ceil(t·|s|) + 1 shingles, so
    * only prefixes are joined. On hot-shingle corpora this removes the
    * quadratic blowup of the plain inverted-index join (hot shingles are
    * frequent, hence sorted out of prefixes). Candidates are then
    * verified with the full intersection count — results are identical
    * to [[jaccardPairs]].
    */
  def jaccardPairsPrefix(docs: DataFrame, k: Int, threshold: Double,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardPairsPrefixFrom(shingleFrame(docs, k, idCol, textCol), threshold)

  /** Slack subtracted inside every PPJoin ceil/length comparison: the
    * float product t·sz (or t/(1+t)·(szA+szB)) can land a hair ABOVE
    * its exact rational value, rounding a bound up past it and pruning
    * a candidate whose Jaccard is exactly the threshold. The filters
    * are necessary conditions only — loosening them by ε admits at
    * most a few extra candidates, and the exact verify keeps the
    * output precise. */
  private val PrefixEps = 1e-9

  private def jaccardPairsPrefixFrom(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    val prefix = sh.join(freq, "s")
      .withColumn("pos", row_number().over(w))
      .join(sizes, "id")
      .where(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz") - PrefixEps) + 1)
      .select(col("id"), col("s"), col("pos"), col("sz"))
    // PPJoin's two extra necessary conditions, evaluated INSIDE the
    // join so pruned pairs never materialize (both sides share the one
    // global df-asc shingle order, so positions are comparable):
    //  - length filter: J ≥ t forces min(szA,szB) ≥ t·max(szA,szB);
    //  - positional filter: a match at (posA, posB) caps the overlap at
    //    1 + min(szA−posA, szB−posB), which must reach the minimal
    //    required overlap ⌈t/(1+t)·(szA+szB)⌉. A pair passing on ANY
    //    shared prefix shingle survives (superset of strict PPJoin,
    //    subset of prefix-only), and the verify is exact either way.
    val requiredOverlap =
      ceil(lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")) - PrefixEps)
    val overlapUpperBound =
      lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") - PrefixEps &&
          col("b.sz") >= lit(threshold) * col("a.sz") - PrefixEps &&
          overlapUpperBound >= requiredOverlap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    verifyExact(cands, sh, threshold)
  }

  /** MinHash signatures: numHashes permutations approximated by seeded
    * xxhash64 over the shingle hash; one aggregation pass (explode
    * shingles → min per seed). */
  def minhashSignatures(docs: DataFrame, k: Int, numHashes: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minhashSignaturesFrom(shingleFrame(docs, k, idCol, textCol), numHashes)

  private def minhashSignaturesFrom(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(j => min(xxhash64(lit(j), col("s"))).as(s"h$j"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** (id, band, bh) LSH bucket rows from a signature frame: the
    * signature is cut into `bands` bands of `rows` hashes, each band
    * hashed to one bucket key. (package-visible: the streaming
    * near-dup store derives buckets from persisted signatures.) */
  private[graft] def bandBuckets(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"h${b * rows + r}"))
      struct(lit(b).as("band"), hash(cols: _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join per
    * band, then verify candidates with exact Jaccard ≥ threshold. The
    * signature build and the verify join share one shingle frame. */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.5,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = shingleFrame(docs, k, idCol, textCol)
    val buckets = bandBuckets(minhashSignaturesFrom(sh, numHashes), bands, numHashes / bands)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyExact(candidates, sh, threshold)
  }

  /** Incremental near-dup detection: MinHash-LSH pairs between a new
    * batch and an already-ingested corpus — the nightly-batch shape
    * that pairs with [[exactIncremental]]. Only cross pairs
    * (new × seen) are generated: the bucket join matches new-batch
    * bucket rows against seen-corpus bucket rows, so yesterday's
    * corpus is never self-joined. Returns (id_a = new doc, id_b = seen
    * doc, jaccard) for verified pairs with Jaccard ≥ threshold. An id
    * appearing in both frames (a doc re-submitted, possibly edited) is
    * safe: sizes/intersections are computed per side and the trivial
    * (x, x) pair is excluded.
    *
    * Scale: the seen side's signatures/buckets are a pure function of
    * its documents — in a deployment they are computed once at ingest
    * and persisted, so a nightly run prices only the new batch's
    * signatures plus a bucket-key equi-join whose seen side is read
    * pre-bucketed. The exact-verify tail touches seen-corpus shingles
    * only for docs that land in a shared bucket. */
  def minhashLshIncremental(newDocs: DataFrame, seenDocs: DataFrame,
                            k: Int = 3, numHashes: Int = 32, bands: Int = 8,
                            threshold: Double = 0.5,
                            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(newDocs.sparkSession)
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shNew = shingleFrame(newDocs, k, idCol, textCol, spread = false)
    val shSeen = shingleFrame(seenDocs, k, idCol, textCol, spread = false)
    val newBk = bandBuckets(minhashSignaturesFrom(shNew, numHashes), bands, rows)
    val seenBk = bandBuckets(minhashSignaturesFrom(shSeen, numHashes), bands, rows)
    val candidates = newBk.as("a")
      .join(seenBk.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") =!= col("b.id")) // a re-ingested id is never its own dup
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // two-sided packed-array verify (see verifyExactSided): per-side
    // stats stay intact for re-submitted ids, and the verify shuffles
    // candidate-count rows rather than candidates × shingle rows
    verifyExactSided(candidates, shNew, shSeen, threshold)
  }

  /** Duplicate clusters from a near-dup pair list: connected components
    * over the pair graph, labelling every document with the minimum doc
    * id of its component — the canonical "pick one survivor per
    * duplicate cluster" step that follows any pair generator
    * ([[jaccardPairs]], [[minhashLshPairs]], embedding near-dups).
    * Returns (doc_id, cluster_id); the survivor of a cluster is the doc
    * with doc_id == cluster_id. Only documents that appear in at least
    * one pair are returned (singletons are trivially their own cluster
    * and would dominate the output at corpus scale).
    *
    * Algorithm: min-label propagation with pointer-doubling compression.
    * Each round (a) relaxes every label against its graph neighbours'
    * labels (one join + one groupBy on 16-byte rows), then (b) replaces
    * each label with its label's label (one self-join) — the doubling
    * step collapses label chains geometrically, so convergence takes
    * O(log diameter) rounds instead of O(diameter) for plain
    * propagation. Near-dup components are shallow in practice (LSH
    * emits most intra-cluster pairs directly), so typical corpora
    * converge in 2-3 rounds.
    *
    * Scale: the frames shuffled here are (long, long) pairs — the
    * documents themselves never enter. Each round ends in a
    * `localCheckpoint` so the iterative plan's lineage stays O(1)
    * instead of growing by two joins per round (the classic iterative-
    * DataFrame blowup); the convergence probe rides on the checkpoint's
    * materialized blocks. Superseded rounds' blocks are freed by the
    * ContextCleaner once unreferenced.
    */
  def dupClusters(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                  maxRounds: Int = 30, driverEdgeCap: Long = 100000L): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      // lazy-safe: materialized by the UNCONDITIONAL count below —
      // which must run on every path: short-circuiting it away for
      // non-integral ids would leave edges' first materialization to
      // round 0's plan, which reads it from BOTH union legs (the
      // getOrCompute race class this file's sweep removes)
      .sharedCheckpoint(eager = false) // shared: count probe + whichever path wins
    // Adaptive split, same measured-stats pattern as jaccardPairsAdaptive:
    // an edge list that fits in one task (cap ≈ 1.6 MB of longs) is a
    // single-node problem — union-find on the driver beats a round of
    // distributed jobs by an order of magnitude. Above the cap the
    // distributed label-propagation path runs; the near-dup pair list is
    // orders smaller than the corpus, so at 100 TB either side of the
    // split is exercised depending on how duplicated the corpus is.
    // The driver path needs lossless long ids, so non-integral id
    // columns (strings, doubles) always take the distributed path.
    val integralIds = pairs.schema(aCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // the count doubles as the edges materializer — ALWAYS run it (its
    // result routes the integral path; non-integral ids still need the
    // blocks materialized single-site before sym's multi-leg union)
    val nEdges = edges.count()
    if (integralIds && nEdges <= driverEdgeCap)
      return dupClustersDriver(pairs, edges, aCol)
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      // lazy-safe: round 0's EAGER iterativeCheckpoint right below materializes sym from its one groupBy site
      .sharedCheckpoint(eager = false) // reused every round: both joins below
    // round 0: each node's label = min(self, direct neighbours).
    // Per-round checkpoints are iterativeCheckpoint (localCheckpoint
    // even in reliable mode): each round supersedes the last, and a
    // reliable write per round would grow the checkpoint dir without
    // bound — see Checkpoints.iterative.
    var labels = sym.groupBy("u").agg(least(min(col("v")), min(col("u"))).as("l"))
      .iterativeCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // (a) relax: l'(u) = min(l(u), min over neighbours v of l(v));
      // the pre-round label rides along so the convergence probe below
      // is a column scan over the checkpointed blocks, not another join
      val nbrMin = sym
        .join(labels.select(col("u").as("v"), col("l").as("lv")), "v")
        .groupBy("u").agg(min(col("lv")).as("ln"))
      val prop = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), least(col("l"), coalesce(col("ln"), col("l"))).as("l"),
          col("l").as("lPrev"))
      // (b) compress: l''(u) = l'(l'(u)) — labels are always node ids
      // present in `prop`, so the lookup is total (coalesce is belt-and-
      // braces for the self-labelled minimum of each component)
      val next = prop
        .join(prop.select(col("u").as("l"), col("l").as("ll")), Seq("l"), "left")
        .select(col("u"), coalesce(col("ll"), col("l")).as("l"),
          (coalesce(col("ll"), col("l")) =!= col("lPrev")).as("ch"))
        .iterativeCheckpoint()
      converged = next.where(col("ch")).isEmpty
      labels = next.select("u", "l")
      round += 1
    }
    val out = labels.select(col("u").as("doc_id"), col("l").as("cluster_id"))
    // the final frame OUTLIVES the loop: in reliable mode it must not
    // ride the last round's executor-local blocks (Checkpoints.iterative
    // doc) — re-anchor it through the reliable-aware share. Non-reliable
    // sessions keep the already-materialized local blocks as-is.
    if (Checkpoints.reliableOn(pairs.sparkSession)) out.sharedCheckpoint(eager = true) else out
  }

  /** Bounded driver-side path of [[dupClusters]]: union-find with path
    * compression over ≤ `driverEdgeCap` collected edges. Output ids are
    * cast back to the input id column's type so both paths are
    * interchangeable. */
  private def dupClustersDriver(pairs: DataFrame, edges: DataFrame,
                                aCol: String): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.collect().foreach { row =>
      val u = row.get(0).asInstanceOf[Number].longValue
      val v = row.get(1).asInstanceOf[Number].longValue
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv } // min-id root
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    val dt = pairs.schema(aCol).dataType
    parent.keys.toSeq.sorted.map(u => (u, find(u))).toDF("doc_id", "cluster_id")
      .select(col("doc_id").cast(dt).as("doc_id"),
        col("cluster_id").cast(dt).as("cluster_id"))
  }

  /** Filter a corpus to duplicate-cluster survivors: drops every doc
    * that appears in `clusters` under a label other than its own id
    * (i.e. non-canonical members), keeps everything else — survivors
    * and never-paired singletons alike. The anti-join side carries only
    * the loser ids (long), so at 100 TB the exchange is bounded by the
    * duplicate count, not the corpus. */
  def applyClusters(docs: DataFrame, clusters: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val losers = clusters.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep-K soft dedup: cap every duplicate cluster at its
    * `keepPerCluster` lowest-id members instead of collapsing to one —
    * the "duplication carries signal" middle ground (a page mirrored
    * everywhere is boilerplate, but 2–3 copies of a popular document
    * can be worth keeping; see the duplication-aware sampling
    * literature). `keepPerCluster = 1` degenerates to
    * [[applyClusters]]. The rank window partitions by cluster id —
    * cluster-count-sized state, never corpus-sized. */
  def capClusters(docs: DataFrame, clusters: DataFrame, keepPerCluster: Int,
                  idCol: String = "doc_id"): DataFrame = {
    require(keepPerCluster >= 1, s"keepPerCluster must be >= 1, got $keepPerCluster")
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("doc_id").asc)
    val losers = clusters.withColumn("__r", row_number().over(w))
      .where(col("__r") > keepPerCluster)
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Jaccard similarity SPECTRUM: histogram of J over every
    * co-shingled pair — the diagnostic that picks a dedup threshold
    * from data instead of folklore (a bimodal spectrum separates
    * boilerplate overlap from true duplicates; the valley is the
    * threshold). Bin = (inter·bins) div union in exact integer
    * arithmetic — J = 1 clamps into the top bin — so any engine
    * reproduces every count.
    *
    * Scale: candidate volume is the inverted index's Σ_s C(df_s, 2) —
    * the same term the adaptive pair planner measures; run the
    * spectrum on a [[Sampling.hashSample]] of the corpus (a spectrum
    * is a distribution estimate, a deterministic sample of it is the
    * practice) rather than all pairs at 100 TB. */
  def jaccardSpectrum(docs: DataFrame, k: Int = 3, bins: Int = 10,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    // r15: shingleFrame already returns an EAGER shared checkpoint —
    // the second .sharedCheckpoint here double-materialized the frame
    // (one extra full pass + duplicate blocks) for no added sharing
    val sh = shingleFrame(docs, k, idCol, textCol)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sza")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("szb")), "id_b")
      .select(least(expr(s"inter * $bins div (sza + szb - inter)"),
        lit((bins - 1).toLong)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
  }

  /** Keep-BEST-copy dedup: per duplicate cluster, survive the member
    * with the highest `priority` (ties by id asc) instead of
    * [[applyClusters]]' min-id rule — the form real curation uses
    * ("of the five mirrors of this article, keep the cleanest copy").
    * `priority` is any column expression over `docs` (a quality
    * score, a source-trust rank, recency). Docs outside the cluster
    * frame survive untouched.
    *
    * Scale: same shape as [[capClusters]] — the rank window partitions
    * by cluster over the duplicate-bounded clusters frame; the corpus
    * side is one anti-join on ids. */
  def keepBest(docs: DataFrame, clusters: DataFrame, priority: Column,
               idCol: String = "doc_id"): DataFrame = {
    val pr = docs.select(col(idCol).as("doc_id"), priority.as("__p"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__p").desc, col("doc_id").asc)
    val losers = clusters.select(col("doc_id"), col("cluster_id"))
      .join(pr, "doc_id")
      .withColumn("__r", row_number().over(w))
      .where(col("__r") > 1)
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Duplication-aware loss weights — the soft-dedup alternative to
    * dropping duplicates: every doc gets weight 1/|its cluster| (as
    * weight_e6 = 1e6 div size, exact integer floor), so each duplicate
    * CLUSTER contributes one unit of training mass however many copies
    * it has, and unpaired docs keep weight 1. Downstream loss scales
    * per-example by weight_e6/1e6 instead of discarding — the
    * repetition-penalty form of dedup (cf. the keep-K cap in
    * [[capClusters]], which hard-drops instead).
    *
    * Scale: cluster sizes aggregate over the clusters frame (bounded
    * by the duplicate count, not the corpus); the corpus-side joins
    * carry only (id, cluster_id, size) longs — both are broadcast-
    * sized in practice and hash joins regardless. */
  def dupWeights(docs: DataFrame, clusters: DataFrame,
                 idCol: String = "doc_id"): DataFrame = {
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("__csz"))
    docs.select(col(idCol))
      .join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .select(col(idCol),
        coalesce(col("__csz"), lit(1L)).as("__csz"))
      .select(col(idCol), expr("1000000 div __csz").as("weight_e6"))
  }

  /** Leakage-safe train/test split: near-duplicate clusters NEVER
    * straddle the split — the classic eval-contamination failure where
    * a test document's near-copy sits in the training set. Every doc
    * is assigned a representative (its cluster's min id via
    * [[dupClusters]], or its own id if never paired) and the split
    * decision hashes the REPRESENTATIVE ([[Sampling.detHash]], so
    * test rate ≈ testBuckets/97), making it deterministic, reproducible
    * across runs, and uniform over clusters rather than docs.
    *
    * Scale: the clusters frame is bounded by the duplicate count; the
    * corpus-side join carries only (id, rep) longs and the split column
    * derives from rep with no further exchange. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, testBuckets: Int = 10,
                       idCol: String = "doc_id"): DataFrame = {
    require(testBuckets >= 0 && testBuckets <= Sampling.Buckets,
      s"testBuckets must be in [0, ${Sampling.Buckets}]")
    val reps = dupClusters(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    docs.select(col(idCol))
      .join(reps, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("rep"))
      .withColumn("split",
        when(Sampling.detHash(col("rep")) < testBuckets, lit("test"))
          .otherwise(lit("train")))
  }

  /** SimHash over token hashes: per bit, sign-sum of token hash bits;
    * assembled with bit arithmetic — all built-in expressions. Default
    * is 64-bit xxhash64; pass `tokenHash = TextAnalysis.polyHash` with
    * `bits = 30` for a signature any SQL engine can replicate exactly
    * (the driver-oracle configuration). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              tokenHash: Column => Column = xxhash64(_), bits: Int = 64): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession) // polyHash configs
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", tokenHash(col("t")))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val summed = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    summed.select(col("id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private lazy val shLog = org.slf4j.LoggerFactory.getLogger(getClass)

  /** SimHash near-dup pairs sub-quadratically: all unordered pairs
    * whose [[simhash]] signatures differ in ≤ `maxHamming` bits.
    * Candidate generation is the pigeonhole band trick (Manku et al.
    * 2007, the web-crawl simhash-dedup paper): cut the signature into
    * `maxHamming + 1` contiguous blocks — two signatures within
    * Hamming distance d must agree EXACTLY on at least one block — so
    * an equi-join per block on the block value surfaces every true
    * pair, and a `bit_count(xor)` verify on the carried signatures
    * discards the false candidates. Output: (id_a, id_b, hamming),
    * id_a < id_b, exact (candidate recall is 1 by construction).
    *
    * Scale: the signature frame is one row per doc; the only exchange
    * is the block-value equi-join, whose fan-out is bounded by block
    * collision counts. The block width bits/(d+1) sets the bucket
    * space: at 64 bits / d = 3 each block has 2¹⁶ values — the regime
    * the paper runs at web scale. Narrow blocks (< 12 bits, e.g. the
    * 30-bit oracle configuration) collapse to few buckets and go
    * quadratic on large corpora — a WARN names the width and points at
    * the 64-bit configuration; the verify itself stays exact either
    * way. Nothing wider than (id, sig, block) longs ever shuffles. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   tokenHash: Column => Column = xxhash64(_),
                   bits: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, $bits), got $maxHamming")
    val nBlocks = maxHamming + 1
    if (bits / nBlocks < 12)
      shLog.warn(s"simhashPairs: block width ${bits / nBlocks} bits " +
        s"($bits-bit signatures over $nBlocks blocks) gives only " +
        s"${1L << (bits / nBlocks)} buckets per block — candidate volume " +
        "goes quadratic on large corpora in this configuration; use " +
        "bits = 64 (2^16 buckets at maxHamming = 3) at scale.")
    val sig = simhash(docs, idCol, textCol, tokenHash, bits).sharedCheckpoint(eager = true)
    val banded = simhashBands(sig, nBlocks, bits)
    banded.as("a")
      .join(banded.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash"), col("b.simhash")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** (id, simhash, blk, bv) pigeonhole block rows from a signature
    * frame — [[simhashPairs]]' candidate key space, shared with the
    * incremental variant and the streaming twin. */
  private[graft] def simhashBands(sig: DataFrame, nBlocks: Int, bits: Int): DataFrame = {
    val blockCols = (0 until nBlocks).map { b =>
      val lo = b * bits / nBlocks
      val len = (b + 1) * bits / nBlocks - lo
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bv"))
    }
    sig
      .select(col("id"), col("simhash"), explode(array(blockCols: _*)).as("bk"))
      .select(col("id"), col("simhash"),
        col("bk.blk").as("blk"), col("bk.bv").as("bv"))
  }

  /** Incremental SimHash near-dup detection: pigeonhole pairs between
    * tonight's batch and the already-ingested corpus — completes the
    * incremental family ([[exactIncremental]], [[minhashLshIncremental]],
    * `TextAnalysis.spanDedupIncremental`, `Similarity.ivfNearDupIncremental`)
    * for the signature-based proxy. Only cross pairs generate: the
    * block join matches new-batch block rows against seen-corpus block
    * rows (a re-submitted id is never its own dup), and the exact
    * hamming verify keeps recall 1 within `maxHamming` by the same
    * pigeonhole argument as [[simhashPairs]]. Output (id_a = new doc,
    * id_b = seen doc, hamming).
    *
    * Scale: the seen side's signatures are a pure function of its
    * documents — a deployment persists them at ingest (8 B per doc)
    * and the nightly run prices only the batch's signatures plus the
    * block equi-join; text never shuffles on either side. */
  def simhashPairsIncremental(newDocs: DataFrame, seenDocs: DataFrame,
                              maxHamming: Int = 3,
                              idCol: String = "doc_id", textCol: String = "text",
                              tokenHash: Column => Column = xxhash64(_),
                              bits: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, $bits), got $maxHamming")
    val nBlocks = maxHamming + 1
    val newBands = simhashBands(
      simhash(newDocs, idCol, textCol, tokenHash, bits), nBlocks, bits)
    val seenBands = simhashBands(
      simhash(seenDocs, idCol, textCol, tokenHash, bits), nBlocks, bits)
    newBands.as("a")
      .join(seenBands.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash"), col("b.simhash")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Per-source dedup-rate report — the "which crawl is feeding us
    * copies" row of a release: for each source, document count, exact
    * duplicate losers (non-first copy of an identical normalized
    * text), NEAR-dup losers from the supplied pair graph (cluster
    * non-survivors that are not already exact losers — no double
    * count), and the combined drop rate. A source whose rate spikes
    * is either a mirror of another source or re-crawling itself.
    * Output: (source, n_docs, n_exact, n_near, drop_rate_e6).
    *
    * Scale: exact losers come from one digest-keyed window (8-byte
    * keys, the [[exact]] shuffle); near losers from [[dupClusters]]'
    * duplicate-bounded frame; the report aggregate shuffles
    * |sources| rows. Text never shuffles. */
  def dedupRateBySource(docs: DataFrame, pairs: DataFrame,
                        srcCol: String = "source",
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol).asc)
    val exactLosers = docs
      .select(col(idCol), xxhash64(normText(col(textCol))).as("__h"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") > 1)
      .select(col(idCol)).sharedCheckpoint(eager = true) // reused: near-loser anti-join + report join
    val nearLosers = dupClusters(pairs)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
      .join(exactLosers, Seq(idCol), "left_anti")
    docs.select(col(idCol), col(srcCol))
      .join(exactLosers.withColumn("__e", lit(1L)), Seq(idCol), "left")
      .join(nearLosers.withColumn("__n", lit(1L)), Seq(idCol), "left")
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__e"), lit(0L))).as("n_exact"),
        sum(coalesce(col("__n"), lit(0L))).as("n_near"))
      .select(col(srcCol), col("n_docs"), col("n_exact"), col("n_near"),
        expr("(n_exact + n_near) * 1000000 div n_docs").as("drop_rate_e6"))
  }

  /** Pairwise source content-overlap matrix — the mirror-detection /
    * provenance report a multi-source corpus release runs before
    * assigning mixture weights: two crawls of the same site, a dataset
    * re-hosted under a new name, or a subset re-released as "curated"
    * all show up as a high-Jaccard source pair. One row per unordered
    * source pair (a < b): per-source distinct-content counts, the
    * shared distinct-content count, and the content Jaccard (4 dp).
    * Pairs with no overlap still report (shared = 0) — absence of
    * overlap is exactly what the release check wants to see.
    *
    * Scale: content travels as 8-byte xxhash64 digests of normalized
    * text — the one corpus-sized exchange is the (source, digest)
    * distinct; the digest self-join fans out at most C(|sources|, 2)
    * pairs per digest, and everything downstream of it is the
    * |sources|²-bounded matrix (the per-source count frame is
    * |sources| rows, so its cross pairing is driver-trivial).
    */
  def sourceOverlap(docs: DataFrame, srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val dig = docs
      .select(col(srcCol).as("src"), xxhash64(normText(col(textCol))).as("h"))
      // lazy-safe: materialized single-site by the matrix-skeleton collect below
      .distinct().sharedCheckpoint(eager = false)
    val shared = dig.as("a")
      .join(dig.as("b"), col("a.h") === col("b.h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    // the matrix skeleton (every pair incl. zero-overlap ones) builds
    // from a driver-side |sources|-row collect — bounded by
    // construction, and the alternative (counts × counts) plans the
    // nested-loop join the plan audit forbids
    val cnt = dig.groupBy("src").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val pairs = (for { i <- cnt.indices; j <- (i + 1) until cnt.length }
      yield (cnt(i)._1, cnt(j)._1, cnt(i)._2, cnt(j)._2))
      .toSeq.toDF("source_a", "source_b", "n_a", "n_b")
    pairs.join(shared, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("shared"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("shared"),
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"), 4).as("jaccard"))
  }
}
