package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import graft.ops.Similarity

/** Scaling harness for the round-5 study (BASELINE.md §G): times the
  * heavy documents/embeddings queries from the driver surface on a
  * [[GenScaleData]] corpus, plus an embedding near-dup pass at a REAL
  * threshold (0.7) — the regime the LSH sizing is designed for, unlike
  * the 0.45 degenerate demo the driver query pins.
  *
  * Usage: Test/runMain graft.tools.ScaleBench <dir> [q1,q2,...]
  * (optional second arg restricts to a comma-separated subset; the
  * synthetic names e_near_dup_0.7 / d_curation_funnel_minhash select
  * the two non-driver measurements). Prints one JSON line {query: sec}.
  */
object ScaleBench {

  val AllQueries: Seq[String] = Seq(
    "d_curation_funnel", "d_split_assign", "d_dup_clusters",
    "d_jaccard_pairs", "d_repeated_spans", "d_pmi_pairs",
    "d_minhash_lsh", "d_tfidf_topk", "e_cosine_topk", "d_pack_contexts",
    "d_span_dedup", "d_dsir_weights",
    // round-7 session-3 additions (§G7)
    "d_cms_counts", "d_temperature_mix", "d_dup_weights", "d_dedup_best",
    "d_span_lookup", "d_hybrid_topk",
    // round-7 session-5 additions (§G9)
    "d_simhash_pairs", "d_dedup_eval", "d_cluster_sizes", "d_upsample_mix",
    "d_strip_markup", "d_length_outliers", "d_zipf_slope", "d_fertility",
    "d_dedup_rate", "d_curation_lexicon", "d_training_upsample",
    // round-8 additions (§G13)
    "d_pack_efficiency", "d_domain_reweight",
    // round-10 addition (§G15): the iterative DoReMi loop — two
    // corpus-sized count passes + K vocab-sized rounds; the decade
    // exponent should match d_domain_reweight's (the loop adds
    // vocab-sized work only)
    "d_doremi_weights",
    // §G15b: the full DoReMi training prep (curate → fit → upsample →
    // shuffle → stripe) — bounded by the funnel + fit + shuffle stages
    "d_training_doremi",
    // round-11 session 2 (§G17b): the entropy-gated funnel — the row
    // that caught the filter-inlining quadratic (842 s at sf0.1 before
    // the args-only-lambda rewrite + gate-side materialization)
    "d_curation_entropy",
    // round-12 (§G17 addendum): the DoReMi × curriculum composition —
    // prepareDoremi's fit plus the epoch-major curriculum rank; the
    // decade exponent should track d_training_doremi's (the rank adds
    // a |copies|·|lengths|-bounded serial frame only)
    "d_training_doremi_curr")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    def want(n: String) = only.forall(_.contains(n))
    val Queries = AllQueries.filter(want)
    val spark = GraftSession.builder(32, 32).appName("graft-scalebench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm pass at the smallest driver SF (codegen/JIT), as Bench does
    val warmDir = "/root/testdata/sf0.001"
    Queries.foreach { n =>
      try Bench.force(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    val timed = Queries.map { n =>
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(n)(spark, dir))
      n -> (System.nanoTime() - t0) / 1e9
    }
    // embedding near-dup at the designed-for threshold: sub-quadratic
    // LSH sizing (vs the 0.45 demo regime, which is documented as
    // effectively quadratic)
    val nd = if (!want("e_near_dup_0.7")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val t0 = System.nanoTime()
      Bench.force(Similarity.nearDupPairs(emb, threshold = 0.7, dims = 64))
      ("e_near_dup_0.7", (System.nanoTime() - t0) / 1e9)
    }
    // IVF-bucketed near-dup at the real threshold — the bucket-bounded
    // scale path (nlist grown with n keeps expected cell size constant)
    val ivfNd = if (!want("e_ivf_near_dup_0.7")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val t2 = System.nanoTime()
      Bench.force(Similarity.ivfNearDupPairs(emb, threshold = 0.7, nlist = nlist))
      ("e_ivf_near_dup_0.7", (System.nanoTime() - t2) / 1e9)
    }
    // the same IVF pass with the hot-cell guard DISABLED — on a
    // clustered GenScaleData corpus the delta is what the guard buys
    // (Σ C(|cell|,2) re-bounded); on isotropic corpora the two rows
    // should agree to noise (guard never fires, counts pass is cheap)
    val ivfNdNoGuard = if (!want("e_ivf_near_dup_0.7_noguard")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val t = System.nanoTime()
      Bench.force(Similarity.ivfNearDupPairs(emb, threshold = 0.7, nlist = nlist,
        hotCellFactor = Double.PositiveInfinity))
      ("e_ivf_near_dup_0.7_noguard", (System.nanoTime() - t) / 1e9)
    }
    // same pass through the two-level quantizer: assignment drops from
    // nlist to ≈ 3·√nlist dots per vector (the n × nlist escape hatch);
    // prints the pair-count delta so the recall cost is visible
    val ivfNdHier = if (!want("e_ivf_near_dup_0.7_hier")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val t3 = System.nanoTime()
      Bench.force(Similarity.ivfNearDupPairs(emb, threshold = 0.7, nlist = nlist,
        superProbe = Some(2)))
      ("e_ivf_near_dup_0.7_hier", (System.nanoTime() - t3) / 1e9)
    }
    // the same IVF pair pass through the SDC-PQ prefilter: the wide
    // cell self-join carries 8-byte codes instead of 260-B vectors and
    // exact cosine runs only on SDC survivors — the delta vs
    // e_ivf_near_dup_0.7 is what symmetric PQ buys on the pair workload
    val sdcNd = if (!want("e_pq_near_dup_0.7")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val t = System.nanoTime()
      // ksub = 16 keeps the plan-literal SDC table at m·ksub² = 2048
      // doubles (ksub = 256 would ship a 4 MB table in every task)
      Bench.force(Similarity.ivfPqNearDupPairs(emb, threshold = 0.7, nlist = nlist,
        m = 8, ksub = 16, sdcMargin = 0.3))
      ("e_pq_near_dup_0.7", (System.nanoTime() - t) / 1e9)
    }
    // flat IVF with the quantizer PINNED — the fair baseline for the
    // pinned SDC row below (both exclude their one-time training)
    val ivfNdPinned = if (!want("e_ivf_near_dup_0.7_pinned")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val cents = Similarity.ivfCentroids(emb, nlist)
      val t = System.nanoTime()
      Bench.force(Similarity.ivfNearDupPairs(emb, threshold = 0.7, nlist = nlist,
        centroids = Some(cents)))
      ("e_ivf_near_dup_0.7_pinned", (System.nanoTime() - t) / 1e9)
    }
    // the same SDC pass with the quantizer + codebooks PINNED (trained
    // untimed first): the deployed shape — a persisted index trains
    // once, every nightly pair pass serves from it — so this row is
    // the recurring cost and (cold − pinned) is the one-time build
    val sdcNdPinned = if (!want("e_pq_near_dup_0.7_pinned")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val cents = Similarity.ivfCentroids(emb, nlist)
      val cbs = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
      val t = System.nanoTime()
      Bench.force(Similarity.ivfPqNearDupPairs(emb, threshold = 0.7, nlist = nlist,
        m = 8, ksub = 16, sdcMargin = 0.3,
        centroids = Some(cents), codebooks = Some(cbs)))
      ("e_pq_near_dup_0.7_pinned", (System.nanoTime() - t) / 1e9)
    }
    // runWithSemantic END TO END (§G14): the full 6-stage hybrid
    // text+vector funnel in its scale configuration — MinHash pair
    // source for stage 4 and the IVF tail's nlist grown ∝ the aligned
    // embedding count (the d_curation_semantic query pins the oracle
    // config: Exact pairs + nlist 8). This is the one major composition
    // whose decade exponent was previously inferred from its stages; a
    // cross-term between the text funnel and the IVF tail would only
    // show here.
    val semE2e = if (!want("d_curation_semantic_e2e")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val nlist = Similarity.suggestNlist(emb.count())
      val t = System.nanoTime()
      Bench.force(graft.ops.Curation.runWithSemantic(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"), emb,
        graft.ops.Curation.Params(
          pairSource = graft.ops.Curation.PairSource.MinHash(),
          semanticIvfNlist = Some(nlist), semanticIvfNprobe = 4))._2)
      ("d_curation_semantic_e2e", (System.nanoTime() - t) / 1e9)
    }
    // the same composition in the ORACLE configuration the driver
    // bench times (d_curation_semantic: Exact pair source, nlist 8) —
    // the row that adjudicates the r6 → r8 driver-bench move
    val semOracle = if (!want("d_curation_semantic_oracle")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val t = System.nanoTime()
      Bench.force(graft.ops.Curation.runWithSemantic(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"), emb,
        graft.ops.Curation.Params(
          semanticIvfNlist = Some(8), semanticIvfNprobe = 4))._2)
      ("d_curation_semantic_oracle", (System.nanoTime() - t) / 1e9)
    }
    // DoReMi training prep in the SCALE configuration (MinHash pair
    // source; the driver query pins the oracle's exact-Jaccard stage,
    // which — like d_curation_semantic_oracle — cannot complete the
    // 500k decade: >80 GB spill, disk-full; that boundary is §G15b's
    // adjudication, not a defect)
    val doremiMh = if (!want("d_training_doremi_minhash")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t = System.nanoTime()
      Bench.force(graft.ops.TrainingRun.prepareDoremi(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        nShards = 4, rounds = 2, seed = 1L,
        p = graft.ops.Curation.Params(
          pairSource = graft.ops.Curation.PairSource.MinHash())))
      ("d_training_doremi_minhash", (System.nanoTime() - t) / 1e9)
    }
    // NAKED-DEFAULTS rows (round 11, the r10 verdict's one scale-
    // killer): `Params()` now auto-selects the pair source (Exact ≤
    // 100k survivors, MinHash above) and the semantic tail's IVF
    // nlist (grown ∝ survivors). These rows prove a caller who touches
    // no knob completes every §G decade — including the 500k one the
    // old Exact default was measured dying on (>80 GB spill).
    // each row gets a JIT/codegen warm pass on the sf0.001 driver
    // corpus first (these names are not in the driver query map, so
    // the shared warm loop above never touches them)
    def warmDocsRow(name: String)(body: org.apache.spark.sql.DataFrame => Unit) =
      if (!want(name)) None else Some {
        body(spark.read.parquet(s"$warmDir/documents.parquet"))
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val t = System.nanoTime()
        body(docs)
        (name, (System.nanoTime() - t) / 1e9)
      }
    val runDefault = warmDocsRow("d_curation_run_default") { docs =>
      val (curated, funnel) = graft.ops.Curation.run(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"))
      Bench.force(curated); Bench.force(funnel)
    }
    val semDefault = if (!want("d_curation_semantic_default")) None else Some {
      def pass(d: String): Unit = {
        val docs = spark.read.parquet(s"$d/documents.parquet")
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
          .selectExpr("vec_id", "embedding")
        Bench.force(graft.ops.Curation.runWithSemantic(
          docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"), emb)._2)
      }
      pass(warmDir)
      val t = System.nanoTime()
      pass(dir)
      ("d_curation_semantic_default", (System.nanoTime() - t) / 1e9)
    }
    val doremiDefault = warmDocsRow("d_training_doremi_default") { docs =>
      Bench.force(graft.ops.TrainingRun.prepareDoremi(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        nShards = 4, rounds = 2, seed = 1L))
    }
    // the DoReMi × curriculum composition, naked defaults (§G17
    // addendum): same fit + upsample as d_training_doremi_default,
    // epoch-major curriculum rank instead of the hash permutation —
    // the delta between the two rows is the composition's whole cost
    val doremiCurrDefault = warmDocsRow("d_training_doremi_curr_default") { docs =>
      Bench.force(graft.ops.TrainingRun.prepareDoremiCurriculum(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        nShards = 4, rounds = 2, seed = 1L))
    }
    // curriculum prep, naked defaults (§G17): curate (Auto pair source)
    // → three-level curriculum rank → stripe. The driver's
    // d_training_curriculum row pins the oracle's Exact pair stage,
    // which cannot complete the 500k decade — this row is the config a
    // real caller runs
    val curriculumDefault = warmDocsRow("d_training_curriculum_default") { docs =>
      Bench.force(graft.ops.TrainingRun.prepareCurriculum(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        nShards = 4, seed = 1L))
    }
    // entropy-gated funnel, naked defaults (§G17b): the gate ahead of
    // the Auto pair source — at the 500k decade Auto routes MinHash,
    // and the gate's drops shrink what the banded stage pays
    val entropyDefault = warmDocsRow("d_curation_entropy_default") { docs =>
      Bench.force(graft.ops.Curation.funnel(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        graft.ops.Curation.Params(minEntropyE6 = Some(2500000L))))
    }
    // the curriculum rank ISOLATED from curation (§G17): orders the
    // whole corpus by text length — the three-level prefix sum's own
    // decade exponent, expected ≈ d_epoch_shuffle's (same shape plus
    // one distributed window)
    val curriculumOrderRow = warmDocsRow("d_curriculum_order") { docs =>
      Bench.force(graft.ops.Sampling.curriculumOrder(
        docs.selectExpr("doc_id", "cast(length(text) as long) as diff"),
        "diff", seed = 1L))
    }
    // curation funnel with the MinHash pair source — the documented
    // scale path for the near-dup stage (vs the Exact default the
    // d_curation_funnel query pins)
    val mh = if (!want("d_curation_funnel_minhash")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t1 = System.nanoTime()
      Bench.force(graft.ops.Curation.funnel(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        graft.ops.Curation.Params(
          pairSource = graft.ops.Curation.PairSource.MinHash())))
      ("d_curation_funnel_minhash", (System.nanoTime() - t1) / 1e9)
    }
    // ANN at a REALISTIC pruning config, flat IVF vs IVF-PQ: same
    // nlist/nprobe, so the delta isolates what PQ changes — the scan
    // side carries m-byte codes instead of full vectors, candidates
    // score by LUT lookups instead of d-dim dots, and only the
    // rerank survivors touch full precision
    def annPair(name: String, pq: Boolean, residual: Boolean = false) =
      if (!want(name)) None else Some {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .selectExpr("vec_id", "embedding")
        val n = emb.count()
        val nlist = Similarity.suggestNlist(n)
        val qs = emb.where(s"vec_id < 1000")
        val t = System.nanoTime()
        Bench.force(
          if (pq) Similarity.ivfPqTopK(emb, qs, k = 10, nlist = nlist, nprobe = 8,
            m = 8, ksub = 256, rerank = 100, residual = residual)
          else Similarity.ivfTopK(emb, qs, k = 10, nlist = nlist, nprobe = 8))
        (name, (System.nanoTime() - t) / 1e9)
      }
    val annFlat = annPair("e_ivf_topk_real", pq = false)
    val annPq = annPair("e_pq_topk_real", pq = true)
    val annPqRes = annPair("e_pq_residual_real", pq = true, residual = true)
    // mutual-kNN graph at a pruning config: k·n edges, cell-bounded
    // candidates, one self-join for mutualization
    val knn = if (!want("e_knn_graph_real")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val t = System.nanoTime()
      Bench.force(Similarity.mutualKnnPairs(emb, k = 10, nlist = nlist, nprobe = 4))
      ("e_knn_graph_real", (System.nanoTime() - t) / 1e9)
    }
    // incremental span dedup: half the corpus as the persisted gram
    // store, the other half as the new batch
    val spanInc = if (!want("d_span_incremental_real")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t = System.nanoTime()
      Bench.force(graft.ops.TextAnalysis.spanDedupIncremental(
        docs.where("doc_id % 2 = 1"),
        graft.ops.TextAnalysis.spanGramStore(docs.where("doc_id % 2 = 0"))))
      ("d_span_incremental_real", (System.nanoTime() - t) / 1e9)
    }
    // funnel with the opt-in exact-substring excision stage (MinHash
    // pair source so the near-dup stage rides its scale path too)
    val spansFunnel = if (!want("d_curation_funnel_spans")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t = System.nanoTime()
      Bench.force(graft.ops.Curation.funnel(
        docs.where("doc_id % 10 != 0"), docs.where("doc_id % 10 = 0"),
        graft.ops.Curation.Params(
          pairSource = graft.ops.Curation.PairSource.MinHash(),
          exciseSpans = true)))
      ("d_curation_funnel_spans", (System.nanoTime() - t) / 1e9)
    }
    // BM25: corpus-scan operator vs index serve from the posting store
    // (build untimed — encode-at-ingest is the deployed shape); serve
    // reads only the query terms' postings, so it should be FLAT
    // across corpus decades while the scan row grows
    def warmTimed(name: String)(mk: () => org.apache.spark.sql.DataFrame) = {
      Bench.force(mk()) // plan/codegen/JIT warm pass, untimed
      val t = System.nanoTime()
      Bench.force(mk())
      (name, (System.nanoTime() - t) / 1e9)
    }
    // 64-bit simhash pairs — the SCALE configuration (2^16-value
    // blocks at maxHamming 3), vs the 30-bit oracle config the
    // d_simhash_pairs driver row times
    val sh64 = if (!want("d_simhash_pairs_64")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t = System.nanoTime()
      Bench.force(graft.ops.Dedup.simhashPairs(docs, maxHamming = 3))
      ("d_simhash_pairs_64", (System.nanoTime() - t) / 1e9)
    }
    // the dedup audit at its SCALE configuration: 64-bit simhash
    // candidates scored against MinHash-LSH verified pairs (recall ≈ 1
    // at this sizing — the practical stand-in for exact Jaccard, whose
    // §G exponent makes it the wrong reference at depth)
    val dedupEval64 = if (!want("d_dedup_eval_64")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t = System.nanoTime()
      Bench.force(graft.ops.Eval.pairAgreement(
        graft.ops.Dedup.simhashPairs(docs, maxHamming = 3),
        graft.ops.Dedup.minhashLshPairs(docs, numHashes = 96, bands = 32)))
      ("d_dedup_eval_64", (System.nanoTime() - t) / 1e9)
    }
    // hard-negative mining through the IVF arm at a pruning config —
    // the contrastive-batch builder's recurring cost
    val hardNeg = if (!want("e_hard_negatives_real")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("label", (org.apache.spark.sql.functions.col("vec_id") % 50)
          .cast("int"))
        .selectExpr("vec_id", "embedding", "label")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000")
      val t = System.nanoTime()
      Bench.force(Similarity.hardNegatives(emb, qs, k = 10,
        nlist = Some(nlist), nprobe = 8))
      ("e_hard_negatives_real", (System.nanoTime() - t) / 1e9)
    }
    // the same mining workload through the two-level quantizer — the
    // n × nlist assignment-term escape hatch (§G9 third decade)
    val hardNegHier = if (!want("e_hard_negatives_hier")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("label", (org.apache.spark.sql.functions.col("vec_id") % 50)
          .cast("int"))
        .selectExpr("vec_id", "embedding", "label")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000")
      val t = System.nanoTime()
      Bench.force(Similarity.hardNegatives(emb, qs, k = 10,
        nlist = Some(nlist), nprobe = 8, superProbe = Some(2)))
      ("e_hard_negatives_hier", (System.nanoTime() - t) / 1e9)
    }
    // pinned-quantizer mining: centroids trained UNTIMED first — the
    // serve shape (train once at index build, mine nightly); the delta
    // vs the cold row is the one-time training cost
    val hardNegPinned = if (!want("e_hard_negatives_pinned")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("label", (org.apache.spark.sql.functions.col("vec_id") % 50)
          .cast("int"))
        .selectExpr("vec_id", "embedding", "label")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val cents = Similarity.ivfCentroids(emb, nlist)
      val qs = emb.where("vec_id < 1000")
      val t = System.nanoTime()
      Bench.force(Similarity.hardNegatives(emb, qs, k = 10,
        nlist = Some(nlist), nprobe = 8, superProbe = Some(2),
        centroids = Some(cents)))
      ("e_hard_negatives_pinned", (System.nanoTime() - t) / 1e9)
    }
    // PQ index BUILD, flat vs two-level assignment (§G10 follow-through
    // of the §G9 serve-side fix): build pays the same n × nlist
    // assignment term twice (residual-free codebook training is
    // nlist-independent, but the full-corpus encode assigns every
    // vector) — superProbe caps it at ≈ 3·√nlist dots per vector
    def pqBuild(name: String, sp: Option[Int], capPerCell: Int = 0) =
      if (!want(name)) None else Some {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .selectExpr("vec_id", "embedding")
        val n = emb.count()
        val nlist = Similarity.suggestNlist(n)
        val base = java.nio.file.Files.createTempDirectory("graft_pqb").toString
        val store = new graft.ops.PqIndexStore(spark, base, nlist = nlist,
          m = 8, ksub = 16, superProbe = sp,
          trainCap = if (capPerCell > 0) capPerCell * nlist else 0)
        val t = System.nanoTime()
        store.build(emb)
        (name, (System.nanoTime() - t) / 1e9)
      }
    // NOTE (round 10): superProbe = None is AUTO since round 9 — at
    // nlist ≥ 256 it resolves two-level, so the "flat" §G11 row must
    // now pin FlatAssign explicitly to keep measuring the flat term
    val pqBuildFlat = pqBuild("pq_index_build", Similarity.FlatAssign)
    val pqBuildHier = pqBuild("pq_index_build_hier", Some(2))
    // the deployed build shape: two-level assignment AND sampled
    // training (~50 vectors/centroid see the Lloyd loops; the corpus
    // is touched once, by the encode pass)
    val pqBuildSampled = pqBuild("pq_index_build_sampled", Some(2), capPerCell = 50)
    // §G11 addendum (round 10): the NAKED-defaults build — constructor
    // args only (superProbe AUTO, trainCap AUTO, sampleInit on). The
    // row proves a caller who touches no knob gets the capped path the
    // r8 study had to opt into (vs pq_index_build's pinned-flat term).
    val pqBuildDefault = if (!want("pq_index_build_default")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val base = java.nio.file.Files.createTempDirectory("graft_pqbd").toString
      val store = new graft.ops.PqIndexStore(spark, base, nlist = nlist,
        m = 8, ksub = 16)
      val t = System.nanoTime()
      store.build(emb)
      ("pq_index_build_default", (System.nanoTime() - t) / 1e9)
    }
    // Dim-prefix (MRL) serve vs full-width IVF serve at the SAME
    // nlist/nprobe/rerank, both with centroids pinned (trained untimed
    // — the deployed shape): the delta is the probe-term reduction the
    // prefix buys (p/d of the bytes and flops in assignment, probe
    // ranking, and the in-cell shortlist; the full-width exact rerank
    // touches only |queries| × rerank id-joined rows in both).
    val prefixServe = if (!want("e_dim_prefix_serve")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding").localCheckpoint()
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000").localCheckpoint()
      val prefix = 16 // of 64 dims — the dimPrefixRecall-approved width
      val slicedEmb = emb.selectExpr("vec_id",
        s"slice(embedding, 1, $prefix) as embedding")
      val prefCents = Similarity.ivfCentroids(slicedEmb, nlist)
      warmTimed("e_dim_prefix_serve")(() =>
        Similarity.dimPrefixTopK(emb, qs, k = 10, prefix = prefix,
          nlist = nlist, nprobe = 8, rerank = 100,
          centroids = Some(prefCents)))
    }
    val fullServe = if (!want("e_ivf_serve_full")) None else Some {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding").localCheckpoint()
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000").localCheckpoint()
      val cents = Similarity.ivfCentroids(emb, nlist)
      warmTimed("e_ivf_serve_full")(() =>
        Similarity.ivfTopK(emb, qs, k = 10, nlist = nlist, nprobe = 8,
          centroids = Some(cents)))
    }
    // The SAME prefix-vs-full pair at d = 512 — the regime MRL serving
    // is actually designed for (real text embeddings are 768–4096-d;
    // GenScaleData's are 64-d, where the prefix's flop saving cannot
    // pay for dimPrefixTopK's extra rerank join). Widening = tiling the
    // 64-d vector 8×: cosine is invariant under tiling (dot and both
    // norms scale by 8), so the candidate sets and recall semantics are
    // IDENTICAL to the 64-d rows — the pair isolates pure byte/flop
    // scaling with dimension. prefix = 64 keeps the probe stage at the
    // original width; the full-width row scans 8× the bytes.
    def widen(df: org.apache.spark.sql.DataFrame) = df.selectExpr("vec_id",
      "flatten(array_repeat(embedding, 8)) as embedding")
    val prefixServeWide = if (!want("e_dim_prefix_serve_w512")) None else Some {
      val emb = widen(spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")).localCheckpoint()
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000").localCheckpoint()
      val prefix = 64
      val slicedEmb = emb.selectExpr("vec_id",
        s"slice(embedding, 1, $prefix) as embedding")
      val prefCents = Similarity.ivfCentroids(slicedEmb, nlist)
      warmTimed("e_dim_prefix_serve_w512")(() =>
        Similarity.dimPrefixTopK(emb, qs, k = 10, prefix = prefix,
          nlist = nlist, nprobe = 8, rerank = 100,
          centroids = Some(prefCents)))
    }
    val fullServeWide = if (!want("e_ivf_serve_full_w512")) None else Some {
      val emb = widen(spark.read.parquet(s"$dir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")).localCheckpoint()
      val n = emb.count()
      val nlist = Similarity.suggestNlist(n)
      val qs = emb.where("vec_id < 1000").localCheckpoint()
      val cents = Similarity.ivfCentroids(emb, nlist)
      warmTimed("e_ivf_serve_full_w512")(() =>
        Similarity.ivfTopK(emb, qs, k = 10, nlist = nlist, nprobe = 8,
          centroids = Some(cents)))
    }
    val bm25Scan = if (!want("bm25_scan")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      warmTimed("bm25_scan")(() => graft.ops.TextAnalysis.bm25TopK(docs,
        Seq("spark", "query", "window"), 10))
    }
    val bm25Serve = if (!want("bm25_serve")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft_bm25_scale").toString
      val bm = new graft.streaming.StreamingBm25(spark, base)
      bm.ingestBatch(docs)
      bm.compactStore(maxFiles = 1) // force the sorted canonical layout
      warmTimed("bm25_serve")(() => bm.topK(Seq("spark", "query", "window"), 10))
    }
    // BM25 on a tailvocab corpus with RARE query terms (df ≪ n): the
    // regime where serve-vs-scan separates — serve's row bound is
    // Σ df(term), the scan re-tokenizes everything regardless
    val rareTerms = Seq("tail42", "tail123", "tail999")
    val bm25ScanRare = if (!want("bm25_scan_rare")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      warmTimed("bm25_scan_rare")(() =>
        graft.ops.TextAnalysis.bm25TopK(docs, rareTerms, 10))
    }
    val bm25ServeRare = if (!want("bm25_serve_rare")) None else Some {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft_bm25_rare").toString
      val bm = new graft.streaming.StreamingBm25(spark, base)
      bm.ingestBatch(docs)
      bm.compactStore(maxFiles = 1) // force the sorted canonical layout
      warmTimed("bm25_serve_rare")(() => bm.topK(rareTerms, 10))
    }
    val all = timed ++ nd ++ ivfNd ++ ivfNdNoGuard ++ ivfNdHier ++ sdcNd ++
      ivfNdPinned ++ sdcNdPinned ++ semE2e ++ semOracle ++ doremiMh ++
      runDefault ++ semDefault ++ doremiDefault ++ doremiCurrDefault ++
      curriculumDefault ++ entropyDefault ++ curriculumOrderRow ++ mh ++
      annFlat ++ annPq ++ annPqRes ++ knn ++ spanInc ++ spansFunnel ++
      sh64 ++ dedupEval64 ++ hardNeg ++ hardNegHier ++ hardNegPinned ++
      pqBuildFlat ++ pqBuildHier ++ pqBuildSampled ++ pqBuildDefault ++
      prefixServe ++ fullServe ++ prefixServeWide ++ fullServeWide ++
      bm25Scan ++ bm25Serve ++ bm25ScanRare ++ bm25ServeRare
    println(all.map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
