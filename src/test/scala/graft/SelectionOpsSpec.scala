package graft

import graft.ops.{Dedup, EventAnalytics, Retrieval, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-7 session-3 selection/retrieval
  * operators: RRF hybrid fusion, the count-min sketch family,
  * temperature mixture sampling, duplication-aware weights, and the
  * daily grouping-sets rollup. */
class SelectionOpsSpec extends SparkSpec {

  test("session operators fail loudly on invalid arguments") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s0")).toDF("doc_id", "text", "source")
    val arm = Seq((0L, 1L, 1L)).toDF("q_id", "n_id", "rank")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty, 5))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(arm), 0))
    intercept[IllegalArgumentException](TextAnalysis.cmsTopEstimates(docs, k = 0))
    intercept[IllegalArgumentException](TextAnalysis.cmsSketch(docs, depth = 0))
    intercept[IllegalArgumentException](TextAnalysis.cmsSketch(docs, width = 0))
    intercept[IllegalArgumentException](
      graft.ops.Sampling.temperatureRates(docs, alpha = 0.0))
    intercept[IllegalArgumentException](
      graft.ops.Sampling.temperatureRates(docs, targetFrac = 1.5))
    intercept[IllegalArgumentException](TextAnalysis.chunkDocs(docs, size = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkDocs(docs, size = 4, stride = 5)) // stride > size
    intercept[IllegalArgumentException](TextAnalysis.spanLookup(docs, "   "))
    intercept[IllegalArgumentException](TextAnalysis.gramNovelty(docs, docs, n = 1))
    intercept[IllegalArgumentException](graft.ops.Eval.rankMetrics(arm, arm, k = 0))
    intercept[IllegalArgumentException](
      graft.ops.EventAnalytics.funnel(docs, Seq("a"), withinMs = Some(0L)))
  }

  test("rrfFuse: floor-quantized contributions, score ties break by id") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L)).toDF("q_id", "n_id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 10L, 2L), (0L, 13L, 3L)).toDF("q_id", "n_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 4).orderBy("rank").collect()
    // contributions: rank1=16393, rank2=16129, rank3=15873; docs 10/11
    // tie at 32522 -> id asc; 12/13 tie at 15873 -> id asc
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 11L, 12L, 13L))
    assert(out(0).getLong(3) == 32522L && out(1).getLong(3) == 32522L)
    // the rank-68 half-boundary (1e6/128 = 7812.5) floors, never rounds
    val c = Seq((0L, 99L, 68L)).toDF("q_id", "n_id", "rank")
    assert(Retrieval.rrfFuse(Seq(c), k = 1).collect()(0).getLong(3) == 7812L)
  }

  test("hybridTopK with an empty dense arm degenerates to the BM25 order") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val terms = Seq("the", "data")
    val dense = Seq.empty[(Long, Long, Long)].toDF("q_id", "rank", "n_id")
    val fused = Retrieval.hybridTopK(docs, dense, terms, k = 5, depth = 10)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    val lex = TextAnalysis.bm25TopK(docs, terms, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(fused == lex)
  }

  test("hybridTopK fuses a persisted-index dense arm (zero-training serve path)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft_pq_hybrid").toString
    val store = new graft.ops.PqIndexStore(spark, base, nlist = 16, m = 8, ksub = 16)
    store.build(emb)
    // serve-path dense arm: exact configuration so the arm is the true
    // cosine ranking for query vector 0
    val dense = store.topK(emb, emb.where(col("vec_id") === 0), k = 10,
      nprobe = 16, rerank = 1000000)
    val fused = Retrieval.hybridTopK(docs, dense, Seq("the", "data"),
      k = 5, depth = 10).collect()
    assert(fused.length == 5)
    val lexIds = TextAnalysis.bm25TopK(docs, Seq("the", "data"), 10)
      .collect().map(_.getLong(0)).toSet
    val denseIds = dense.collect().map(_.getAs[Long]("n_id")).toSet
    assert(fused.forall(r => lexIds(r.getLong(2)) || denseIds(r.getLong(2))))
    // a doc ranked high by BOTH arms outranks single-arm docs of equal
    // single-arm rank: the fused top-1 carries strictly more mass than
    // any single-arm-only candidate can reach from rank 1
    val both = lexIds intersect denseIds
    if (both.nonEmpty) assert(fused(0).getLong(3) > 16393L)
  }

  test("fully-persistent hybrid serve equals the batch hybrid operator") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val terms = Seq("the", "data")
    val base = java.nio.file.Files.createTempDirectory("graft_hserve").toString

    // dense arm: persisted IVF-PQ index, exact config (≡ brute force)
    val pq = new graft.ops.PqIndexStore(spark, s"$base/pq", nlist = 16, m = 8, ksub = 16)
    pq.build(emb)
    val dense = pq.topK(emb, emb.where(col("vec_id") === 0), k = 20,
      nprobe = 16, rerank = 1000000)

    // lexical arm: the incremental BM25 index over the same docs,
    // ingested through the streaming build
    import spark.implicits._
    val in = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val bm = new graft.streaming.StreamingBm25(spark, s"$base/bm25")
    val q = bm.start(bm.readJsonDocs(in),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
    try {
      val lines = docs.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(col("doc_id"), col("text"))))
        .collect().map(_.getString(0))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/all.json"),
        lines.mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()

    // serve: rank the stored-arm outputs and fuse — ZERO corpus text
    // scans on the lexical side, zero training on the dense side
    val lex = Retrieval.rankByScore(
      bm.topK(terms, k = 20)
        .select(lit(0L).as("q_id"), col("doc_id").as("n_id"), col("score_e6")),
      "score_e6", 20)
    val denseArm = dense.where(col("rank") <= 20).select("q_id", "n_id", "rank")
    val served = Retrieval.rrfFuse(Seq(lex, denseArm), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // batch twin: one-shot scan-everything hybrid
    val batchDense = graft.ops.Similarity.ivfTopK(emb,
      emb.where(col("vec_id") === 0), k = 20, nlist = 16, nprobe = 16)
    val batch = Retrieval.hybridTopK(docs, batchDense, terms, k = 10, depth = 20)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served == batch, s"persistent serve diverged:\n$served\nvs\n$batch")
  }

  test("cms: estimate >= truth; exact at collision-free width; shard sketches merge") {
    val docs = Tables.documents(spark, sf)
    val rep = TextAnalysis.cmsTopEstimates(docs, k = 20, depth = 4, width = 1024L)
      .collect()
    assert(rep.length == 20)
    assert(rep.forall(r => r.getLong(2) >= r.getLong(1)),
      "CMS must never undercount")
    // width 2^30 > P: bucket == raw polyHash, collisions require a
    // full polyHash collision -> estimates exact
    val exact = TextAnalysis.cmsTopEstimates(docs, k = 20, depth = 2, width = 1L << 30)
    assert(exact.collect().forall(_.getLong(3) == 0L))
    // mergeability: cells are counters, so groupBy (r,b) sum of shard
    // sketches IS the whole-corpus sketch
    val s1 = TextAnalysis.cmsSketch(docs.where(col("doc_id") % 2 === 0), 4, 256L)
    val s2 = TextAnalysis.cmsSketch(docs.where(col("doc_id") % 2 === 1), 4, 256L)
    val merged = s1.unionByName(s2).groupBy("r", "b").agg(sum("cnt").as("cnt"))
      .orderBy("r", "b").collect().toSeq
    val whole = TextAnalysis.cmsSketch(docs, 4, 256L).orderBy("r", "b").collect().toSeq
    assert(merged == whole)
  }

  test("temperature rates: alpha=1 is the natural mix, alpha=1/2 boosts the tail") {
    import spark.implicits._
    val docs = ((0 until 900).map(i => (i.toLong, "src_big")) ++
      (900 until 1000).map(i => (i.toLong, "src_small"))).toDF("doc_id", "source")
    val natural = Sampling.temperatureRates(docs, alpha = 1.0, targetFrac = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // alpha=1: every source keeps exactly targetFrac
    assert(natural == Map("src_big" -> 500000L, "src_small" -> 500000L))
    val flat = Sampling.temperatureRates(docs, alpha = 0.5, targetFrac = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // sqrt flattening: tail source boosted to (capped) keep-everything,
    // head source cut below the natural rate
    assert(flat("src_small") == 1000000L)
    assert(flat("src_big") < 500000L && flat("src_big") > 300000L)
    // the sample applies the rates: small source fully kept, totals
    // match the per-source gate exactly (deterministic hash)
    val kept = Sampling.temperatureSample(docs, alpha = 0.5, targetFrac = 0.5)
    assert(kept.where(col("source") === "src_small").count() == 100L)
    val keptBig = kept.where(col("source") === "src_big").count()
    val expectBig = docs.where(col("source") === "src_big")
      .where(Sampling.detHashMod(col("doc_id"), 1000000L) < flat("src_big")).count()
    assert(keptBig == expectBig)
  }

  test("chunkDocs: overlapping windows, partial tail kept, empty docs emit nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, size = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L), (1L, 2L, "e", 1L),
      (3L, 0L, "x", 1L)))
    // stride = size partitions the doc exactly (no overlap, no loss)
    val part = TextAnalysis.chunkDocs(docs.where(col("doc_id") === 1), 2, 2)
      .orderBy("chunk_id").collect().map(_.getString(2)).toSeq
    assert(part == Seq("a b", "c d", "e"))
  }

  test("gramNovelty: re-crawls score 0, fresh text 1e6, overlap in between") {
    import spark.implicits._
    val seen = Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"), // grams [t1..t8],[t2..t9]
      (2L, "short seen doc")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  // exact re-crawl
      (11L, "short seen doc"),               // short exact re-crawl
      (12L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),  // fully novel
      // 3 grams: [t1..t8] seen, [t2..t8,z1] and [t3..z1,z2] novel
      (13L, "t1 t2 t3 t4 t5 t6 t7 t8 z1 z2")).toDF("doc_id", "text")
    val out = TextAnalysis.gramNovelty(docs,
        TextAnalysis.spanGramStore(seen))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((2L, 2L, 0L)))
    assert(out(11L) == ((1L, 1L, 0L)))
    assert(out(12L) == ((2L, 0L, 1000000L)))
    assert(out(13L) == ((3L, 1L, 666666L)))
  }

  test("spanLookup: token-aligned phrase match with shared normalization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The  Cat   sat on the mat"),
      (2L, "a cat sat here"),
      (3L, "he cat sat"), // literal tokens 'he cat'
      (4L, "cat")).toDF("doc_id", "text")
    def hits(needle: String) =
      TextAnalysis.spanLookup(docs, needle).orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
    // needle normalizes like document text (case, whitespace)
    assert(hits("  CAT   Sat ") == Seq(1L, 2L, 3L))
    // token alignment: 'he cat' is NOT inside 'the cat'
    assert(hits("he cat") == Seq(3L))
    // single token; and a needle longer than a doc can't match it
    assert(hits("cat") == Seq(1L, 2L, 3L, 4L))
    assert(hits("cat sat on the mat today") == Seq())
  }

  test("keepBest: cluster survivor is the argmax-priority member, ties by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // cluster A -> keep 2
      (4L, 0.7), (5L, 0.7),            // cluster B tie -> keep 4
      (6L, 0.1)).toDF("doc_id", "q")   // unpaired -> survives
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.keepBest(docs, clusters, col("q"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 4L, 6L))
  }

  test("jaccardSpectrum: exact-rational bins, J = 1 clamps into the top bin") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),  // shingles {abc,bcd,cde}
      (2L, "a b c d e"),  // identical -> J = 1 with doc 1
      (3L, "a b c d x"),  // {abc,bcd,cdx}: inter 2, union 4 vs 1 and 2
      (4L, "p q r s t")). // co-shingles with nobody
      toDF("doc_id", "text")
    val got = Dedup.jaccardSpectrum(docs).orderBy("bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(5L -> 2L, 9L -> 1L))
  }

  test("dupWeights: 1e6 div cluster size, singletons keep weight 1e6") {
    import spark.implicits._
    val docs = (0L to 5L).toDF("doc_id")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_id")
    val w = Dedup.dupWeights(docs, clusters).orderBy("doc_id").collect()
      .map(_.getLong(1)).toSeq
    assert(w == Seq(333333L, 333333L, 333333L, 500000L, 500000L, 1000000L))
  }

  test("binaryClassification: confusion + quantized metrics, absent preds count negative") {
    import spark.implicits._
    val preds = Seq((1L, true), (2L, false), (3L, true)).toDF("doc_id", "keep")
    // doc 4 has a label but no prediction row -> predicted negative
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 1L)).toDF("doc_id", "y")
    val r = graft.ops.Eval.binaryClassification(preds, labels).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 2L, 0L)))
    assert(r.getLong(4) == 500000L) // precision 1/2
    assert(r.getLong(5) == 333333L) // recall 1/3
    assert(r.getLong(6) == 400000L) // f1 = 2/(2+1+2)
  }

  test("rankMetrics: recall@k and reciprocal rank; unhit queries score zero") {
    import spark.implicits._
    val ranking = Seq(
      (0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L),
      (1L, 1L, 20L), (1L, 2L, 21L)).toDF("q_id", "rank", "n_id")
    val qrels = Seq((0L, 11L), (0L, 99L), (1L, 55L)).toDF("q_id", "n_id")
    val out = graft.ops.Eval.rankMetrics(ranking, qrels, k = 3)
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(out == Seq(
      // hit at rank 2: recall 1/2, rr 1/2, dcg = floor(1e6/log2(3))
      (0L, 2L, 1L, 500000L, 500000L, 630929L),
      (1L, 1L, 0L, 0L, 0L, 0L)))      // judged but unhit
  }

  test("plan shapes: chunking shuffle-free, lookup shuffles only hits, temperature broadcasts") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    // AQE's adaptive wrapper hides subtrees from collect — audit concrete plans
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val docs = Tables.documents(s2, sf)
    def shuffles(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
    // chunking: one scan, zero exchanges — the explode IS the output
    assert(shuffles(TextAnalysis.chunkDocs(docs, 16, 8)) == 0)
    // lookup: the phrase-equality filter sits under the single distinct
    // shuffle, so only hit ids ever exchange
    val look = TextAnalysis.spanLookup(docs, "value fast spark")
    assert(shuffles(look) == 1)
    val planStr = look.queryExecution.executedPlan.toString
    assert(planStr.contains("value fast spark"),
      "phrase filter must sit in the scan-side plan, not post-shuffle")
    // temperature gate: the |sources|-row rate frame attaches via a
    // broadcast join — no corpus-sized shuffle for the gate itself
    val temp = graft.ops.Sampling.temperatureSample(docs)
    val hasBroadcast = temp.queryExecution.executedPlan.collect {
      case b: BroadcastExchangeExec => b }.nonEmpty
    assert(hasBroadcast, "rate frame must broadcast")
  }

  test("dailyRollup: subtotal and grand-total rows agree with direct aggregates") {
    import spark.implicits._
    val ev = Seq(
      ("view", 10L, 1L), ("view", 10L, 2L), ("view", 86400010L, 1L),
      ("click", 20L, 2L)).toDF("event_type", "ts_ms", "user_id")
    val out = EventAnalytics.dailyRollup(ev)
      .orderBy("event_type", "day_idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("ALL", -1L, 4L, 2L),
      ("click", -1L, 1L, 1L), ("click", 0L, 1L, 1L),
      ("view", -1L, 3L, 2L), ("view", 0L, 2L, 2L), ("view", 1L, 1L, 1L)))
    // the CUBE twin adds the per-day totals across types — exactly the
    // (day) grouping set, everything else identical
    val cube = EventAnalytics.dailyCube(ev)
      .orderBy("event_type", "day_idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(cube.filterNot(r => r._1 == "ALL" && r._2 >= 0) == out)
    assert(cube.filter(r => r._1 == "ALL" && r._2 >= 0) == Seq(
      ("ALL", 0L, 3L, 2L), ("ALL", 1L, 1L, 1L)))
  }

  test("hardDomainWeights: harder domain up, easier down, shares renormalize") {
    import spark.implicits._
    // source "fluent" repeats the same bigrams corpus-wide (high
    // conditional probability); "garbled" uses the SAME vocabulary in
    // per-doc shuffled orders — plausible unigrams, rare pairs, the
    // case the bigram filter exists to catch (all-novel tokens would
    // score HIGH: a 1/1 conditional MLE is confident, not garbled)
    val vocab = Seq("the", "cat", "sat", "on", "mat", "and", "dog", "ran")
    val fluent = (0 until 6).map(i =>
      (i.toLong, "fluent", "the cat sat on the mat and the dog ran"))
    val hard = (6 until 12).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, "garbled", r.shuffle(vocab ++ vocab).mkString(" "))
    }
    val docs = (fluent ++ hard).toDF("doc_id", "source", "text")
    val out = graft.ops.Sampling.hardDomainWeights(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == Seq("fluent", "garbled"))
    val Seq(fl, ga) = out.toSeq
    // the garbled domain scores lower logprob → positive excess → up
    assert(ga._3 < fl._3, s"garbled must score lower: $ga vs $fl")
    assert(ga._4 > 0 && fl._4 < 0)
    assert(ga._5 > 1000000L && fl._5 < 1000000L)
    // the max-|excess| domain pins the factor at exactly 1e6 ± eta
    assert(math.max(ga._5, 2000000L - fl._5) == 1500000L)
    // renormalized shares: sum within rounding of 1e6, ordered up
    val wsum = out.map(_._6).sum
    assert(math.abs(wsum - 1000000L) <= out.length, s"weights sum $wsum")
    assert(ga._6 > fl._6)
  }

  test("doremiWeights: K=1 is the one-shot operator bit-for-bit; K=2 compounds the update") {
    import spark.implicits._
    val vocab = Seq("the", "cat", "sat", "on", "mat", "and", "dog", "ran")
    val fluent = (0 until 6).map(i =>
      (i.toLong, "fluent", "the cat sat on the mat and the dog ran"))
    val hard = (6 until 12).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, "garbled", r.shuffle(vocab ++ vocab).mkString(" "))
    }
    // a short doc (1 token) must NOT count toward n_docs — the
    // one-shot operator's inner score join drops it. A NULL-source
    // domain (missing metadata) is a real group: its cumulative factor
    // must compound like any named domain's (a `col === null` CASE arm
    // would silently freeze it at 1e6)
    val nullSrc = (20 until 26).map { i =>
      val r = new scala.util.Random(100 + i)
      (i.toLong, null.asInstanceOf[String], r.shuffle(vocab ++ vocab).mkString(" "))
    }
    val docs = (fluent ++ hard ++ nullSrc :+ (12L, "fluent", "the"))
      .toDF("doc_id", "source", "text")
    val oneShot = graft.ops.Sampling.hardDomainWeights(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val k1 = graft.ops.Sampling.doremiWeights(docs, rounds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).toSeq // skip cum_factor_e6 col
    assert(k1 == oneShot, s"K=1 diverged from one-shot:\n$k1\nvs\n$oneShot")
    // K=1 cum factor equals the round's factor exactly
    val k1cum = graft.ops.Sampling.doremiWeights(docs, rounds = 1).collect()
      .map(r => (r.getLong(4), r.getLong(5)))
    assert(k1cum.forall { case (f, c) => f == c })
    // K=2: the reweighted reference moves TOWARD the hard domain, so
    // the second-round excess magnitude shrinks but the cumulative
    // factor keeps compounding in the same direction
    val k2 = graft.ops.Sampling.doremiWeights(docs, rounds = 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val k1m = k1.map(t => t._1 -> t).toMap
    val gaCum = k2("garbled")._3
    val flCum = k2("fluent")._3
    assert(gaCum > k1m("garbled")._5 || k2("garbled")._2 == 1000000L,
      s"hard domain cum factor must compound up (cum $gaCum)")
    assert(flCum < k1m("fluent")._5 || k2("fluent")._2 == 1000000L)
    // the NULL-source domain is garbled-style (hard): its cum factor
    // must compound past its round-1 factor exactly like a named
    // domain's — the regression case for the CASE-fold null arm
    assert(k2.contains(null), "null-source domain missing from K=2 output")
    assert(k2(null)._3 > k1m(null)._5 || k2(null)._2 == 1000000L,
      s"null-source cum factor frozen: ${k2(null)}")
    // shares still renormalize
    val wsum2 = k2.values.map(_._4).sum
    assert(math.abs(wsum2 - 1000000L) <= k2.size, s"weights sum $wsum2")
  }

  test("epochsFromWeights: integer-exact share-to-epochs bridge with cap") {
    import spark.implicits._
    val w = Seq(("a", 10L, 900000L), ("b", 90L, 100000L))
      .toDF("source", "n_docs", "weight_e6")
    val ep = graft.ops.Sampling.epochsFromWeights(w).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // a: 900000 * 100 / 10 = 9e6 → capped at the 8-epoch default;
    // b: 100000 * 100 / 90 = 111111 (truncating)
    assert(ep("a") == 8000000L, s"cap: $ep")
    assert(ep("b") == 111111L, s"truncating div: $ep")
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.epochsFromWeights(w, maxEpochsE6 = 999L)
    }
  }

  test("prepareDoremi: hard domains repeat more; wiring equals the hand-built chain; deterministic") {
    import spark.implicits._
    val vocab = Seq("the", "cat", "sat", "on", "mat", "and", "dog", "ran")
    val fluent = (0 until 20).map(i =>
      (i.toLong * 10 + 1, "fluent", "the cat sat on the mat and the dog ran"))
    val hard = (0 until 20).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong * 10 + 2, "garbled", r.shuffle(vocab ++ vocab).mkString(" "))
    }
    val bench = (0 until 4).map(i => (i.toLong * 10, "fluent", "held out eval text"))
    val corpus = (fluent ++ hard).toDF("doc_id", "source", "text")
    val benchDf = bench.toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "copy").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = rows(graft.ops.TrainingRun.prepareDoremi(
      corpus, benchDf, nShards = 4, rounds = 2, seed = 1L))
    // deterministic
    assert(got == rows(graft.ops.TrainingRun.prepareDoremi(
      corpus, benchDf, nShards = 4, rounds = 2, seed = 1L)))
    // wiring: identical to the hand-built chain over the same stages
    val curated = graft.ops.Curation.curate(corpus, benchDf)
    val w = graft.ops.Sampling.doremiWeights(curated, rounds = 2)
    val epochs = graft.ops.Sampling.epochsFromWeights(w)
      .select("source", "epochs_e6").collect()
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    val want = rows(graft.ops.TrainingRun.prepareUpsampled(
      corpus, benchDf, epochs, nShards = 4, seed = 1L))
    assert(got == want, "prepareDoremi diverged from the hand-built chain")
    // the learned epoch rates move the right way, deterministically:
    // the hard (garbled) domain repeats MORE than once per epoch, the
    // easy (fluent) domain — which exact-dedup collapsed to one doc —
    // thins below once. (Copy COUNTS are hash-gated per doc, so the
    // rate map, not the realized copies, is the robust assertion.)
    assert(epochs("garbled") > 1.0 && epochs("garbled") > epochs("fluent"),
      s"hard domain must earn more epochs: $epochs")
    assert(epochs("fluent") < 1.0, s"easy domain must thin: $epochs")
    // and the realized stream is dominated by the hard domain
    val curSrc = curated.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val copies = got.groupBy(t => curSrc(t._1)).view.mapValues(_.size).toMap
    assert(copies.getOrElse("garbled", 0) > copies.getOrElse("fluent", 0),
      s"hard domain must dominate the stream: $copies")
  }

  test("curriculumOrder: dense bijection, difficulty-sorted, seeded shuffle within a level") {
    import spark.implicits._
    // three difficulty levels with deliberately interleaved ids, one
    // heavy level (ids 100-139 all difficulty 7) to exercise the
    // sub-bucket split, and a level holding a single doc
    val rows = (100L until 140L).map(id => (id, 7L)) ++
      Seq((5L, 2L), (93L, 2L), (8L, 2L), (1L, 11L)) ++
      (200L until 210L).map(id => (id, 7L))
    val df = rows.toDF("doc_id", "d")
    val got = Sampling.curriculumOrder(df, "d", seed = 3L, buckets = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense bijection onto [0, n)
    assert(got.values.toSeq.sorted == (0L until rows.size.toLong).toList)
    // driver-side replay of the composite sort key (d, b, k, id)
    val P = 1000000007L
    def hm(id: Long, seed: Long, m: Long): Long =
      ((id % P + seed) % P * 2654435761L % P) % m
    val want = rows.sortBy { case (id, d) =>
      (d, hm(id, 3L, 4L), hm(id, 4L, P), id)
    }.map(_._1).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want, "engine order diverged from the (d, b, k, id) sort")
    // determinism + the seed actually permutes within a level
    val again = Sampling.curriculumOrder(df, "d", seed = 3L, buckets = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
    val other = Sampling.curriculumOrder(df, "d", seed = 4L, buckets = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got != other, "a different seed must reshuffle within levels")
    // difficulty is non-decreasing along pos for EVERY seed
    val byPos = got.toSeq.sortBy(_._2).map { case (id, _) =>
      rows.find(_._1 == id).get._2 }
    assert(byPos == byPos.sorted, "difficulty must be non-decreasing along pos")
    // a NULL difficulty fails loudly instead of silently vanishing at
    // the offset join
    val withNull = Seq((1L, Some(2L)), (2L, None)).toDF("doc_id", "d")
    val e = intercept[Exception] {
      Sampling.curriculumOrder(withNull, "d").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL d"),
      s"expected the loud NULL-difficulty error, got: $e")
  }

  test("prepareCurriculum equals the hand-built curate -> order -> stripe chain") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sf).where(col("doc_id") % 10 =!= 0)
    val bench = Tables.documents(spark, sf).where(col("doc_id") % 10 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = asMap(graft.ops.TrainingRun.prepareCurriculum(
      corpus, bench, nShards = 4, seed = 1L))
    val curated = graft.ops.Curation.curate(corpus, bench)
      .withColumn("__nt", size(Dedup.tokens(col("text"))).cast("long"))
    val want = asMap(Sampling.curriculumOrder(curated, "__nt", seed = 1L)
      .select(col("doc_id"), col("pos"), pmod(col("pos"), lit(4L)).as("shard")))
    assert(got == want, "prepareCurriculum diverged from the hand-built chain")
    // shards stripe the curriculum order
    assert(got.values.forall { case (pos, shard) => shard == pos % 4 })
    // short docs really do come first: the first quarter of the stream
    // has a mean token count no larger than the last quarter's
    val nt = curated.select("doc_id", "__nt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = got.toSeq.sortBy(_._2._1).map(t => nt(t._1))
    val q = ordered.size / 4
    assert(q > 0 && ordered.take(q).sum.toDouble / q
      <= ordered.takeRight(q).sum.toDouble / q)
  }

  test("prepareDoremiCurriculum: epoch-major, easy-to-hard within epoch, " +
    "mixture-driven copies") {
    import spark.implicits._
    // the prepareDoremi fixture: a hard (garbled) domain that earns
    // > 1 epoch from the fit, with VARIED lengths inside each domain
    // so the within-epoch curriculum has real work to do
    val vocab = Seq("the", "cat", "sat", "on", "mat", "and", "dog", "ran")
    val fluent = (0 until 20).map { i =>
      val reps = 1 + (i % 3)
      (i.toLong * 10 + 1, "fluent",
        (("the cat sat on the mat and the dog ran " * reps).trim + s" tail$i"))
    }
    val hard = (0 until 20).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong * 10 + 2, "garbled",
        r.shuffle(vocab ++ vocab ++ vocab.take(i % 8)).mkString(" "))
    }
    val corpus = (fluent ++ hard).toDF("doc_id", "source", "text")
    val bench = (0 until 4).map(i => (i.toLong * 10, "fluent", "held out eval text"))
      .toDF("doc_id", "source", "text")
    val got = graft.ops.TrainingRun.prepareDoremiCurriculum(
        corpus, bench, nShards = 4, rounds = 2, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // pos is a dense permutation of the replica stream; stripes hold
    val n = got.size
    assert(got.map(_._3).sorted == (0L until n.toLong), "pos not a dense permutation")
    assert(got.forall { case (_, _, pos, shard) => shard == pos % 4 })
    // EPOCH-MAJOR: every copy-c position precedes every copy-(c+1) one
    val byCopy = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    val copies = byCopy.keys.toSeq.sorted
    copies.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byCopy(a).max < byCopy(b).min,
          s"epoch $a positions overlap epoch $b — not epoch-major")
      case _ => ()
    }
    // within each epoch, token counts are non-decreasing along pos
    val nt = graft.ops.Curation.curate(corpus, bench)
      .withColumn("__nt", size(Dedup.tokens(col("text"))).cast("long"))
      .select("doc_id", "__nt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    copies.foreach { c =>
      val inEpoch = got.filter(_._2 == c).sortBy(_._3).map(t => nt(t._1))
      assert(inEpoch == inEpoch.sorted,
        s"epoch $c is not in curriculum (easy-to-hard) order")
    }
    // the mixture is engaged: copies exist beyond epoch 0 OR every rate
    // collapsed to 1.0 — on this corpus the doremi fit upsamples at
    // least one source past one epoch (the prepareDoremi spec pins the
    // fit itself; here we pin that its copies reach the composition)
    assert(copies.size > 1, s"no source upsampled past one epoch: $copies")
    // determinism: an identical call replays bit-for-bit
    val again = graft.ops.TrainingRun.prepareDoremiCurriculum(
        corpus, bench, nShards = 4, rounds = 2, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.toSet == again.toSet)
  }

  test("rocAuc: exact tie-averaged ranks; separation, reversal, ties, empty class") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Long)]): Option[Long] = {
      val r = graft.ops.Eval.rocAuc(rows.toDF("score", "y")).collect()(0)
      assert(r.getLong(0) == rows.count(_._2 == 1L))
      assert(r.getLong(1) == rows.count(_._2 == 0L))
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // perfect separation -> 1.0; reversal -> 0.0
    assert(auc(Seq((0.1, 0L), (0.2, 0L), (0.8, 1L), (0.9, 1L))) == Some(1000000L))
    assert(auc(Seq((0.9, 0L), (0.8, 0L), (0.2, 1L), (0.1, 1L))) == Some(0L))
    // all-tied scores -> 0.5 exactly (rank information is zero)
    assert(auc(Seq((0.5, 0L), (0.5, 1L), (0.5, 0L), (0.5, 1L))) == Some(500000L))
    // mixed ties: scores [1,1,2,2], labels [0,1,0,1]:
    // R+ = 1.5 + 3.5 = 5, AUC = (10 - 6) / (2*2*2) = 0.5
    assert(auc(Seq((1.0, 0L), (1.0, 1L), (2.0, 0L), (2.0, 1L))) == Some(500000L))
    // a hand case with partial order: scores 1,2,3,4 labels 0,1,0,1
    // pairs: (2>1)=1, (2<3)=0, (4>1)=1, (4>3)=1 -> U=3, AUC=3/4
    assert(auc(Seq((1.0, 0L), (2.0, 1L), (3.0, 0L), (4.0, 1L))) == Some(750000L))
    // floor quantization: U = 1 of 3 pairs -> 333333 (never rounds up)
    assert(auc(Seq((2.0, 1L), (1.0, 0L), (3.0, 0L), (4.0, 0L))) == Some(333333L))
    // single-class inputs are undefined, not zero
    assert(auc(Seq((0.1, 1L), (0.2, 1L))) == None)
    assert(auc(Seq((0.1, 0L), (0.2, 0L))) == None)
    // NULL / out-of-{0,1} labels fail loudly instead of silently
    // counting as negatives — across all three rank evals
    val nullLab = Seq((0.5, Some(1L)), (0.7, None)).toDF("score", "y")
    val badLab = Seq((0.5, 1L), (0.7, 2L)).toDF("score", "y")
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      graft.ops.Eval.rocAuc(_, "score", "y"),
      graft.ops.Eval.prCurve(_, "score", "y"),
      graft.ops.Eval.calibrationBins(_, 10, "score", "y")).foreach { ev =>
      val e1 = intercept[Exception](ev(nullLab).collect())
      assert(e1.getMessage.contains("in {0, 1}"), s"null label: $e1")
      val e2 = intercept[Exception](ev(badLab).collect())
      assert(e2.getMessage.contains("in {0, 1}"), s"bad label: $e2")
    }
    // NULL and NaN scores are poisonous too: NULL would silently rank
    // lowest (NULLS FIRST), NaN highest (Spark orders NaN above every
    // real double), and calibration would bin them apart
    val nullScore = Seq((Some(0.5), 1L), (None, 0L)).toDF("score", "y")
    val nanScore = Seq((0.5, 1L), (Double.NaN, 0L)).toDF("score", "y")
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      graft.ops.Eval.rocAuc(_, "score", "y"),
      graft.ops.Eval.prCurve(_, "score", "y"),
      graft.ops.Eval.calibrationBins(_, 10, "score", "y")).foreach { ev =>
      val e = intercept[Exception](ev(nullScore).collect())
      assert(e.getMessage.contains("non-NULL"), s"null score: $e")
      val e2 = intercept[Exception](ev(nanScore).collect())
      assert(e2.getMessage.contains("non-NaN"), s"NaN score: $e2")
    }
  }

  test("rocAuc/prCurve: default e6 quantization bounds the serial frame and is " +
    "lossless on coarse scores") {
    import spark.implicits._
    // 4-dp-style scores (the package's quality-score convention, and
    // what the driver oracle rows feed): distinct coarse scores map
    // injectively to e6 keys, so the quantized default is BIT-IDENTICAL
    // to exact mode — the pin that keeps the oracle rows green
    val rnd = new scala.util.Random(7)
    val coarse = (0 until 400).map { _ =>
      (rnd.nextInt(10001) / 10000.0 /* 4-dp in [0,1] */,
        rnd.nextInt(2).toLong)
    }.toDF("score", "y")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(graft.ops.Eval.rocAuc(coarse)) ==
      rows(graft.ops.Eval.rocAuc(coarse, "score", "y", scoreQuantumE = None)))
    assert(rows(graft.ops.Eval.prCurve(coarse).orderBy(col("score").desc)) ==
      rows(graft.ops.Eval.prCurve(coarse, "score", "y", scoreQuantumE = None)
        .orderBy(col("score").desc)))
    // the bound actually bites: continuous scores all inside one 1e-6
    // cell collapse to ONE operating point under the default (where
    // exact mode would emit one per raw double), and the emitted
    // threshold is the group's min raw score — still an exact
    // operating point for the cumulative counts it carries
    val cont = (0 until 50).map(i => (0.5 + i * 1e-9, (i % 2).toLong))
      .toDF("score", "y")
    val pr = graft.ops.Eval.prCurve(cont).collect()
    assert(pr.length == 1, s"e6 default must merge sub-1e-6 near-ties: $pr")
    assert(pr(0).getDouble(0) == 0.5 && pr(0).getLong(1) == 25L &&
      pr(0).getLong(2) == 25L)
    assert(graft.ops.Eval.prCurve(cont, "score", "y", scoreQuantumE = None)
      .count() == 50L)
    // quantization only merges near-ties: AUC degrades to 0.5 (all
    // tied) instead of whatever the 1e-9 jitter implied — documented
    val auc = graft.ops.Eval.rocAuc(cont).collect()(0)
    assert(auc.getLong(2) == 500000L)
    // e6-GRID scores map injectively: adjacent 1e-6 multiples stored
    // as doubles must stay distinct keys (floor collapsed ~25% of
    // adjacent grid pairs — e.g. 1.4e-5 and 1.5e-5 — because the
    // nearest double can sit just below the boundary; round is exact
    // there). Quantized default ≡ exact mode on a dense grid slice.
    val grid = (0 until 2000).map(i => (i * 1e-6, (i % 2).toLong))
      .toDF("score", "y")
    assert(graft.ops.Eval.prCurve(grid).count() == 2000L,
      "adjacent e6-grid scores collapsed under the default key")
    assert(rows(graft.ops.Eval.rocAuc(grid)) ==
      rows(graft.ops.Eval.rocAuc(grid, "score", "y", scoreQuantumE = None)))
    // sanity on the knob's range guard
    intercept[IllegalArgumentException](
      graft.ops.Eval.rocAuc(cont, "score", "y", scoreQuantumE = Some(16)))
  }

  test("prCurve: one operating point per distinct score, exact cumulative confusion") {
    import spark.implicits._
    val rows = Seq((0.9, 1L), (0.8, 0L), (0.8, 1L), (0.5, 0L), (0.3, 1L))
    val got = graft.ops.Eval.prCurve(rows.toDF("score", "y")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // hand-computed sweep, descending: (score, tp, fp, prec, recall, f1)
    assert(got == Seq(
      (0.9, 1L, 0L, 1000000L, 333333L, 500000L),
      (0.8, 2L, 1L, 666666L, 666666L, 666666L),
      (0.5, 2L, 2L, 500000L, 666666L, 571428L),
      (0.3, 3L, 2L, 600000L, 1000000L, 750000L)))
    // each operating point agrees with binaryClassification at that
    // threshold (keep = score >= s): the curve IS the threshold sweep
    val ids = rows.zipWithIndex.map { case ((s, y), i) => (i.toLong, s, y) }
      .toDF("doc_id", "score", "y")
    got.foreach { case (s, tp, fp, prec, recall, f1) =>
      val bc = graft.ops.Eval.binaryClassification(
        ids.where(col("score") >= s).select(col("doc_id"), lit(true).as("keep")),
        ids.select(col("doc_id"), col("y"))).collect()(0)
      assert((bc.getLong(0), bc.getLong(1)) == ((tp, fp)), s"confusion at $s")
      assert((bc.getLong(4), bc.getLong(5), bc.getLong(6)) == ((prec, recall, f1)),
        s"metrics at $s")
    }
  }

  test("mmrRerank: lambda=1 is the relevance order; diversity displaces the near-copy") {
    import spark.implicits._
    // query at (1, 0); candidate 10 closest, 11 a near-copy of 10,
    // 12 almost as relevant but on the query's OTHER side (far from
    // 10): pure relevance ranks 10, 11, 12 — MMR at lambda 0.5 must
    // displace the near-copy and rank 10, 12, 11
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),   // query
      (10L, Seq(0.99f, 0.12f)),
      (11L, Seq(0.99f, 0.13f)), // near-copy of 10
      (12L, Seq(0.98f, -0.17f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val qs = emb.where(col("vec_id") === 0L)
    def ranksOf(lambdaE6: Long) =
      graft.ops.Retrieval.mmrTopK(emb, qs, k = 3, depth = 3, lambdaE6 = lambdaE6)
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(ranksOf(1000000L) == Seq(10L, 11L, 12L),
      "lambda=1 must reproduce the relevance ranking")
    assert(ranksOf(500000L) == Seq(10L, 12L, 11L),
      "diversity must displace the near-copy")
    // lambda=1 agrees with the brute-force arm for any fixture
    val brute = graft.ops.Similarity.bruteForceTopK(emb, qs, k = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(ranksOf(1000000L) == brute)
    // shape: one row per (q, rank), ranks dense from 1
    val out = graft.ops.Retrieval.mmrTopK(emb, qs, k = 3, depth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(_._2).sorted == Seq(1L, 2L, 3L))
    // a query with fewer candidates than k stops early, no phantom rows
    val tiny = vecs.take(2).toDF("vec_id", "embedding")
    val short = graft.ops.Retrieval.mmrTopK(tiny,
      tiny.where(col("vec_id") === 0L), k = 3, depth = 3)
    assert(short.count() == 1L, "1-candidate query must emit exactly rank 1")
  }

  test("mmrRerankLocal ≡ mmrRerank bit-for-bit; IVF composition exact at nprobe = nlist") {
    import spark.implicits._
    import graft.ops.{Retrieval, Similarity}
    // seeded corpus: 40 vectors + 6 queries, 8-d gaussians — enough
    // structure for non-trivial greedy displacement at several lambdas
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 46L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qs = vecs.where(col("vec_id") < 6)
    // the same candidate shape both arms take: brute shortlist with
    // floored-cosine relevance and vectors re-attached
    val short = Similarity.bruteForceTopK(vecs, qs, k = 12)
    val qv = broadcast(qs.select(col("vec_id").as("q_id"), col("embedding").as("__qv")))
    val cands = short
      .join(vecs.select(col("vec_id").as("n_id"), col("embedding").as("n_vec")), "n_id")
      .join(qv, "q_id")
      .select(col("q_id"), col("n_id"),
        floor(Similarity.dot(col("__qv"), col("n_vec")) /
          (Similarity.norm(col("__qv")) * Similarity.norm(col("n_vec")))
          * 1e6).cast("long").as("rel_e6"),
        col("n_vec"))
    def picks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // pick-for-pick equality across the lambda range, incl. both
    // degenerate ends (pure relevance / pure diversity-after-first)
    Seq(0L, 300000L, 500000L, 700000L, 1000000L).foreach { lam =>
      assert(picks(Retrieval.mmrRerankLocal(cands, k = 5, lambdaE6 = lam)) ==
        picks(Retrieval.mmrRerank(cands, k = 5, lambdaE6 = lam)),
        s"local and global MMR diverged at lambda $lam")
    }
    // k > per-query candidate count: both stop early, no phantom rows
    val tiny = cands.where(col("n_id") < 8)
    assert(picks(Retrieval.mmrRerankLocal(tiny, k = 5)) ==
      picks(Retrieval.mmrRerank(tiny, k = 5)))
    // non-integral ids refuse loudly: the long-keyed in-task path
    // would silently truncate a double id (merging two queries) or
    // NULL-cast a string one — both out of contract
    val badIds = cands.withColumn("q_id", col("q_id").cast("double"))
    val e = intercept[IllegalArgumentException](
      Retrieval.mmrRerankLocal(badIds, k = 3))
    assert(e.getMessage.contains("integral"), s"id-type guard: $e")
    // the IVF composition with an exact shortlist (nprobe = nlist)
    // replays the brute composition pick-for-pick
    assert(picks(Retrieval.mmrTopKIvf(vecs, qs, k = 5, depth = 12,
        nlist = 4, nprobe = 4)) ==
      picks(Retrieval.mmrTopK(vecs, qs, k = 5, depth = 12)))
    // pruned probes (the real ANN regime): recall vs the brute-MMR
    // reference is bounded by the shortlist arm — on this seeded
    // fixture the 2-of-4-cell shortlist keeps most picks
    val ref = picks(Retrieval.mmrTopK(vecs, qs, k = 5, depth = 12))
      .map(t => (t._1, t._3)).toSet
    val ann = picks(Retrieval.mmrTopKIvf(vecs, qs, k = 5, depth = 12,
        nlist = 4, nprobe = 2))
      .map(t => (t._1, t._3)).toSet
    val recall = ann.count(ref).toDouble / ref.size
    assert(recall >= 0.5, s"IVF-MMR recall collapsed: $recall")
  }

  test("filter → ANN → MMR composes: filtered shortlist + local rerank equals brute MMR over the filtered corpus") {
    import spark.implicits._
    import graft.ops.{Retrieval, Similarity}
    // the full production retrieval stack — "diverse top-k among docs
    // satisfying a predicate" — assembled from the round's pieces: the
    // filteredTopK Pre arm (exact over survivors at nprobe = nlist)
    // feeds attachCandidates feeds the in-task greedy rerank, and at
    // the exact configuration the picks must equal mmrTopK run over
    // the pre-filtered corpus bit-for-bit
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 46L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qs = vecs.where(col("vec_id") < 6)
    val pred = col("vec_id") % 3 === 0
    val ref = Retrieval.mmrTopK(vecs.where(pred), qs, k = 4, depth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val shortlist = Similarity.filteredTopK(vecs, qs, k = 10, predicate = pred,
      nlist = 4, nprobe = 4) // default Pre arm, exact envelope
    val got = Retrieval.mmrRerankLocal(
        Retrieval.attachCandidates(vecs.where(pred), qs, shortlist,
          "vec_id", "embedding"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref, "filtered ANN→MMR composition diverged from brute")
  }

  test("calibrationBins: equal-width bins, top clamp, exact empirical rates") {
    import spark.implicits._
    val rows = Seq((0.05, 0L), (0.12, 1L), (0.55, 0L), (0.55, 1L),
      (0.95, 1L), (1.0, 1L))
    val got = graft.ops.Eval.calibrationBins(rows.toDF("score", "y"), nBins = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // driver-side replay of the same IEEE binning/quantization
    def bin(s: Double) = math.min(math.max(math.floor(s * 10).toLong, 0L), 9L)
    def s6(s: Double) = math.floor(s * 1e6).toLong
    val want = rows.groupBy { case (s, _) => bin(s) }.toSeq.sortBy(_._1)
      .map { case (b, g) =>
        val n = g.size.toLong
        val np = g.count(_._2 == 1L).toLong
        (b, n, np, g.map(t => s6(t._1)).sum / n, np * 1000000L / n)
      }
    assert(got == want, s"bins diverged: got $got want $want")
    // the clamp really fires: score 1.0 sits in bin 9, no bin 10 exists
    assert(got.map(_._1).contains(9L) && got.map(_._1).forall(_ <= 9L))
    // half-positive bin 5 reads exactly 500000
    assert(got.find(_._1 == 5L).get._5 == 500000L)
  }
}
