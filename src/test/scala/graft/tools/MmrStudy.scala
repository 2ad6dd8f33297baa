package graft.tools

import graft.GraftSession
import graft.ops.{Retrieval, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §G18 (BASELINE.md): MMR diverse top-k at realistic depth — the
  * global k-round [[Retrieval.mmrRerank]] vs the in-task
  * [[Retrieval.mmrRerankLocal]] over the SAME IVF shortlist, plus the
  * composed production entry [[Retrieval.mmrTopKIvf]], on a
  * [[GenScaleData]] clustered corpus (the regime IVF is deployed for).
  *
  * Usage: Test/runMain graft.tools.MmrStudy <embDir> [nQueries] [k]
  *        [depth] [nlist] [nprobe]
  * Defaults: 1000 queries, k = 10, depth = 100, nlist = 64,
  * nprobe = 8. Centroids are trained ONCE and pinned into every arm,
  * so the timings compare SERVE plans, not repeated k-means builds.
  * Prints one JSON line per measurement: shortlist-only, attach-only,
  * local rerank e2e, global rerank e2e, and pick-equality of the two
  * rerank arms (the bit-identity claim, re-checked at scale).
  */
object MmrStudy {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(1000)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val depth = args.lift(3).map(_.toInt).getOrElse(100)
    val nlist = args.lift(4).map(_.toInt).getOrElse(64)
    val nprobe = args.lift(5).map(_.toInt).getOrElse(8)
    val spark = GraftSession.builder(32, 32).appName("graft-mmr-study").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = emb.count()
    val qs = emb.where(col("vec_id") < nQueries)
    System.err.println(s"[mmr-study] $nVecs vectors, $nQueries queries, " +
      s"k=$k depth=$depth nlist=$nlist nprobe=$nprobe")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def force(df: DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions(it => Iterator(it.size.toLong))
        .fold(0L)(_ + _)

    // one pinned training pass — every arm serves off the same cells
    val (cents, tTrain) = timed(Similarity.ivfCentroids(emb, nlist, iters = 1))
    println(s"""{"q":"g18_train_centroids","sec":${f(tTrain)}}""")

    // the shared candidate shape (what attachCandidates builds inside
    // mmrTopKIvf): IVF shortlist + floored-cosine relevance + vectors
    def shortlist(): DataFrame =
      Similarity.ivfTopK(emb, qs, depth, nlist, nprobe, iters = 1,
        centroids = Some(cents))
    // THE production candidate frame (not a copy — a drifted twin here
    // would make the study validate a different frame than serving)
    def attach(ranking: DataFrame): DataFrame =
      Retrieval.attachCandidates(emb, qs, ranking, "vec_id", "embedding")

    // warm codegen/JIT on a 64-query slice so the timed rows measure
    // the plan, not first-run compilation (the Bench convention)
    val warmQs = emb.where(col("vec_id") < 64)
    try force(Retrieval.mmrTopKIvf(emb, warmQs, k, depth, nlist = nlist,
      nprobe = nprobe, centroids = Some(cents))) catch { case _: Throwable => () }

    val (_, tShort) = timed(force(shortlist()))
    println(s"""{"q":"g18_ivf_shortlist","sec":${f(tShort)}}""")

    val (_, tAttach) = timed(force(attach(shortlist())))
    println(s"""{"q":"g18_shortlist_attached","sec":${f(tAttach)}}""")

    import graft.ops.Checkpoints.SharedOps
    // pin the candidate frame once so both rerank arms time the RERANK,
    // not a recomputed shortlist
    val cands = attach(shortlist()).sharedCheckpoint(eager = true)

    val (localRows, tLocal) = timed {
      val r = Retrieval.mmrRerankLocal(cands, k)
      r.collect()
    }
    println(s"""{"q":"g18_rerank_local","sec":${f(tLocal)},"rows":${localRows.length}}""")

    val (globalRows, tGlobal) = timed {
      val r = Retrieval.mmrRerank(cands, k)
      r.collect()
    }
    println(s"""{"q":"g18_rerank_global","sec":${f(tGlobal)},"rows":${globalRows.length}}""")

    val same = localRows.map(_.toSeq).toSeq == globalRows.map(_.toSeq).toSeq
    println(s"""{"q":"g18_picks_identical","value":$same}""")

    val (_, tE2e) = timed(force(Retrieval.mmrTopKIvf(emb, qs, k, depth,
      nlist = nlist, nprobe = nprobe, centroids = Some(cents))))
    println(s"""{"q":"g18_mmr_topk_ivf_e2e","sec":${f(tE2e)}}""")

    spark.stop()
  }

  private def f(sec: Double): String =
    BigDecimal(sec).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
}
