package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** §G20 addendum (BASELINE.md): semantic decontamination across
  * decades at NAKED DEFAULTS — `semanticDecontam(corpus, bench, t)`
  * with auto-derived nlist and the default pruned probe, the exact
  * call a release pipeline makes. The benchmark is FIXED (the first
  * `nBench` ids — eval suites do not grow with the corpus); the corpus
  * is the decade knob, so the measured curve is the |corpus| × (probe
  * + cell-bounded verify) term, the one that matters at 100 TB.
  *
  * Usage: Test/runMain graft.tools.DecontamStudy <embDir> [nBench]
  *        [threshold]
  * Defaults: 2000 benchmark vectors, threshold 0.8 (clustered
  * GenScaleData corpora hold real same-cluster hits there).
  */
object DecontamStudy {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBench = args.lift(1).map(_.toLong).getOrElse(2000L)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val spark = GraftSession.builder(32, 32).appName("graft-decontam-study").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val bench = emb.where(col("vec_id") < nBench)
    val corpus = emb.where(col("vec_id") >= nBench)
    System.err.println(s"[decontam-study] $n vectors, $nBench benchmark, t=$threshold")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // warm codegen/JIT (the Bench convention)
    Similarity.semanticDecontam(corpus.limit(500), bench.limit(200), threshold)
      .where(!col("kept")).count()

    val (dropped, t) = timed(
      Similarity.semanticDecontam(corpus, bench, threshold)
        .where(!col("kept")).count())
    println(s"""{"q":"g20_decontam_default","n":$n,"bench":$nBench,"sec":${f(t)},"dropped":$dropped}""")
    spark.stop()
  }

  private def f(sec: Double): String =
    BigDecimal(sec).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
}
