package graft.tools

import graft.GraftSession
import graft.ops.Eval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §G19 (BASELINE.md): the round-12 AUC/PR bound measured across
  * decades — rocAuc/prCurve over CONTINUOUS double scores (the exact
  * regime the round-11 verdict flagged: every distinct raw score used
  * to become one row of an unpartitioned serial window) at 500k / 5M /
  * 50M rows, under the new e6-quantized default vs explicit exact
  * mode.
  *
  * The scored frame is synthesized in-flight (spark.range → a hash-mix
  * double in [0, 1] and a score-correlated label), so the study times
  * the eval operator, not a scan. Each row reports the wall time and
  * the SERIAL FRAME SIZE (distinct group keys) — the quantity the fix
  * bounds.
  *
  * Usage: Test/runMain graft.tools.EvalScaleStudy [maxDecade]
  */
object EvalScaleStudy {

  def main(args: Array[String]): Unit = {
    val maxN = args.lift(0).map(_.toLong).getOrElse(50000000L)
    val spark = GraftSession.builder(32, 32).appName("graft-eval-study").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scored(n: Long): DataFrame = {
      // xxhash-mixed uniform double in [0, 1) — effectively every score
      // distinct (the continuous-score regime the default bound targets)
      val score = pmod(xxhash64(col("id")), lit(1000000007L)).cast("double") /
        lit(1000000007.0)
      spark.range(n).select(
        score.as("score"),
        // label correlated with the score (AUC ≈ 0.75-ish), decided by
        // a second independent hash
        when(pmod(xxhash64(col("id"), lit(1)), lit(1000L)).cast("double")
          < score * 1000.0, 1L).otherwise(0L).as("y"))
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // warm codegen on a small frame
    Eval.rocAuc(scored(10000L)).collect()
    Eval.prCurve(scored(10000L)).count()

    Seq(500000L, 5000000L, 50000000L).filter(_ <= maxN).foreach { n =>
      val df = scored(n).localCheckpoint(eager = true)
      val distinctRaw = df.select("score").distinct().count()
      val frameQuant = df.select(round(col("score") * 1e6).as("k"))
        .distinct().count()
      val (aucQ, tAucQ) = timed(Eval.rocAuc(df).collect()(0).getLong(2))
      val (_, tPrQ) = timed(Eval.prCurve(df).count())
      println(s"""{"q":"g19_auc_quant","n":$n,"sec":${f(tAucQ)},"serial_frame":$frameQuant,"auc_e6":$aucQ}""")
      println(s"""{"q":"g19_pr_quant","n":$n,"sec":${f(tPrQ)},"serial_frame":$frameQuant}""")
      // exact opt-out: the serial frame IS the distinct-score count —
      // measured at every decade it is safe to run locally; the point
      // of the default is that this column grows with the corpus
      val (aucX, tAucX) = timed(
        Eval.rocAuc(df, "score", "y", scoreQuantumE = None).collect()(0).getLong(2))
      val (_, tPrX) = timed(
        Eval.prCurve(df, "score", "y", scoreQuantumE = None).count())
      println(s"""{"q":"g19_auc_exact","n":$n,"sec":${f(tAucX)},"serial_frame":$distinctRaw,"auc_e6":$aucX}""")
      println(s"""{"q":"g19_pr_exact","n":$n,"sec":${f(tPrX)},"serial_frame":$distinctRaw}""")
      df.unpersist()
    }
    spark.stop()
  }

  private def f(sec: Double): String =
    BigDecimal(sec).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
}
