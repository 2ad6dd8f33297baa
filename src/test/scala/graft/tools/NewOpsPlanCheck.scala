package graft.tools

import graft.GraftSession

/** One-off plan inspector for the round-4 operators (run by hand:
  * Test/runMain graft.tools.NewOpsPlanCheck). */
object NewOpsPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8, 8).appName("new-ops-plan").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("d_hash_sample", "d_stratified_sample", "d_mixture_sample",
        "d_repetition", "d_redact", "d_multimodal_resize", "d_hll_users",
        "d_minhash_incremental",
        "e_event_funnel", "e_retention_cohorts", "d_tfidf_topk", "d_token_quantiles")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
