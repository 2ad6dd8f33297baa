package graft.tools

import graft.GraftSession

/** One-off plan inspector for recently added operators (run by hand:
  * Test/runMain graft.tools.NewOpsPlanCheck [q1,q2,...]). */
object NewOpsPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8, 8).appName("new-ops-plan").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(
      Seq("e_anomaly_hourly", "d_unigram_logprob", "d_pack_contexts",
        "d_pmi_pairs", "d_source_mix", "d_freq_spectrum", "d_len_hist"))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
