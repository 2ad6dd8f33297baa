package graft.tools
import graft.GraftSession
import graft.queries.MetricsQueries
object ProfileQuantized {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-quant").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (r <- 1 to 2; (name, fn) <- Seq(
        "k_hdr_quantized_1h" -> (MetricsQueries.hdrQuantized1h _),
        "k_hdr_summary_1h" -> (MetricsQueries.hdrSummary1h _),
        "k_hdr_summary_5m" -> (MetricsQueries.hdrSummary5m _))) {
      val t0 = System.nanoTime()
      graft.Bench.force(fn(spark, dir))
      println(f"RUN$r $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
