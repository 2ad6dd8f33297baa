package graft.tools
import graft.GraftSession
import graft.queries.PipelineQueries
object ProfileDecode {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-decode").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.Bench.force(PipelineQueries.multimodalDecode(spark, "/root/testdata/sf0.1"))
      println(f"RUN$r d_multimodal_decode ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
