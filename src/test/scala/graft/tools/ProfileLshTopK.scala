package graft.tools
import graft.GraftSession
import graft.queries.PipelineQueries
object ProfileLshTopK {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-lshtopk").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.Bench.force(PipelineQueries.lshTopK(spark, "/root/testdata/sf0.1"))
      println(f"RUN$r e_lsh_topk ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
