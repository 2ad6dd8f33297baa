package graft.tools
import graft.GraftSession
import graft.queries.PipelineQueries
object ProfileJaccard2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-jac2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (r <- 1 to 2; (n, f) <- Seq(
        "d_jaccard_pairs" -> (PipelineQueries.jaccardPairs _),
        "d_minhash_lsh" -> (PipelineQueries.minhashLsh _))) {
      val t0 = System.nanoTime()
      graft.Bench.force(f(spark, dir))
      println(f"RUN$r $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
