package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch profile: repeated timings of the nearDupPairs plan at sf0.1
  * after warmup, to separate real cost from run-to-run variance. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-neardup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // warm codegen on the small sf
    Similarity.nearDupPairs(Tables.embeddings(spark, "/root/testdata/sf0.001"), 0.45).count()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = Similarity.nearDupPairs(Tables.embeddings(spark, sf), 0.45)
      val n = df.agg(count(lit(1))).collect()(0).getLong(0)
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
