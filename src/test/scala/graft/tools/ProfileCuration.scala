package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch profile: repeated curation-funnel timings at sf0.1. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-curation").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.PipelineQueries.curationFunnel(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run("/root/testdata/sf0.001") // warm
    for (i <- 1 to 3) println(f"sf0.1 run $i: ${run("/root/testdata/sf0.1")}%.2f s")
    spark.stop()
  }
}
