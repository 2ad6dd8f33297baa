package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** Scratch check: nearDupPairs LSH-candidate path returns the exact
  * all-pairs answer at both SFs, and the plan has no cartesian node. */
object NearDupCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8, 32).appName("neardup-check").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("params@0.45 = " + Similarity.lshParamsFor(0.45))
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val t0 = System.nanoTime()
      val df = Similarity.nearDupPairs(emb, 0.45)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"$sf -> ${rows.size} pairs in ${sec}s")
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      println(s"  bad plan nodes: $bad")
    }
    spark.stop()
  }
}
