package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe (round 11): does a where() on entropy_e6 inline the
  * full run-length expression tree into the pushed Filter (quadratic
  * re-evaluation of array_sort inside every lambda step)? Times the
  * bare projection, the filtered plan, and the checkpointed-then-
  * filtered plan at the given SF. */
object ProbeEntropy {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(8, 8).appName("probe-ent").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    import graft.ops.Checkpoints.SharedOps
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    def time(name: String)(body: => Unit): Unit = {
      val t = System.nanoTime(); body
      println(s"$name: ${(System.nanoTime() - t) / 1e9}%s s".format(""))
    }
    val ent = graft.ops.TextAnalysis.tokenEntropy(docs)
    time("bare projection")(ent.agg(count(lit(1))).collect())
    time("where(entropy)")(
      ent.where(col("entropy_e6") >= 2500000L).agg(count(lit(1))).collect())
    time("checkpoint then where")(
      graft.ops.TextAnalysis.tokenEntropy(docs)
        .select(col("doc_id"), col("entropy_e6")).sharedCheckpoint(eager = true)
        .where(col("entropy_e6") >= 2500000L).agg(count(lit(1))).collect())
    spark.stop()
  }
}
