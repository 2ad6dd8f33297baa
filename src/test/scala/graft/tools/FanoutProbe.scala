package graft.tools

import org.apache.spark.sql.functions._

/** Isolates the cost components of the read fan-out: driver-side frame
  * build (incl. the .rdd partition probe), and the compute itself with
  * fanout on vs off, for a heavy map-side query. */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(32, 32).appName("fanout-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    graft.Bench.force(graft.Tables.documents(spark, dir).select(count(lit(1)).as("n")))
    for (flag <- Seq("true", "false", "true", "false")) {
      // the read-fanout lever was removed after this probe measured it
      // a net loss at bench scale; the conf is now inert and the A/B
      // arms differ only in measurement order
      spark.conf.set("spark.graft.read.fanout", flag)
      val d = t(s"build documents fanout=$flag") { graft.Tables.documents(spark, dir) }
      t(s"tokenize+count fanout=$flag") {
        graft.Bench.force(
          d.select(explode(graft.ops.Dedup.tokens(col("text"))).as("t"))
            .groupBy("t").count().agg(sum("count")))
      }
      t(s"shingle self-join fanout=$flag") {
        graft.Bench.force(
          graft.ops.Dedup.jaccardPairsAdaptive(graft.Tables.documents(spark, dir), 3, 0.5))
      }
    }
    spark.stop()
  }
}
