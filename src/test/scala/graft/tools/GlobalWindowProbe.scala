package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.window.WindowExec

/** One-off: list queries whose physical plan contains an
  * unpartitioned (single-partition) WindowExec. AQE is disabled so the
  * executed plan is the concrete operator tree (an AdaptiveSparkPlan
  * wrapper hides its subtree from collect). */
object GlobalWindowProbe {
  def main(args: Array[String]): Unit = {
    val spark0 = GraftSession.builder(8, 8).appName("gw-probe").getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val globals = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (globals.nonEmpty) println(s"GLOBALWIN $name (${globals.size})")
      } catch { case e: Throwable => println(s"ERRQ $name ${e.getClass.getSimpleName}") }
    }
    spark0.stop()
  }
}
