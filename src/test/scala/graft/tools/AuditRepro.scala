package graft.tools
object AuditRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(4, 4).appName("audit-repro").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try { fn(spark, sf).queryExecution.optimizedPlan; () }
      catch { case e: Throwable => println(s"[repro] $n CONSTRUCTION FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(160)}") }
    }
    println("[repro] done")
    spark.stop()
  }
}
