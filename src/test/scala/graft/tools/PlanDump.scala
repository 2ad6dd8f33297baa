package graft.tools

/** Dumps `.explain("formatted")` for named queries to
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * files (the judge checks plan claims against these).
  *
  * Usage: Test/runMain graft.tools.PlanDump <q1,q2,...|ALL> <suffix> [sfDir] [tag]
  *   suffix: "before" | "after" (file name suffix)
  *   sfDir default /root/testdata/sf0.1, tag default r15
  *
  * Also executes each query once (collect) and appends the FINAL
  * adaptive plan (isFinalPlan=true) plus an exchange/reuse summary, so
  * the files show both the static shape and what AQE actually ran.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(32, 32).appName("graft-plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val tag = args.lift(3).getOrElse("r15")
    val suffix = args(1)
    val names: Seq[String] =
      if (args(0) == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // tiers/buckets/indexes exist on a deployment before any query runs
    try graft.planner.MaterializedTiers.ensure(spark, sf) catch { case _: Throwable => () }
    try graft.ops.Bucketing.ensureOrderTables(spark, sf) catch { case _: Throwable => () }
    try { graft.queries.PqServeStores.ensure(spark, sf); () } catch { case _: Throwable => () }
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sf)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.collect()
        val finalPlan = df.queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(finalPlan).size -
          "ReusedExchange".r.findAllIn(finalPlan).size
        val out = new java.io.PrintWriter(new java.io.File(dir, s"${n}_$suffix.txt"), "UTF-8")
        try {
          out.println(s"== $n ($suffix, $sf) ==")
          out.println(formatted)
          out.println()
          out.println(s"== final adaptive plan (exchanges=$exchanges, " +
            s"reusedExchange=${finalPlan.contains("ReusedExchange")}) ==")
          out.println(finalPlan)
        } finally out.close()
        println(s"[plandump] $n -> plans/$tag/${n}_$suffix.txt (exchanges=$exchanges)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
