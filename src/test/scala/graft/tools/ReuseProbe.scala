package graft.tools

/** Adjudication probe for PlanAuditSpec's shared-subtree audit: for
  * each named query, executes it once and reports whether the FINAL
  * adaptive physical plan rescued the duplicated logical subtree with
  * ReusedExchange/ReusedSubquery — the evidence a whitelist entry
  * needs ("duplicate in the logical plan, single execution physically").
  *
  * Usage: Test/runMain graft.tools.ReuseProbe q1,q2,... [sfDir]
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(8, 8).appName("graft-reuse-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val showDups = sys.env.contains("GRAFT_PROBE_DUPS")
    args(0).split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"[probe] $n reusedExchange=${plan.contains("ReusedExchange")} " +
        s"reusedSubquery=${plan.contains("ReusedSubquery")} " +
        s"exchanges=${"Exchange".r.findAllIn(plan).size}")
      if (showDups) {
        import org.apache.spark.sql.catalyst.plans.logical._
        val opt = df.queryExecution.optimizedPlan
        val counts = scala.collection.mutable.Map.empty[LogicalPlan, Int]
        def tally(p: LogicalPlan): Unit = {
          val c = p.canonicalized
          counts(c) = counts.getOrElse(c, 0) + 1
          p.children.foreach(tally)
        }
        tally(opt)
        def expensive(p: LogicalPlan): Boolean =
          p.exists {
            case _: Aggregate | _: Join | _: Window | _: Generate => true
            case _ => false
          } && p.exists {
            case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
            case _ => false
          }
        def walk(p: LogicalPlan): Unit =
          if (counts(p.canonicalized) >= 2 && expensive(p))
            println(s"[dup] $n ×${counts(p.canonicalized)}:\n" +
              p.treeString.linesIterator.take(25).mkString("\n"))
          else p.children.foreach(walk)
        walk(opt)
      }
    }
    spark.stop()
  }
}
