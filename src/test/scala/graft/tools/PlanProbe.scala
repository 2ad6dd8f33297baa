package graft.tools
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(8, 8).appName("graft-plan-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan
    val occ = scala.collection.mutable.Map.empty[LogicalPlan, List[String]]
    def tally(p: LogicalPlan, path: String): Unit = {
      val c = p.canonicalized
      occ(c) = (path + "/" + p.nodeName) :: occ.getOrElse(c, Nil)
      p.children.zipWithIndex.foreach { case (ch, i) => tally(ch, path + "/" + p.nodeName + s"[$i]") }
    }
    tally(opt, "")
    occ.filter(_._2.size >= 2).foreach { case (c, paths) =>
      println(s"[dupkey] ${c.nodeName} x${paths.size}")
      paths.foreach(p => println(s"   at $p"))
    }
    spark.stop()
  }
}
