package graft.tools

/** Minimal local-cluster[2,2,2048] viability probe (see ClusterSpec). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    println(s"SPARK_HOME=${sys.env.get("SPARK_HOME")}")
    val s = graft.GraftSession.clusterBuilder("local-cluster[2,2,2048]")
      .appName("graft-cluster-probe").getOrCreate()
    s.sparkContext.setLogLevel("INFO")
    println("context up: " + s.sparkContext.master)
    Thread.sleep(15000)
    import scala.sys.process._
    println("executors: " + Seq("bash", "-c",
      "ps -eo pid,args | grep CoarseGrained | grep -v grep | wc -l").!!.trim)
    val df = s.range(0, 1000000).selectExpr("id % 7 as k", "id")
      .groupBy("k").count()
    df.show(3)
    s.stop()
  }
}
