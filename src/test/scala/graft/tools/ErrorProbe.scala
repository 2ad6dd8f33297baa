package graft.tools

import graft.GraftSession
import graft.planner._

/** Manual probe driver: exercises the planner's error surface the way a
  * user-facing endpoint would (run with Test/runMain graft.tools.ErrorProbe). */
object ErrorProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val planner = new InfluxPlanner(EventMetricStore.forSession(spark, "/root/testdata/sf0.001"))
    def probe(name: String, q: String): Unit =
      try { planner.execute(spark, q).head.df.collect(); println(s"PROBE $name: OK") }
      catch { case e: Throwable =>
        println(s"PROBE $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n',' ').take(100)}") }
    probe("no-from", """select count from "purchase" group by time(1h)""")
    probe("no-metric", """select count from "zzz.*" where time >= 1704067200000 group by time(1h)""")
    probe("p99-on-counter", """select p99 from "view_count" where time >= 1704067200000 group by time(1h)""")
    probe("garbage", "DROP TABLE events")
    probe("dup-alias", """select count from "view" as x, "error" as x where time >= 1704067200000 group by time(1h)""")
    probe("regex-alias", """select count from ".*" as x where time >= 1704067200000 group by time(1h)""")
    probe("happy", """select count from "view" where time >= 1704067200000 force group by time(1h)""")
    spark.stop()
  }
}
