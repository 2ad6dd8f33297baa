package graft.tools
import graft.GraftSession
import graft.queries.InfluxQueries
object TierPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("tier-plan-check").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.planner.MaterializedTiers.ensure(spark, dir)
    for ((name, fn) <- Seq(
        "influx_auto_resolution" -> (InfluxQueries.autoResolution _),
        "influx_cpm_30m" -> (InfluxQueries.cpm30m _),
        "influx_const_pct" -> (InfluxQueries.constAndPercentiles _))) {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      println(f"CHECK $name rows=$n sec=$sec%.2f partFilters=${plan.contains("PartitionFilters: [isnotnull(bucket_date")}")
    }
    spark.stop()
  }
}
