package graft.tools

import graft.GraftSession
import graft.planner._
import graft.queries.InfluxQueries

object ProfileInflux {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val store = EventMetricStore.forSession(spark, dir)
    t("raw tier count") { store.summaries(Metric("view", "timer"), 30000L, 0L, Long.MaxValue).count() }
    t("1h summaries")   { store.summaries(Metric("view", "timer"), 3600000L, 0L, Long.MaxValue).count() }
    t("const_pct cold (cached tiers)") { InfluxQueries.constAndPercentiles(spark, dir).count() }
    t("const_pct warm") { InfluxQueries.constAndPercentiles(spark, dir).count() }
    t("cpm30m")         { InfluxQueries.cpm30m(spark, dir).count() }
    t("cpm30m warm")    { InfluxQueries.cpm30m(spark, dir).count() }
    t("fill5m")         { InfluxQueries.fillZero5m(spark, dir).count() }
    t("fill5m warm")    { InfluxQueries.fillZero5m(spark, dir).count() }
    spark.stop()
  }
}
