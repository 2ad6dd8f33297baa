package graft.tools
import graft.{GraftSession, Tables}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._
object ProfileRawTier {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-rawtier").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, dir))
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (r <- 1 to 2) {
      t(s"r$r scan-only")(meas.agg(count(lit(1))).collect())
      t(s"r$r groupBy-count")(meas.groupBy(col("metric"),
        Rollup.bucketOf(col("ts_ms"), 5000L)).agg(count(lit(1))).agg(count(lit(1))).collect())
      t(s"r$r raw-tier sketch")(Rollup.rawHistogramTier(meas).agg(count(lit(1))).collect())
      t(s"r$r cascade to 1h")(Rollup.histogramCascade(Rollup.rawHistogramTier(meas))(3600000L)
        .agg(count(lit(1))).collect())
      t(s"r$r cascade+summary")(Rollup.histogramSummaries(
        Rollup.histogramCascade(Rollup.rawHistogramTier(meas))(3600000L))
        .agg(sum(col("p99"))).collect())
    }
    spark.stop()
  }
}
