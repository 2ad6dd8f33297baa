package graft.tools
import graft.{GraftSession, Tables}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._
object ProfileRawTier2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-rawtier2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, dir))
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(sum(xxhash64(col("sketch")) % 1000000007L)).collect(); ()
    }
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (r <- 1 to 2) {
      t(s"r$r raw5s forced")(force(Rollup.rawHistogramTier(meas)))
      t(s"r$r raw+30s forced")(force(Rollup.histogramTierUp(Rollup.rawHistogramTier(meas), 30000L)))
      t(s"r$r full cascade forced")(force(Rollup.histogramCascade(Rollup.rawHistogramTier(meas))(3600000L)))
    }
    spark.stop()
  }
}
