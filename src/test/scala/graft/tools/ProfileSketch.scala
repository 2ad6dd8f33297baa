package graft.tools

import graft.GraftSession
import graft.Tables
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

object ProfileSketch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, dir))
    t("scan only") { meas.count() }
    t("plain sum groupBy same keys") {
      meas.groupBy(col("metric"), Rollup.bucketOf(col("ts_ms"), 5000L).as("b"))
        .agg(sum("value")).count()
    }
    graft.functions.ensureRegistered(spark)
    t("hdr_sketch groupBy") { Rollup.rawHistogramTier(meas).count() }
    t("hdr_sketch groupBy again") { Rollup.rawHistogramTier(meas).count() }
    val raw = Rollup.rawHistogramTier(meas).cache()
    t("raw cache materialize") { raw.count() }
    t("tierUp 30s from cached") { Rollup.histogramTierUp(raw, 30000L).count() }
    spark.stop()
  }
}
