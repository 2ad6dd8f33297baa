package graft.tools

import graft.{GraftSession, Monitoring, Tables}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

object MonitorDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Monitoring.instrument(spark)
    // real engine activity
    graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001").collect()
    graft.queries.Relational.q4TopOrders(spark, "/root/testdata/sf0.001").collect()
    // PROBE: failing action increments the failure counter
    try spark.read.parquet("/nonexistent").collect() catch { case _: Throwable => () }
    Thread.sleep(1500) // listeners are async
    println(s"DEMO pending samples: ${Monitoring.pendingCount}")
    val meas = Monitoring.flushAsMeasurements(spark).cache()
    meas.groupBy("metric").agg(count(lit(1)).as("n"), max("value").as("max_v"))
      .orderBy("metric").collect()
      .foreach(r => println(s"DEMO metric ${r.getString(0)} n=${r.getLong(1)} max=${r.getLong(2)}"))
    // cascade round-trip of the self-metrics
    val summary = Rollup.histogramSummaries(Rollup.rawHistogramTier(
      meas.where(col("metric") === "~system.query.duration")))
    println(s"DEMO cascade summary rows: ${summary.count()}")
    // PROBE: second flush is empty
    println(s"DEMO second flush rows: ${Monitoring.flushAsMeasurements(spark).count()}")
    spark.stop()
  }
}
