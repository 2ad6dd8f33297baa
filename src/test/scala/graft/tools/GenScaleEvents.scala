package graft.tools

import graft.GraftSession
import scala.util.Random

/** Seeded events generator for the round-5 rollup scaling study
  * (BASELINE.md §G2): same 30-day window, user population, type mix
  * and value distribution as the driver's sf0.1 events table, at any
  * row count — scaling the INGEST DENSITY while keeping the bucket
  * grid fixed, which is the axis that separates the rollup job's cost
  * (∝ rows) from the summary-read query cost (∝ buckets, the design
  * claim).
  *
  * Usage: Test/runMain graft.tools.GenScaleEvents <outDir> <nRows>
  */
object GenScaleEvents {

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val n = args(1).toInt
    val rnd = new Random(2424)
    val t0Ms = 1704067200000L           // 2024-01-01T00:00:00Z
    val spanMs = 30L * 24 * 3600 * 1000 // 30 days, the sf0.1 window
    val types = Vector("signup", "purchase", "view", "click", "error")

    val rows = Array.fill(n)(t0Ms + (rnd.nextDouble() * spanMs).toLong).sorted
      .zipWithIndex.map { case (ts, i) =>
        val value = math.min(560.0,
          math.rint(-50.0 * math.log(1.0 - rnd.nextDouble()) * 100) / 100)
        (i.toLong, ts * 1000L, rnd.nextInt(1500).toLong,
          types(rnd.nextInt(types.size)), value, s"""{"k": ${rnd.nextInt(100)}}""")
      }.toSeq

    val spark = GraftSession.builder(8, 8).appName("graft-genscale-events").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(ts_us) as ts", "user_id",
        "event_type", "value", "props")
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"[genscale] wrote $n events to $outDir")
    spark.stop()
  }
}
