package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import graft.planner.MaterializedTiers
import graft.sources.TierStore

/** Rollup/metrics scaling harness (BASELINE.md §G2): times the full
  * tier build (the scheduled background job — the part whose cost is
  * ∝ ingest rows) separately from the query surface, split by read
  * path: cascade-from-raw queries (k_*: ∝ rows by construction) vs
  * summary-tier reads (influx_*: bucket-bound, the design claims
  * volume-independence) vs raw-event analytics (e_*: ∝ rows).
  *
  * Usage: Test/runMain graft.tools.ScaleBenchEvents <dir>
  */
object ScaleBenchEvents {

  val Queries: Seq[String] = Seq(
    "k_counter_rollup_1m", "k_hdr_summary_5m", "k_hdr_summary_1h",
    "k_hdr_quantized_1h",
    "influx_p99_hourly", "influx_auto_resolution", "influx_cpm_30m",
    "e_user_sessions", "e_anomaly_hourly")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.builder(32, 32).appName("graft-scalebench-events")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    Queries.foreach { n =>
      try Bench.force(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    // force a FRESH tier build so its cost is measured, not cached
    TierStore.deleteTree(new java.io.File(MaterializedTiers.tierDir(dir)))
    MaterializedTiers.invalidate(spark)
    val tb0 = System.nanoTime()
    MaterializedTiers.ensure(spark, dir)
    val tierBuild = ("tier_build", (System.nanoTime() - tb0) / 1e9)
    val timed = Queries.map { n =>
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(n)(spark, dir))
      n -> (System.nanoTime() - t0) / 1e9
    }
    val all = tierBuild +: timed
    println(all.map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
