package graft.rollup

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, Tables}
import graft.sources.TierStore

/** Operational entry point: build the full rollup cascade from the
  * events table into date-partitioned tier tables + summary tables —
  * the batch equivalent of the streaming cascade, and the job a cluster
  * deployment schedules per tick.
  *
  * Usage: runMain graft.rollup.RollupJob <sfDir> <outDir>
  */
object RollupJob {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.builder().appName("graft-rollup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val store = new TierStore(spark, outDir)
    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, sfDir))

    // histogram cascade: raw 5s + standard tiers, each persisted
    var prev = Rollup.rawHistogramTier(meas)
    store.append("hist", Rollup.RawGroupMs, prev)
    Rollup.StandardTiers.foreach { d =>
      // read back the previous tier so each stage consumes the
      // materialized table (lineage stays one stage deep, as it would
      // on a cluster where tiers are tables, not cached DAGs)
      val source = if (d == Rollup.StandardTiers.head) prev
        else store.readAll("hist", prevDuration(d))
      val tier = Rollup.histogramTierUp(source, d)
      store.append("hist", d, tier)
      store.append("hist_summary", d, Rollup.histogramSummaries(
        store.readAll("hist", d)))
    }

    // counter cascade from event counts
    val counts = Tables.events(spark, sfDir).selectExpr(
      "event_type || '_count' AS metric", "ts_ms", "CAST(1 AS BIGINT) AS value")
    var cprev = Rollup.counterTier(counts, Rollup.RawGroupMs)
    store.append("counter", Rollup.RawGroupMs, cprev)
    Rollup.StandardTiers.foreach { d =>
      val source = if (d == Rollup.StandardTiers.head) cprev
        else store.readAll("counter", prevDuration(d))
      store.append("counter", d, Rollup.counterTierUp(source, d))
    }
  }

  private def prevDuration(d: Long): Long = {
    val idx = Rollup.StandardTiers.indexOf(d)
    if (idx <= 0) Rollup.RawGroupMs else Rollup.StandardTiers(idx - 1)
  }
}
