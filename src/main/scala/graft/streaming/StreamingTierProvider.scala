package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.planner.{Metric, MetricCatalog, SummaryProvider}
import graft.rollup.Rollup

/** SummaryProvider over tiers built live by [[StreamingIngest]] — the
  * query side of the streaming pipeline: influx queries read the
  * streaming cascade's parquet sinks while ingestion keeps running.
  * Histogram summaries derive on read (`hdr_summary` over the few rows
  * surviving the time filter); counters read their tier directly.
  *
  * Each read refreshes the path's cached file listing first — a live
  * streaming sink otherwise serves the snapshot from whenever the
  * session first listed it (the `refreshByPath` gotcha).
  */
class StreamingTierProvider(spark: SparkSession, ingest: StreamingIngest,
                            metrics: Seq[Metric]) extends SummaryProvider {

  override lazy val catalog: MetricCatalog = MetricCatalog(metrics)

  override def summaries(metric: Metric, windowMs: Long,
                         fromMs: Long, toMs: Long): DataFrame = {
    val path =
      if (metric.isHistogram) ingest.tierPath(windowMs)
      else ingest.counterTierPath(windowMs)
    spark.catalog.refreshByPath(path)
    val tier = spark.read.parquet(path)
      .where(col("metric") === metric.name &&
        col("bucket_start").between(fromMs, toMs))
    (if (metric.isHistogram) Rollup.histogramSummaries(tier) else tier)
      .drop("metric")
  }
}
