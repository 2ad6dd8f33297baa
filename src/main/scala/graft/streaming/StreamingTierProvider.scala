package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.planner.{Metric, MetricCatalog, SummaryProvider}
import graft.rollup.Rollup

/** SummaryProvider over tiers built live by [[StreamingIngest]] — the
  * query side of the streaming pipeline: influx queries read the
  * streaming cascade's parquet sinks while ingestion keeps running.
  * Histogram summaries derive on read (`hdr_summary` over the few rows
  * surviving the time filter); counters read their tier directly.
  *
  * Reads go through [[graft.sources.TierStore.slice]], so the query's
  * time range prunes `bucket_date` partitions at the file listing
  * (PartitionFilters in the scan) — the reference's per-resolution
  * range read (store/SummaryStore.scala:108-117) — instead of listing
  * every file the stream ever wrote.
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
    val (kind, path) =
      if (metric.isHistogram) (StreamingIngest.HistKind, ingest.tierPath(windowMs))
      else (StreamingIngest.CounterKind, ingest.counterTierPath(windowMs))
    spark.catalog.refreshByPath(path)
    val tier = ingest.store.slice(kind, windowMs, fromMs, toMs, Some(metric.name))
    (if (metric.isHistogram) Rollup.histogramSummaries(tier) else tier)
      .drop("metric")
  }
}
