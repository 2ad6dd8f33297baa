package graft.planner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.rollup.Rollup

/** SummaryProvider backed by the `events` table: each event_type is a
  * timer metric (value = floor(value)) and `<event_type>_count` is a
  * counter metric (1 per event).
  *
  * Tier frames are built once via the rollup cascade and cached —
  * queries then only filter (metric, bucket_start), which at scale maps
  * to partition-pruned reads of materialized tier tables.
  */
object EventMetricStore {
  // Keyed by the session OBJECT (identity hashes can collide across
  // session churn). NOTE the weak keying alone cannot reclaim entries:
  // the stores' cached DataFrames strongly reference their session, so
  // the value pins the key (a WeakHashMap rule). Lifecycle is therefore
  // explicit — a context-end hook clears the map, and [[invalidate]]
  // releases a session that is being retired early.
  private val instances = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, EventMetricStore]]())

  // One cleanup listener per SparkContext, NOT per session entry: a
  // per-entry anonymous listener closes over its session and stays on
  // the context's bus forever, pinning every churned session (and
  // stacking duplicates after invalidate + forSession).
  private val hooked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

  /** Drop a session's stores (call when retiring a session mid-JVM). */
  def invalidate(spark: SparkSession): Unit =
    instances.synchronized { instances.remove(spark); () }

  /** Reuse one store (and its cached tiers) per (session, dir). */
  def forSession(spark: SparkSession, dir: String): EventMetricStore = {
    val sc = spark.sparkContext
    if (hooked.putIfAbsent(sc, java.lang.Boolean.TRUE) == null)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          instances.synchronized { instances.clear() }
      })
    val perSession = instances.synchronized {
      var m = instances.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, EventMetricStore]
        instances.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(dir, new EventMetricStore(spark, dir))
  }
}

class EventMetricStore(spark: SparkSession, dir: String) extends SummaryProvider {

  private lazy val events = Tables.events(spark, dir)

  private lazy val eventTypes: Seq[String] =
    events.select("event_type").distinct().collect().map(_.getString(0)).sorted.toIndexedSeq

  override lazy val catalog: MetricCatalog = MetricCatalog(
    eventTypes.map(Metric(_, "timer")) ++
      eventTypes.map(t => Metric(s"${t}_count", "counter")))

  private lazy val rawTier: DataFrame =
    Rollup.rawHistogramTier(Rollup.eventsAsMeasurements(events)).cache()

  private lazy val histTiers: Map[Long, DataFrame] = {
    val cascade = Rollup.histogramCascade(rawTier)
    cascade.map { case (w, tier) => w -> Rollup.histogramSummaries(tier).cache() }
  }

  private lazy val counterTiers: Map[Long, DataFrame] = {
    val counts = events.select(
      concat(col("event_type"), lit("_count")).as("metric"),
      col("ts_ms"), lit(1L).as("value"))
    val raw = Rollup.counterTier(counts, Rollup.RawGroupMs)
    val out = scala.collection.mutable.LinkedHashMap[Long, DataFrame]()
    var prev = raw
    Rollup.StandardTiers.foreach { w =>
      val t = Rollup.counterTierUp(prev, w)
      out(w) = t.cache()
      prev = t
    }
    out.toMap
  }

  override def summaries(metric: Metric, windowMs: Long,
                         fromMs: Long, toMs: Long): DataFrame = {
    val tiers = if (metric.isHistogram) histTiers else counterTiers
    tiers(windowMs).where(col("metric") === metric.name)
      .where(col("bucket_start").between(fromMs, toMs))
      .drop("metric")
  }
}
