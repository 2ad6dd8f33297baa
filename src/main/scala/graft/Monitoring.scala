package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Self-monitoring loop (reference: model/Monitoring.scala:25-99):
  * timers/counters accumulate in memory and flush back into the ingest
  * path as `~system.*` metrics, which the catalog flags as internal
  * (reference: MetricMeasurement.scala:35-40 — `~` prefix convention).
  *
  * Spark-side instrumentation comes free from a QueryExecutionListener:
  * every action's wall time lands as a `~system.query.duration` timer.
  */
object Monitoring {

  private case class Sample(metric: String, tsMs: Long, value: Long)
  private val samples = new ConcurrentLinkedQueue[Sample]()
  // per-session registration: a listener binds one session's
  // listenerManager, so a JVM-global flag would leave every session
  // after the first silently uninstrumented. Keyed by the session-state
  // OBJECT (weakly, so stopped sessions drop out) — an identity-hash
  // key could collide across a long-lived JVM's session churn.
  private val instrumented = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]()))

  def recordTimer(name: String, millis: Long,
                  now: Long = System.currentTimeMillis()): Unit =
    if (millis >= 0) samples.add(Sample(s"~system.$name", now, millis))

  def incrementCounter(name: String, n: Long = 1,
                       now: Long = System.currentTimeMillis()): Unit =
    samples.add(Sample(s"~system.$name", now, n))

  /** Attach Spark query instrumentation (idempotent per session). */
  def instrument(spark: SparkSession): Unit = {
    if (instrumented.add(spark.sessionState)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          recordTimer("query.duration", durationNs / 1000000L)
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit =
          incrementCounter("query.failures")
      })
    }
  }

  /** Drain accumulated samples as a measurements frame (metric, ts_ms,
    * value) ready for the rollup cascade — the reference's 10 s flush
    * re-ingesting into its own pipeline. Note: Spark actions performed
    * on the returned frame are themselves instrumented, so the queue
    * refills as you consume it; flush on a cadence rather than
    * expecting an empty queue (the reference avoids this by exempting
    * its own monitoring writes — MetricMeasurement.scala:35-40). */
  def flushAsMeasurements(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val drained = scala.collection.mutable.ArrayBuffer.empty[Sample]
    var s = samples.poll()
    while (s != null) { drained += s; s = samples.poll() }
    drained.toSeq.map(x => (x.metric, x.tsMs, x.value))
      .toDF("metric", "ts_ms", "value")
  }

  def pendingCount: Int = samples.size()
}
