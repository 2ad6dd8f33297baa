package graft.planner

import scala.collection.concurrent.TrieMap

/** Metric catalog with the reference's lifecycle semantics
  * (reference: store/MetaStore.scala:37-213):
  *  - metrics auto-register on first sight during ingest
  *  - a metric whose largest rollup window sees an empty slice is
  *    deactivated (skipped by the scheduler / hidden from snapshots)
  *  - new data reactivates it
  *  - `~`-prefixed system metrics are tracked but flagged
  *
  * Driver-side state (like the reference's 5 s-refreshed in-memory
  * snapshot); on a cluster this would be backed by a small Delta table
  * and refreshed periodically. Regex search is O(#metrics) on the
  * snapshot, never a Spark job.
  */
class MetaStore {

  case class Entry(metric: Metric, lastProcessedMs: Long, active: Boolean)

  private val entries = TrieMap.empty[String, Entry]

  /** Register (or reactivate) a metric seen during ingest. */
  def track(metric: Metric, seenAtMs: Long): Unit =
    entries.updateWith(metric.name) {
      case Some(e) => Some(e.copy(lastProcessedMs = math.max(e.lastProcessedMs, seenAtMs), active = true))
      case None    => Some(Entry(metric, seenAtMs, active = true))
    }

  /** Advance the rollup cursor after a successful window pass. */
  def update(names: Seq[String], processedUpToMs: Long): Unit =
    names.foreach(n => entries.updateWith(n)(_.map(e =>
      e.copy(lastProcessedMs = math.max(e.lastProcessedMs, processedUpToMs)))))

  /** Empty slice in the largest window → deactivate (reference:
    * MetaStore.scala:196-200). */
  def notifyEmptySlice(name: String): Unit =
    entries.updateWith(name)(_.map(_.copy(active = false)))

  def allMetrics: Seq[Metric] = entries.values.map(_.metric).toSeq.sortBy(_.name)

  def allActiveMetrics: Seq[Metric] =
    entries.values.filter(_.active).map(_.metric).toSeq.sortBy(_.name)

  def isActive(name: String): Boolean = entries.get(name).exists(_.active)

  def lastProcessed(name: String): Option[Long] = entries.get(name).map(_.lastProcessedMs)

  /** Case-insensitive regex search over active metrics (the query
    * path's source resolution — reference: MetaStore.scala:110-114). */
  def searchByRegex(regex: String): Seq[Metric] = {
    val p = java.util.regex.Pattern.compile(s"(?i)$regex")
    allActiveMetrics.filter(m => p.matcher(m.name).matches())
  }

  def toCatalog: MetricCatalog = MetricCatalog(allActiveMetrics)
}
