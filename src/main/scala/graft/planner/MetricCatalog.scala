package graft.planner

/** Metric identity (reference: model/MetricMeasurement.scala:25-33). */
case class Metric(name: String, mtype: String) {
  def isSystem: Boolean = name.startsWith("~")
  def isHistogram: Boolean = mtype == "timer" || mtype == "gauge"
}

/** In-memory metric catalog with case-insensitive regex search
  * (reference: store/MetaStore.scala:110-114 + Snapshot). On a cluster
  * this is a small dimension table refreshed periodically; regex search
  * over a driver-side snapshot is O(#metrics), never a Spark job.
  */
case class MetricCatalog(metrics: Seq[Metric]) {

  def searchByRegex(regex: String): Seq[Metric] = {
    val p = java.util.regex.Pattern.compile(s"(?i)$regex")
    metrics.filter(m => p.matcher(m.name).matches())
  }

  def resolve(tableRegex: String, alias: Option[String]): Seq[(Metric, Option[String])] = {
    val matched = searchByRegex(tableRegex)
    if (matched.isEmpty)
      throw new UnsupportedOperationException(
        s"Unsupported query - There isnt any metric matching the regex [$tableRegex]")
    if (matched.size > 1 && alias.isDefined)
      throw new UnsupportedOperationException(
        s"Unsupported query - Regex [$tableRegex] matches more than one metric, so it can't have an alias ($alias)")
    matched.map(_ -> alias)
  }
}
