package graft.planner

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ql.InfluxAst._
import graft.ql.InfluxParser

/** Provides summary tables per (metric, resolution). A summaries frame
  * has `bucket_start: Long` plus the summary columns (count, min, max,
  * mean, p50..p999 for histograms; count for counters). Implementations
  * back this with partitioned parquet/Delta tiers so the time-range
  * filter prunes at the scan.
  */
trait SummaryProvider {
  def catalog: MetricCatalog
  /** Summary rows for one metric at one resolution, restricted to
    * [fromMs, toMs]. Implementations push the range into partition
    * pruning (the reference pushes it into CQL —
    * store/SummaryStore.scala:108-117). */
  def summaries(metric: Metric, windowMs: Long, fromMs: Long, toMs: Long): DataFrame
  /** Resolutions available, ascending (reference: reference.conf:11). */
  def windows: Seq[Long] = graft.rollup.Rollup.StandardTiers
}

/** One output series: unique id, display label, source metric name, and
  * the (time, value) frame. */
case class SeriesResult(id: String, label: String, metricName: String, df: DataFrame)

/** Plans and executes parsed InfluxQL queries against a SummaryProvider,
  * lowering everything to DataFrame operations (time spine + joins +
  * column arithmetic) so Catalyst handles pushdown and the physical
  * plan. Semantics per reference: influx/finder/InfluxQueryResolver.scala.
  */
class InfluxPlanner(provider: SummaryProvider,
                    now: () => Long = () => System.currentTimeMillis(),
                    minResolution: Int = 100,   // reference.conf:62
                    maxResolution: Int = 700,   // reference.conf:63
                    // per-source summary read cap (reference.conf:32
                    // summary-limit). NOTE on fidelity: the reference's
                    // query path is effectively UNCAPPED — summary-limit
                    // is only readAll's default count
                    // (store/SummaryStore.scala:108), and the resolver
                    // overrides it with the user limit, default
                    // Int.MaxValue (InfluxQueryResolver.scala:138,
                    // InfluxAst.scala:30) — so the parity default here is
                    // Int.MaxValue too. Deployments wanting the
                    // reference.conf *intent* (bound the damage of a
                    // buggy/malicious wide-range force query) set 1000.
                    maxSummariesPerSource: Int = Int.MaxValue) {

  private val parser = new InfluxParser(now)

  /** Entry point: `list series …` or a select query → named series. */
  def execute(spark: SparkSession, queryText: String): Seq[SeriesResult] =
    parser.parseListSeries(queryText) match {
      case Some(ls) => Seq(listSeries(spark, ls))
      case None     => executeSelect(spark, parser.parseQuery(queryText))
    }

  /** All series unioned long-form: (series, time, value) — the shape the
    * driver's oracle can reproduce in SQL. */
  def executeLong(spark: SparkSession, queryText: String): DataFrame = {
    val results = execute(spark, queryText)
    results.map(r => r.df.select(lit(r.id).as("series"), col("time"), col("value")))
      .reduce(_ unionAll _)
  }

  private def listSeries(spark: SparkSession, ls: ListSeries): SeriesResult = {
    import spark.implicits._
    val names = provider.catalog.searchByRegex(ls.regex).map(_.name)
    SeriesResult("list_series_result", "list_series_result", "",
      names.toDF("name").select(lit(0L).as("time"), col("name").as("value")))
  }

  // ---- analysis --------------------------------------------------------

  /** Fold time filters to [from, to]; exclusive bounds become inclusive
    * by ±1 ms; missing from-bound is an error (reference:
    * InfluxQueryResolver.scala:67-85). */
  private[graft] def buildSlice(filters: Seq[Filter]): (Long, Long) = {
    var from: Option[Long] = None
    var to = now()
    filters.foreach {
      case TimeFilter(">", v)  => from = Some(v + 1)
      case TimeFilter(">=", v) => from = Some(v)
      case TimeFilter("<", v)  => to = v - 1
      case TimeFilter("<=", v) => to = v
      case _: TimeFilter       => ()
      case _: StringFilter     => () // parsed, ignored (reference parity)
    }
    (from.getOrElse(
      throw new UnsupportedOperationException("From clause required")), to)
  }

  /** Tier routing: nearest configured window to the requested one, then
    * widened/narrowed so the point count lands in [min, max] unless
    * forced (reference: InfluxQueryResolver.scala:89-118). */
  private[graft] def adjustResolution(from: Long, to: Long, gb: GroupBy): Long = {
    val sortedDesc = provider.windows.sortBy(-_)
    def points(w: Long): Long = math.abs(to - from) / w
    val nearest = sortedDesc.foldLeft(sortedDesc.last) { (best, next) =>
      if (math.abs(gb.durationMs - next) < math.abs(gb.durationMs - best)) next else best
    }
    if (gb.force) nearest
    else {
      val p = points(nearest)
      if (p <= maxResolution && p >= minResolution) nearest
      else sortedDesc.foldLeft(sortedDesc.head) { (adjusted, next) =>
        val np = points(next)
        if (np >= minResolution && np <= maxResolution) next
        else if (np < minResolution) next
        else adjusted
      }
    }
  }

  private def align(ts: Long, w: Long, floor: Boolean): Long =
    if (ts % w == 0) ts else { val d = ts / w; if (floor) d * w else (d + 1) * w }

  /** Validate aliases + bind sources + expand `*` (reference:
    * InfluxCriteriaBuilder.scala). Returns bound simple projections and
    * the source map keyed by tableId (alias or metric name). */
  private[graft] def bind(q: Query): (Seq[SimpleProjection], Map[String, Metric]) = {
    val aliases = q.tables.flatMap(_.alias)
    if (aliases.toSet.size < aliases.size)
      throw new UnsupportedOperationException("Different metrics can't use the same alias")

    val sources: Seq[(Metric, Option[String])] =
      q.tables.flatMap(t => provider.catalog.resolve(t.regex, t.alias))
    val sourceMap: Map[String, Metric] =
      sources.map { case (m, a) => a.getOrElse(m.name) -> m }.toMap

    def checkAlias(p: SimpleProjection): Unit = p match {
      case Field(_, _, Some(t)) if !aliases.contains(t) =>
        throw new UnsupportedOperationException(
          s"Projection is using an invalid alias: $t - Table alias: [${aliases.mkString(", ")}]")
      case BinaryOp(l, r, _, _) => checkAlias(l); checkAlias(r)
      case _ => ()
    }

    def validateFn(m: Metric, fn: String): Unit = {
      val valid = Fn.forType(m.mtype)
      if (!valid.contains(fn))
        throw new UnsupportedOperationException(
          s"$fn is an invalid function for a ${m.mtype}. Valid options: [${valid.mkString(",")}]")
    }

    val bound: Seq[SimpleProjection] = q.projections.flatMap {
      case AllFields(table) =>
        val matched = table match {
          case Some(t) => Seq(t -> sourceMap(t))
          case None    => sources.map { case (m, a) => a.getOrElse(m.name) -> m }
        }
        matched.flatMap { case (tid, m) =>
          Fn.forType(m.mtype).map(fn => Field(fn, None, Some(tid)))
        }
      case f @ Field(fn, alias, table) =>
        checkAlias(f)
        val matched = table match {
          case Some(t) => Seq(t -> sourceMap(t))
          case None    => sources.map { case (m, a) => a.getOrElse(m.name) -> m }
        }
        matched.map { case (tid, m) => validateFn(m, fn); Field(fn, alias, Some(tid)) }
      case c: Constant => Seq(c)
      case op @ BinaryOp(l, r, _, _) =>
        checkAlias(op)
        def bindOperand(p: SimpleProjection): SimpleProjection = p match {
          case Field(fn, a, Some(t)) =>
            val m = sourceMap.getOrElse(t, throw new UnsupportedOperationException(
              s"Projection is using an invalid alias: $t - Table alias: [${aliases.mkString(", ")}]"))
            validateFn(m, fn); Field(fn, a, Some(t))
          case other => other
        }
        Seq(op.copy(left = bindOperand(l), right = bindOperand(r)))
    }
    (bound, sourceMap)
  }

  // ---- execution -------------------------------------------------------

  private def executeSelect(spark: SparkSession, q: Query): Seq[SeriesResult] = {
    val (from, to) = buildSlice(q.filters)
    val windowMs = adjustResolution(from, to, q.groupBy)
    val gridFrom = align(from, windowMs, floor = false)
    val gridTo = align(to, windowMs, floor = true)
    val (projections, sourceMap) = bind(q)

    // one bounded summary read per source (reference reads each source
    // once: InfluxQueryResolver.scala:135-142); limit rides the time
    // order so it's a top-k pushed below the grid join
    val reads: Map[String, DataFrame] = sourceMap.map { case (tid, m) =>
      val base = provider.summaries(m, windowMs, from, to)
        .where(col("bucket_start").between(from, to))
      val ordered =
        if (q.orderAsc) base.orderBy(col("bucket_start").asc)
        else base.orderBy(col("bucket_start").desc)
      val cap = math.min(q.limit, maxSummariesPerSource)
      tid -> (if (cap != Int.MaxValue) ordered.limit(cap) else ordered)
    }

    val spine: DataFrame =
      if (gridFrom > gridTo) spark.range(0).select(col("id").as("time"))
      else spark.range(gridFrom, gridTo + 1, windowMs).select(col("id").as("time"))

    def valueCol(fn: String): Column = fn match {
      // counts-per-minute from the actual window (reference:
      // model/HistogramSummary.scala:92-101)
      case "cpm" => col("count") / lit(windowMs.toDouble / 60000.0)
      case other => col(other).cast("double")
    }

    /** (time, value) for one simple projection over the grid. */
    def series(p: SimpleProjection): DataFrame = p match {
      case Field(fn, _, Some(tid)) =>
        val joined = spine.join(
          reads(tid).withColumnRenamed("bucket_start", "time"), Seq("time"), "left")
        val withVal = joined.select(col("time"), valueCol(fn).as("value"))
        q.fill match {
          case Some(f) => withVal.select(col("time"), coalesce(col("value"), lit(f)).as("value"))
          case None    => withVal.where(col("value").isNotNull)
        }
      case Constant(v, _) => spine.select(col("time"), lit(v).as("value"))
      case BinaryOp(l, r, op, _) =>
        val lf = series(l).withColumnRenamed("value", "l")
        val rf = series(r).withColumnRenamed("value", "r")
        // timestamp-equi inner join (zip) — reference:
        // InfluxQueryResolver.scala:203-208
        val joined = lf.join(rf, Seq("time"), "inner")
        val expr = op match {
          case "+" => col("l") + col("r")
          case "-" => col("l") - col("r")
          case "*" => col("l") * col("r")
          case "/" =>
            // divide-by-zero fails the query (reference: InfluxAst.scala:86-95)
            when(col("r") === 0.0, raise_error(lit("Could not divide by zero")))
              .otherwise(col("l") / col("r"))
        }
        joined.select(col("time"), expr.as("value"))
      case Field(_, _, None) =>
        throw new IllegalStateException("unbound field after analysis")
    }

    // deterministic series order (reference: InfluxQueryResolver.scala:155)
    projections.sortBy(_.seriesId).map { p =>
      val raw = series(p)
      // scale + round to 4 dp HALF_UP always applies (reference:
      // InfluxQueryResolver.scala:214-224)
      val scaled = raw.select(col("time"),
        round(col("value") * lit(q.scale.getOrElse(1.0)), 4).as("value"))
      val ordered =
        if (q.orderAsc) scaled.orderBy(col("time").asc)
        else scaled.orderBy(col("time").desc)
      val (label, metricName) = p match {
        case Field(fn, alias, Some(tid)) => (alias.getOrElse(fn), tid)
        case c: Constant                 => (c.alias.getOrElse(""), "")
        case o: BinaryOp                 => (o.alias, "")
        case _                           => ("", "")
      }
      SeriesResult(p.seriesId, label, metricName, ordered)
    }
  }
}
