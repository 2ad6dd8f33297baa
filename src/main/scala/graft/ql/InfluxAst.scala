package graft.ql

/** AST for the InfluxQL-flavoured query language (re-derived from the
  * reference grammar, reference: influx/parser/InfluxAst.scala:24-133).
  */
object InfluxAst {

  /** Summary functions and which metric types they apply to
    * (reference: model/HistogramSummary.scala:25-118). */
  object Fn {
    val Percentiles: Seq[(String, Int)] =
      Seq("p50" -> 50, "p80" -> 80, "p90" -> 90, "p95" -> 95, "p99" -> 99, "p999" -> 999)
    val PercentileNames: Seq[String] = Percentiles.map(_._1)
    val PercentileValues: Seq[Int] = Percentiles.map(_._2)
    val Histogram: Seq[String] = PercentileNames ++ Seq("count", "min", "max", "mean", "cpm")
    val Counter: Seq[String] = Seq("count", "cpm")
    val All: Seq[String] = Histogram
    def byPercentileValue(v: Int): String = s"p$v"
    def forType(mtype: String): Seq[String] = mtype match {
      case "timer" | "gauge" => Histogram
      case "counter"         => Counter
      case other => throw new UnsupportedOperationException(s"Unknown metric type: $other")
    }
  }

  sealed trait Projection
  sealed trait SimpleProjection extends Projection {
    /** Deterministic output ordering key (reference: InfluxAst.scala seriesId). */
    def seriesId: String
  }

  /** `*` — expands to all functions valid for each source's type. */
  case class AllFields(table: Option[String]) extends Projection

  /** `p99`, `max as m`, `x.count` */
  case class Field(name: String, alias: Option[String], table: Option[String])
      extends SimpleProjection {
    def seriesId = s"${table.getOrElse("")}.${alias.getOrElse(name)}"
  }

  /** `-9.87 as c` — constant series over the time grid. */
  case class Constant(value: Double, alias: Option[String] = None) extends SimpleProjection {
    def seriesId: String = alias.getOrElse("")
  }

  /** `x.p99 / y.p99 as ratio` — binary math over two series;
    * nesting is not supported (parity with the reference). */
  case class BinaryOp(left: SimpleProjection, right: SimpleProjection,
                      op: String, alias: String) extends SimpleProjection {
    def seriesId: String = alias
  }

  case class TableRef(regex: String, alias: Option[String])

  sealed trait Filter
  /** Folded to a [from, to] slice; `>` means +1 ms, `<` means −1 ms. */
  case class TimeFilter(op: String, millis: Long) extends Filter
  /** Parsed but ignored at execution — parity with the reference
    * (reference: InfluxQueryResolver.scala:78 `//TODO`). */
  case class StringFilter(ident: String, op: String, value: String) extends Filter

  case class GroupBy(force: Boolean, durationMs: Long)

  case class Query(
      projections: Seq[Projection],
      tables: Seq[TableRef],
      filters: Seq[Filter],
      groupBy: GroupBy,
      fill: Option[Double],
      scale: Option[Double],
      limit: Int,
      orderAsc: Boolean)

  /** `list series /regex/` meta-query. */
  case class ListSeries(regex: String)
}
