package graft

import graft.ql.InfluxParser
import graft.ql.InfluxAst._
import org.scalatest.funsuite.AnyFunSuite

/** Grammar conformance corpus, semantics per the reference parser spec
  * (reference: influx/parser/InfluxQueryParserSpec.scala:40-727).
  *
  * Coverage map vs the reference's 42 cases: every parse-level case has
  * a matching assertion here; the bind-level cases (duplicate/unknown
  * table aliases, invalid-field-for-type, inexistent metric, regex
  * fan-out, star expansion) live in InfluxPlannerSpec because this
  * engine validates them at bind time against the catalog — the
  * reference validates inside the parser, which holds a MetaStore; the
  * split is an intentional divergence, the rejected/accepted query set
  * is the same.
  */
class InfluxParserSpec extends AnyFunSuite {

  private val NOW = 1704067200000L
  private val parser = new InfluxParser(() => NOW)
  private def parse(q: String) = parser.parseQuery(q)

  test("simple field projection with group by time") {
    val q = parse("""select count from "metricA" where time >= 1 group by time(5m)""")
    assert(q.projections == Seq(Field("count", None, None)))
    assert(q.tables == Seq(TableRef("metricA", None)))
    assert(q.groupBy == GroupBy(force = false, 300000L))
  }

  test("alias, table alias and qualified projection") {
    val q = parse("""select x.p99 as nine from "m" as x where time >= 1 group by time(30s)""")
    assert(q.projections == Seq(Field("p99", Some("nine"), Some("x"))))
    assert(q.tables == Seq(TableRef("m", Some("x"))))
  }

  test("star projection") {
    val q = parse("""select * from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(AllFields(None)))
  }

  test("qualified star projection") {
    val q = parse("""select x.* from "m" as x where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(AllFields(Some("x"))))
  }

  test("percentiles expands to all") {
    val q = parse("""select percentiles from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Fn.PercentileNames.map(Field(_, None, None)))
  }

  test("percentiles with selection") {
    val q = parse("""select percentiles(50 99) from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(Field("p50", None, None), Field("p99", None, None)))
  }

  test("empty percentiles parens expands to all") {
    val q = parse("""select percentiles() from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Fn.PercentileNames.map(Field(_, None, None)))
  }

  test("invalid percentile value rejected") {
    intercept[UnsupportedOperationException] {
      parse("""select percentiles(47) from "m" where time >= 1 group by time(1m)""")
    }
  }

  test("scalar constant requires alias") {
    val q = parse("""select -9.87 as c from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(Constant(-9.87, Some("c"))))
    intercept[UnsupportedOperationException] {
      parse("""select -9.87 from "m" where time >= 1 group by time(1m)""")
    }
  }

  test("binary operation with qualified operands") {
    val q = parse("""select x.count + y.count as total from "a" as x, "b" as y where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(BinaryOp(
      Field("count", None, Some("x")), Field("count", None, Some("y")), "+", "total")))
  }

  test("operation with number operand") {
    val q = parse("""select x.max * 3 as tripled from "a" as x where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(BinaryOp(
      Field("max", None, Some("x")), Constant(3.0, None), "*", "tripled")))
  }

  test("operation requires alias") {
    intercept[UnsupportedOperationException] {
      parse("""select x.max * 3 from "a" as x where time >= 1 group by time(1m)""")
    }
  }

  test("multiple projections with and without commas") {
    val q = parse("""select count, max min from "m" where time >= 1 group by time(1m)""")
    assert(q.projections.collect { case Field(n, _, _) => n } == Seq("count", "max", "min"))
  }

  test("time filters with suffixes fold to millis") {
    val q = parse("""select count from "m" where time > 3h and time < 4h group by time(1m)""")
    assert(q.filters == Seq(TimeFilter(">", 10800000L), TimeFilter("<", 14400000L)))
  }

  test("between produces inclusive bounds") {
    val q = parse("""select count from "m" where time between 100 and 200 group by time(1m)""")
    assert(q.filters == Seq(TimeFilter(">=", 100L), TimeFilter("<=", 200L)))
  }

  test("now() minus offset folds to absolute millis") {
    val q = parse("""select count from "m" where time > now() - 2h group by time(1m)""")
    assert(q.filters == Seq(TimeFilter(">", NOW - 7200000L)))
    val q2 = parse("""select count from "m" where time <= now() group by time(1m)""")
    assert(q2.filters == Seq(TimeFilter("<=", NOW)))
  }

  test("string filter parsed (and ignored downstream)") {
    val q = parse("""select count from "m" where host = 'h1' and time >= 1 group by time(1m)""")
    assert(q.filters.head == StringFilter("host", "=", "h1"))
  }

  test("group by window suffixes incl ms; force flag") {
    assert(parse("""select count from "m" where time >= 1 group by time(500ms)""").groupBy.durationMs == 500L)
    assert(parse("""select count from "m" where time >= 1 force group by time(30s)""").groupBy == GroupBy(force = true, 30000L))
    assert(parse("""select count from "m" where time >= 1 group by time(2h)""").groupBy.durationMs == 7200000L)
  }

  test("fill scale limit order clauses") {
    val q = parse("""select count from "m" where time >= 1 group by time(1m) fill(-1) scale(0.5) limit 10 order desc""")
    assert(q.fill.contains(-1.0) && q.scale.contains(0.5) && q.limit == 10 && !q.orderAsc)
  }

  test("multi-source from") {
    val q = parse("""select count from "a" as x, "b" as y where time >= 1 group by time(1m)""")
    assert(q.tables == Seq(TableRef("a", Some("x")), TableRef("b", Some("y"))))
  }

  test("missing group by rejected") {
    intercept[UnsupportedOperationException] {
      parse("""select count from "m" where time >= 1""")
    }
  }

  test("unknown function rejected") {
    intercept[UnsupportedOperationException] {
      parse("""select banana from "m" where time >= 1 group by time(1m)""")
    }
  }

  test("group by with day suffix rejected (only ms/s/m/h)") {
    intercept[UnsupportedOperationException] {
      parse("""select count from "m" where time >= 1 group by time(1d)""")
    }
  }

  test("fractional group by duration rejected loudly, not truncated") {
    val e = intercept[UnsupportedOperationException] {
      parse("""select count from "m" where time >= 1 group by time(1.5h)""")
    }
    assert(e.getMessage.contains("fractional"))
    // integer durations still parse
    assert(parse("""select count from "m" where time >= 1 group by time(2h)""")
      .groupBy.durationMs == 7200000L)
  }

  test("list series meta query") {
    assert(parser.parseListSeries("list series /cpu.*/").contains(ListSeries(".*cpu.*.*")))
    assert(parser.parseListSeries("""select count from "m"""").isEmpty)
  }

  test("function with parens like max(value) accepted") {
    val q = parse("""select max(value) from "m" where time >= 1 group by time(1m)""")
    assert(q.projections == Seq(Field("max", None, None)))
  }

  test("cpm function parses as a field") {
    // reference: InfluxQueryParserSpec.scala:226-240 (no where clause)
    val q = parse("""select cpm from "m" group by time(5m)""")
    assert(q.projections == Seq(Field("cpm", None, None)))
  }

  test("negative scale parses") {
    // reference Scale case uses scale(-0.2) (InfluxQueryParserSpec.scala:585)
    val q = parse("""select max(value) from "m" where time >= 1 group by time(1m) scale(-0.2)""")
    assert(q.scale.contains(-0.2))
  }

  test("full query: aliased function, mixed filters, limit, order, trailing semicolon") {
    // reference: InfluxQueryParserSpec.scala:622-652
    val q = parse("""select count(value) as counter from "m" where time > 1000 and time <= 5000 and host <> 'aHost' group by time(30s) limit 550 order desc;""")
    assert(q.projections == Seq(Field("count", Some("counter"), None)))
    assert(q.filters == Seq(TimeFilter(">", 1000L), TimeFilter("<=", 5000L),
      StringFilter("host", "<>", "aHost")))
    assert(q.groupBy == GroupBy(force = false, 30000L))
    assert(q.limit == 550 && !q.orderAsc)
  }

  // ---- rejection corpus (reference: InfluxQueryParserSpec.scala:667-729) ----

  private def rejects(q: String): Unit =
    intercept[UnsupportedOperationException] { parse(q) }

  test("query without projection fails") {
    rejects("""select from "m" where time >= 1 group by time(30s)""")
  }

  test("query without from clause fails") {
    rejects("select max(value) ")
  }

  test("query without table fails") {
    rejects("select max(value) from")
  }

  test("unclosed string literal fails") {
    rejects("""select max(value) from "m" where host = 'host""")
  }

  test("unclosed parenthesis fails") {
    rejects("""select max(value) from "m" where time >= 1 group by time(30s""")
  }

  test("invalid now-offset suffix fails") {
    rejects("""select max(value) from "m" where time > now() - 1j group by time(30s)""")
  }

  test("star mixed with another projection fails") {
    rejects("""select * max from "m" where time >= 1 group by time(30s)""")
  }

  test("invalid operator fails") {
    rejects("""select max(value) & 3 from "m" where time >= 1 group by time(30s)""")
  }

  test("operation without operator fails") {
    rejects("""select max 3 from "m" where time >= 1 group by time(30s)""")
  }

  test("unknown order keyword fails") {
    rejects("""select * from "m" where time >= 1 group by time(30s) order inexistentOrder""")
  }
}
