package graft.ql

import scala.util.parsing.combinator.RegexParsers
import InfluxAst._

/** Parser for the InfluxQL-flavoured language, written fresh on
  * `RegexParsers` (the reference uses StandardTokenParsers; grammar
  * semantics per reference: influx/parser/InfluxQueryParser.scala:59-249).
  *
  * `now` is injected for deterministic tests (the reference overrides a
  * protected clock the same way).
  */
class InfluxParser(now: () => Long = () => System.currentTimeMillis()) extends RegexParsers {

  def parseQuery(input: String): Query = {
    // same pre-rewrite hack as the reference: `group by time` collides
    // with `time` as a filter identifier (reference: InfluxQueryParser.scala:50-51)
    val rewritten = input.replace("group by time", "group_by_time")
    parseAll(query, rewritten) match {
      case Success(q, _) => q
      case failure =>
        throw new UnsupportedOperationException(s"Unsupported query [$input]: $failure")
    }
  }

  /** `list series` / `list series /regex/` short-circuit (reference:
    * InfluxQueryResolver.scala:38-49, pattern at :230-234). */
  def parseListSeries(input: String): Option[ListSeries] = {
    val P = "list series /(.*)/".r
    input.trim match {
      case P(expr) => Some(ListSeries(s".*$expr.*"))
      case _       => None
    }
  }

  // ---- lexical helpers -------------------------------------------------

  private val ident = "[a-zA-Z_][a-zA-Z0-9_]*".r
  private val stringLit: Parser[String] =
    "\"" ~> """[^"]*""".r <~ "\"" | "'" ~> """[^']*""".r <~ "'"
  private val intLit = """\d+""".r

  private def kw(s: String): Parser[String] = s"(?i)\\Q$s\\E\\b".r

  private val double: Parser[Double] =
    """-?\d+(\.\d+)?""".r ^^ (_.toDouble)

  // ---- grammar ---------------------------------------------------------

  private def query: Parser[Query] =
    kw("select") ~> projections ~ (kw("from") ~> tables) ~ opt(whereClause) ~
      groupBy ~ opt(fillClause) ~ opt(scaleClause) ~ opt(limitClause) ~
      opt(orderClause) <~ opt(";") ^^ {
      case projs ~ tbls ~ filters ~ gb ~ fill ~ scale ~ limit ~ order =>
        Query(projs, tbls, filters.getOrElse(Nil), gb, fill, scale,
          limit.getOrElse(Int.MaxValue), order.getOrElse(true))
    }

  private def projections: Parser[Seq[Projection]] =
    starProjection ^^ (Seq(_)) |
      rep1sep(projection, opt(",")) ^^ (_.flatten)

  private def starProjection: Parser[Projection] =
    opt(ident <~ ".") <~ "*" ^^ (AllFields(_))

  private def projection: Parser[Seq[Projection]] =
    percentilesProjection |
      (binaryOp | fieldProjection | constantProjection) ^^ (Seq(_))

  /** `percentiles` / `percentiles(50 80 99)` expands to percentile
    * fields (reference: InfluxQueryParser.scala:126-142). */
  private def percentilesProjection: Parser[Seq[Projection]] =
    opt(ident <~ ".") ~ (kw("percentiles") ~> opt("(" ~> rep(percentileValue) <~ ")")) ^^ {
      case table ~ selected =>
        val names = selected.filter(_.nonEmpty).map(_.map(Fn.byPercentileValue))
          .getOrElse(Fn.PercentileNames)
        names.map(Field(_, None, table))
    }

  private def percentileValue: Parser[Int] =
    intLit.filter(s => Fn.PercentileValues.contains(s.toInt)).map(_.toInt) |
      failure(s"valid percentiles: ${Fn.PercentileValues.mkString(",")}")

  private def fnName: Parser[String] =
    ident.filter(Fn.All.contains) ~ opt("(" ~> opt(ident) <~ ")") ^^ { case f ~ _ => f }

  private def fieldProjection: Parser[SimpleProjection] =
    opt(ident <~ ".") ~ fnName ~ opt(kw("as") ~> ident) ^^ {
      case table ~ fn ~ alias => Field(fn, alias, table)
    }

  private def constantProjection: Parser[SimpleProjection] =
    double ~ (kw("as") ~> ident) ^^ { case v ~ a => Constant(v, Some(a)) }

  private def operand: Parser[SimpleProjection] =
    (ident <~ ".") ~ fnName ^^ { case t ~ f => Field(f, None, Some(t)) } |
      double ^^ (Constant(_, None))

  private def binaryOp: Parser[SimpleProjection] =
    operand ~ ("+" | "-" | "*" | "/") ~ operand ~ (kw("as") ~> ident) ^^ {
      case l ~ op ~ r ~ a => BinaryOp(l, r, op, a)
    }

  private def tables: Parser[Seq[TableRef]] =
    rep1sep(stringLit ~ opt(kw("as") ~> ident) ^^ {
      case re ~ alias => TableRef(re, alias)
    }, opt(","))

  private def whereClause: Parser[Seq[Filter]] =
    kw("where") ~> rep1(filterExpr <~ opt(kw("and"))) ^^ (_.flatten)

  private def filterExpr: Parser[Seq[Filter]] =
    timeBetween | relativeTime | timeComparison | stringComparison

  private def cmpOp: Parser[String] = "<=" | ">=" | "<" | ">"

  private def timeComparison: Parser[Seq[Filter]] =
    kw("time") ~> cmpOp ~ timeMillis ^^ { case op ~ ms => Seq(TimeFilter(op, ms)) }

  private def timeBetween: Parser[Seq[Filter]] =
    kw("time") ~> kw("between") ~> timeMillis ~ (kw("and") ~> timeMillis) ^^ {
      case a ~ b => Seq(TimeFilter(">=", a), TimeFilter("<=", b))
    }

  private def relativeTime: Parser[Seq[Filter]] =
    kw("time") ~> cmpOp ~ (kw("now") ~> "(" ~> ")" ~> opt("-" ~> timeMillis)) ^^ {
      case op ~ offset => Seq(TimeFilter(op, now() - offset.getOrElse(0L)))
    }

  /** bare number = millis; s/m/h/d/w suffixes convert
    * (reference: InfluxQueryParser.scala:183-197). */
  private def timeMillis: Parser[Long] =
    intLit ~ opt("(?i)[smhdw]\\b".r) ^^ {
      case n ~ suffix =>
        val v = n.toLong
        suffix.map(_.toLowerCase()) match {
          case Some("s") => v * 1000L
          case Some("m") => v * 60000L
          case Some("h") => v * 3600000L
          case Some("d") => v * 86400000L
          case Some("w") => v * 7L * 86400000L
          case None      => v
          // unreachable: the regex admits only [smhdw]; keeps the
          // match exhaustive for the compiler and refuses loudly if
          // the regex ever widens without this table
          case Some(other) =>
            throw new IllegalArgumentException(s"unknown time suffix '$other'")
        }
    }

  private def stringComparison: Parser[Seq[Filter]] =
    ident ~ ("=" | "<>") ~ stringLit ^^ {
      case id ~ op ~ v => Seq(StringFilter(id, op, v))
    }

  /** `group by time(5m)` — mandatory; `force` skips auto resolution
    * adjustment (reference: InfluxQueryParser.scala:199-221). Window
    * suffixes: ms/s/m/h only. */
  private def groupBy: Parser[GroupBy] =
    opt(kw("force")) ~ (kw("group_by_time") ~> "(" ~> windowDuration <~ ")") ^^ {
      case force ~ d => GroupBy(force.isDefined, d)
    }

  private def windowDuration: Parser[Long] =
    intLit ~ opt("." ~ intLit) ~ "(?i)(ms|s|m|h)".r >> {
      // a fractional duration has no tier semantics; reject loudly
      // instead of silently truncating 1.5h to 1h (reference grammar
      // only admits integers: InfluxQueryParser.scala:209-221)
      case _ ~ Some(_) ~ _ =>
        err("fractional durations are not supported in group by time")
      case n ~ None ~ suffix =>
        val v = n.toLong
        success(suffix.toLowerCase match {
          case "ms" => v
          case "s"  => v * 1000L
          case "m"  => v * 60000L
          case "h"  => v * 3600000L
        })
    }

  private def fillClause: Parser[Double] =
    kw("fill") ~> "(" ~> double <~ ")"

  private def scaleClause: Parser[Double] =
    kw("scale") ~> "(" ~> double <~ ")"

  private def limitClause: Parser[Int] =
    kw("limit") ~> intLit ^^ (_.toInt)

  private def orderClause: Parser[Boolean] =
    kw("order") ~> (kw("asc") ^^^ true | kw("desc") ^^^ false)
}
