package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary groups and sums") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf).count())
    // sums positive, flags sorted
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags == flags.sorted)
  }

  test("q4 top orders is ordered desc and capped") {
    val rows = Relational.q4TopOrders(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("semi and anti join partition the keyspace") {
    val c = Tables.customer(spark, sf).count()
    val semi = Relational.q5SemiJoin(spark, sf).count()
    assert(semi > 0 && semi <= c)
  }

  test("events table normalizes nanos to ts_ms and timestamp") {
    val df = Tables.events(spark, sf)
    val r = df.selectExpr("min(ts_ms)", "max(ts_ms)", "min(ts)").collect()(0)
    // 2024-01-01 .. 2024-01-31 per TESTDATA generator
    assert(r.getLong(0) >= 1704067200000L && r.getLong(1) < 1706745600000L)
  }
}
