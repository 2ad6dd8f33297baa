package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the storage-side shuffle-elimination
  * pattern. The join subtree over the bucketed tables must contain no
  * exchange (and, with one file per bucket, no sort) — the layout did
  * the work at write time.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem⋈orders plans a sort-merge join with no exchange") {
    // a non-adaptive child session shares the catalog (and thus the
    // bucketed tables) but yields a plain executed plan to assert on
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.queries.Relational.q9ColocatedJoin(s2, sf)
    val plan = df.queryExecution.executedPlan
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
    val exchanges = smj.head.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"bucketed join must not re-shuffle its inputs:\n${smj.head}")
    // NOTE: a per-bucket Sort remains — Spark 3+ only trusts bucket
    // sort metadata under spark.sql.legacy.bucketedTableScan.outputOrdering.
    // The exchange (the part that scales with data volume) is gone; the
    // residual sort is per-bucket and spill-bounded.
    assert(smj.head.toString.contains("Bucketed: true"))
  }

  test("co-located join result equals the plain join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val expect = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = graft.queries.Relational.q9ColocatedJoin(spark, sf)
      .select("o_orderpriority", "n_items")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }
}
