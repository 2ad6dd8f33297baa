package graft.tools

import graft.GraftSession
import graft.queries.Relational

object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def plan(name: String, df: org.apache.spark.sql.DataFrame, expect: Seq[String]): Unit = {
      df.collect() // finalize AQE so the executed plan shows codegen stages
      val p = df.queryExecution.executedPlan.toString
      expect.foreach { e =>
        println(s"PLAN $name contains '$e': ${p.contains(e)}")
      }
    }
    plan("q2 pushdown", Relational.q2FilterProject(spark, dir),
      Seq("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)", "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"))
    plan("q3 broadcast", Relational.q3RevenueByNation(spark, dir),
      Seq("BroadcastHashJoin"))
    plan("q4 topk", Relational.q4TopOrders(spark, dir),
      Seq("TakeOrderedAndProject"))
    plan("q1 codegen", Relational.q1PricingSummary(spark, dir),
      Seq("*(1) HashAggregate"))
    spark.stop()
  }
}
