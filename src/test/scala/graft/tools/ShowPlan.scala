package graft.tools
import graft.GraftSession
import graft.queries.Relational
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Relational.q1PricingSummary(spark, "/root/testdata/sf0.01")
    df.collect()
    println("PLANSTART")
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
