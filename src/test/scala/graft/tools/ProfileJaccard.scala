package graft.tools

import graft.GraftSession
import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("docs scan") { docs.count() }
    val sh = docs.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), 3)).as("s")).persist()
    t("shingle explode+persist") { sh.count() }
    t("shingle explode again (cached)") { sh.count() }
    val pairs = sh.as("a").join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(count(lit(1)).as("inter"))
    t("pair join+group") { pairs.count() }
    t("full naive") { Dedup.jaccardPairs(docs, 3, 0.5).count() }
    spark.stop()
  }
}
