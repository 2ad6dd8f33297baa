package graft.tools
import graft.{GraftSession, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._
object NearDupSweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("neardup-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val p = 1.0 - math.acos(0.45) / math.Pi
    for (bits <- Seq(4, 6, 8, 10, 12)) {
      val pb = math.pow(p, bits)
      val tables = math.max(1, math.ceil(math.log(1e-5) / math.log1p(-pb)).toInt)
      // candidate count
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      graft.functions.ensureRegistered(spark)
      val buckets = base.select(col("id"), posexplode(
        graft.functions.lsh_sigs(col("v"), 64, bits, tables, 42)).as(Seq("t", "sig")))
      val t0 = System.nanoTime()
      val nc = buckets.as("a").join(buckets.as("b"),
          col("a.t") === col("b.t") && col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      val tc = (System.nanoTime()-t0)/1e9
      println(f"bits=$bits%2d tables=$tables%4d cand=$nc%9d candTime=$tc%.2f")
    }
    spark.stop()
  }
}
