package graft.tools

import org.apache.spark.sql.functions._

/** One-off parity probe (round 11): dumps floor(cosine·1e6) for all
  * vec_id < 50 pairs so scripts can check whether DuckDB's double
  * arithmetic reproduces the engine's quantized cosines bit-for-bit —
  * the go/no-go for MMR's integer-exact oracle design. */
object ProbeCos {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(8, 8).appName("probe-cos").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.vec_dot(a, b)
    val emb = spark.read.parquet(s"${args(0)}/embeddings.parquet")
      .where(col("vec_id") < 50)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        floor(dot(col("av"), col("bv")) /
          (sqrt(dot(col("av"), col("av"))) * sqrt(dot(col("bv"), col("bv"))))
          * 1e6).cast("long").as("c6"))
      .coalesce(1).write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
