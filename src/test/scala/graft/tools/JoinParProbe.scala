package graft.tools

import org.apache.spark.sql.functions._

/** Does spreading the checkpointed shingle frame across cores speed
  * the inverted-index pair join at bench scale? Interleaved A/B. */
object JoinParProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(32, 32).appName("join-par-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    val docs = graft.Tables.documents(spark, dir)
    val sh0 = docs.select(col("doc_id").as("id"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("s0"))
      .select(col("id"), xxhash64(col("s0")).as("s"))
      .localCheckpoint()
    val shPar = sh0.repartition(32).localCheckpoint()
    println(s"[jp] sh rows=${sh0.count()} parts=${sh0.rdd.getNumPartitions} " +
      s"parParts=${shPar.rdd.getNumPartitions}")
    def pairs(sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
      val p = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      p.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .where(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")) >= 0.5)
    }
    def t(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); graft.Bench.force(f); (System.nanoTime() - t0) / 1e9
    }
    t(pairs(sh0)); t(pairs(shPar)) // warm
    val (a, b) = (Vector.newBuilder[Double], Vector.newBuilder[Double])
    for (_ <- 0 until 5) { a += t(pairs(sh0)); b += t(pairs(shPar)) }
    println(f"[jp] single-block md=${a.result().sorted.apply(2)}%.2f  all=${a.result().map(x => f"$x%.2f").mkString(" ")}")
    println(f"[jp] 32-block     md=${b.result().sorted.apply(2)}%.2f  all=${b.result().map(x => f"$x%.2f").mkString(" ")}")
    spark.stop()
  }
}
