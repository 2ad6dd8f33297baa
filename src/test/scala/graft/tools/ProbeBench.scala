package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Micro-benchmark for the IVF ASSIGNMENT term in isolation: times a
  * probe-only pass (explode + count, no join) over an embeddings table
  * through the flat quantizer (nlist dots/vector) and the two-level
  * one (≈ 3·√nlist dots/vector), at one or more nlist values — the
  * term that [[graft.functions.IvfProbeHier]] exists to cap once nlist
  * is grown with corpus size.
  *
  * Usage: Test/runMain graft.tools.ProbeBench <dir> [nlist1,nlist2,...]
  * Prints one JSON line {"flat_<nlist>":sec,"hier_<nlist>":sec,...}.
  */
object ProbeBench {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlists = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(781, 4096))
    val spark = GraftSession.builder(32, 32).appName("graft-probebench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .repartition(32)   // the genscale files are 8-way; use every core
      .localCheckpoint() // time the probe, not the scan
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      emb.select(explode(c).as("cell")).agg(sum(col("cell"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val results = nlists.flatMap { nlist =>
      // centroid TRAINING is priced identically by both paths; pin one
      // set so the timing isolates the per-vector probe
      val cents = Similarity.ivfCentroids(emb, nlist)
      // one warm pass each (codegen compile)
      time(graft.functions.ivf_probe(col("embedding"), cents, 2))
      time(graft.functions.ivf_probe_hier(col("embedding"), cents, 2, 2))
      Seq(
        s"flat_$nlist" -> time(graft.functions.ivf_probe(col("embedding"), cents, 2)),
        s"hier_$nlist" -> time(graft.functions.ivf_probe_hier(col("embedding"), cents, 2, 2)))
    }
    println(results.map { case (k, v) =>
      s""""$k":${math.round(v * 1000) / 1000.0}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
