package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** §G12 OPQ adjudication (BASELINE.md): does the OPQ rotation's
  * +recall at fixed m·ksub justify the extra d² matmul in the encode
  * path, on the CLUSTERED corpus the §G4 ANN rows grade against?
  *
  * Protocol: recall@10 vs brute force for 500 queries at the
  * e_pq_topk_real config (nlist ∝ n, nprobe 8, m 8, rerank 100), PQ
  * with and without the rotation, at two ksub widths (16 and 256 —
  * the narrow width is where quantization error dominates and
  * rotation has the most to recover). Also times the rotation
  * training and both encode passes so the overhead is a measured
  * number, not a guess. Prints one JSON line.
  *
  * Usage: Test/runMain graft.tools.OpqStudy <dir>
  */
object OpqStudy {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = 10
    val spark = GraftSession.builder(32, 32).appName("graft-opqstudy").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    val nlist = Similarity.suggestNlist(n)
    val queries = emb.where(col("vec_id") < 500).localCheckpoint()
    val truth = Similarity.bruteForceTopK(emb, queries, k)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }

    def recallOf(c: org.apache.spark.sql.DataFrame,
                 q: org.apache.spark.sql.DataFrame, ksub: Int,
                 residual: Boolean = false): (Double, Double) = {
      val (got, t) = timed {
        Similarity.ivfPqTopK(c, q, k, nlist = nlist, nprobe = 8, m = 8,
          ksub = ksub, rerank = 100, residual = residual)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      (got.intersect(truth).size.toDouble / truth.size, t)
    }

    val (rot, tTrain) = timed(Similarity.opqRotation(emb, m = 8, ksub = 16))
    val embRot = Similarity.rotated(emb, rot).localCheckpoint()
    val qRot = Similarity.rotated(queries, rot).localCheckpoint()

    val (rPlain16, tPlain16) = recallOf(emb, queries, 16)
    val (rOpq16, tOpq16) = recallOf(embRot, qRot, 16)
    val (rPlain256, tPlain256) = recallOf(emb, queries, 256)
    val (rOpq256, tOpq256) = recallOf(embRot, qRot, 256)
    // residual (IVFADC) mode × rotation: rotation composes (it is
    // global, residual geometry is isometric in rotated coordinates) —
    // this row measures whether it still BUYS anything once residual
    // encoding has already concentrated the codewords
    val (rRes16, _) = recallOf(emb, queries, 16, residual = true)
    val (rResOpq16, _) = recallOf(embRot, qRot, 16, residual = true)
    // the rotation matmul overhead in isolation: one full-corpus
    // rotated projection forced end to end
    val (_, tRotatePass) = timed {
      graft.Bench.force(Similarity.rotated(emb, rot)
        .select(element_at(col("embedding"), 1)))
    }

    def f(x: Double): String = f"$x%.3f"
    println(
      s"""{"n":$n,"nlist":$nlist,""" +
      s""""recall_plain_k16":${f(rPlain16)},"recall_opq_k16":${f(rOpq16)},""" +
      s""""recall_plain_k256":${f(rPlain256)},"recall_opq_k256":${f(rOpq256)},""" +
      s""""recall_resid_k16":${f(rRes16)},"recall_resid_opq_k16":${f(rResOpq16)},""" +
      s""""sec_plain_k16":${f(tPlain16)},"sec_opq_k16":${f(tOpq16)},""" +
      s""""sec_plain_k256":${f(tPlain256)},"sec_opq_k256":${f(tOpq256)},""" +
      s""""opq_train_sec":${f(tTrain)},"rotate_pass_sec":${f(tRotatePass)}}""")
    spark.stop()
  }
}
