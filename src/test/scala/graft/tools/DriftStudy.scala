package graft.tools

import graft.GraftSession
import graft.ops.{PqIndexStore, Similarity}
import org.apache.spark.sql.functions._

/** §G11 quantizer-drift study (BASELINE.md): the regime §G4 named as
  * the hot-cell guard's real prey — a PERSISTED quantizer serving data
  * it was not trained on. Lloyd absorbs corpus skew at train time (the
  * §G4 head cell on a 13%-head corpus is 0.74%), so a freshly-built
  * index never drifts; the dangerous state accumulates through appends
  * whose cluster mass the training corpus did not contain.
  *
  * Protocol: build a [[PqIndexStore]] on corpus A (GenScaleData
  * `clustered`), append corpus B (GenScaleData `shifted` — same
  * geometry, cluster centers drawn from an independent seed), and
  * measure: the audit before/after the append (hot cells, max cell,
  * projected Σ C(|cell|,2)), serve recall@k for B-queries against the
  * drifted index, then RETRAIN on A ∪ B (nlist regrown ∝ n, the
  * documented maintenance lever) and re-measure both. Prints one JSON
  * line with all counts, recalls, and timings.
  *
  * Usage: Test/runMain graft.tools.DriftStudy <dirA> <dirB> [nQueries]
  */
object DriftStudy {

  def main(args: Array[String]): Unit = {
    val (dirA, dirB) = (args(0), args(1))
    val nQueries = args.lift(2).map(_.toInt).getOrElse(200)
    val k = 10
    val spark = GraftSession.builder(32, 32).appName("graft-driftstudy").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ensureRegistered(spark)

    val embA = spark.read.parquet(s"$dirA/embeddings.parquet")
      .selectExpr("vec_id", "embedding").localCheckpoint()
    val nA = embA.count()
    // B ids offset past A so the union is collision-free
    val embB = spark.read.parquet(s"$dirB/embeddings.parquet")
      .selectExpr(s"vec_id + $nA AS vec_id", "embedding").localCheckpoint()
    val nB = embB.count()
    val full = embA.union(embB).localCheckpoint()

    val base = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val nlistA = Similarity.suggestNlist(nA)
    // ksub = 256 matches the §G4 ANN rows (recall there: flat 0.80 at
    // 1% probe on clustered data); 16 codewords/subspace would price
    // quantization error as recall and mask the drift signal
    val store = new PqIndexStore(spark, base, nlist = nlistA, m = 8, ksub = 256,
      superProbe = Some(2))

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tBuild) = timed(store.build(embA))
    val auditBefore = store.audit().get
    val (_, tAppend) = timed(store.append(embB))
    val auditDrifted = store.audit().get

    // serve recall for B-queries at a realistic pruning config, against
    // exact brute-force ground truth over the full corpus
    val queries = embB.where(col("vec_id") % lit(math.max(1L, nB / nQueries)) === 0)
      .limit(nQueries).localCheckpoint()
    val truth = Similarity.bruteForceTopK(full, queries, k)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallAndTime(s: PqIndexStore, nlist: Int): (Double, Double) = {
      // probe 1% of cells at either generation so the drifted/healed
      // recall rows compare at the SAME probe fraction
      val nprobe = math.max(8, nlist / 100)
      val (got, t) = timed {
        s.topK(full, queries, k, nprobe = nprobe, rerank = 10 * k)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      (got.intersect(truth).size.toDouble / truth.size, t)
    }

    val (recallDrifted, tServeDrifted) = recallAndTime(store, nlistA)

    // the maintenance lever the audit WARN names: retrain on the full
    // corpus with nlist regrown ∝ n, atomic swap
    val nlistFull = Similarity.suggestNlist(nA + nB)
    // the maintenance recipe the healing spec pins: hash-sampled init
    // (seeds proportional to mass) and a SECOND Lloyd round to settle
    // the split of the newly-seeded cells
    val retrained = new PqIndexStore(spark, base, nlist = nlistFull,
      m = 8, ksub = 256, superProbe = Some(2), sampleInit = true, iters = 2)
    val (_, tRetrain) = timed(retrained.build(full))
    val auditHealed = retrained.audit().get
    val (recallHealed, tServeHealed) = recallAndTime(retrained, nlistFull)

    def a(x: PqIndexStore.CellAudit): String =
      s"""{"cells":${x.nCells},"total":${x.total},"max_cell":${x.maxCell},""" +
      s""""cap":${x.cap},"hot_cells":${x.hotCells},""" +
      s""""projected_pairs":${x.projectedPairs.round},"drifted":${x.drifted}}"""
    def f(x: Double): String = f"$x%.3f"
    println(
      s"""{"n_a":$nA,"n_b":$nB,"nlist_a":$nlistA,"nlist_full":$nlistFull,""" +
      s""""audit_built":${a(auditBefore)},"audit_drifted":${a(auditDrifted)},""" +
      s""""audit_healed":${a(auditHealed)},""" +
      s""""recall_drifted":${f(recallDrifted)},"recall_healed":${f(recallHealed)},""" +
      s""""build_sec":${f(tBuild)},"append_sec":${f(tAppend)},""" +
      s""""retrain_sec":${f(tRetrain)},""" +
      s""""serve_drifted_sec":${f(tServeDrifted)},"serve_healed_sec":${f(tServeHealed)}}""")
    spark.stop()
  }
}
