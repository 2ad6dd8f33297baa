package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The §G4 study (BASELINE.md): the IVF family measured on a CLUSTERED
  * corpus — [[GenScaleData]]'s `clustered` mode (1000 gaussian clusters,
  * zipf(1) mass) — the production regime ANN indexes are deployed for
  * and the one regime the isotropic §G3 corpora cannot exhibit: a
  * zipf-head Voronoi cell capturing a double-digit percent of the
  * corpus. Reports, as one JSON line:
  *
  *  - the trained quantizer's cell-size distribution at the derived
  *    nlist (max-cell fraction, hot-cell count over the guard cap, the
  *    projected Σ C(|cell|,2) candidate volume) before and after the
  *    hot-cell guard's recursive splits — the quadratic term the guard
  *    re-bounds;
  *  - end-to-end near-dup timings guard-on vs guard-off, with pair
  *    counts (guard-on pairs are a subset; the delta is the recall
  *    price of re-bounding, the ratio its measure);
  *  - ANN recall@k on a query sample vs the brute-force oracle at a
  *    REALISTIC pruning config (flat IVF, IVF-PQ, IVFADC-residual) —
  *    clustered data is where residual encoding earns its keep and
  *    where unguarded recall numbers would hide a hot-cell scan.
  *
  * Usage: Test/runMain graft.tools.ClusterStudy <dir> [nQueries] [sections]
  * (sections: comma-set of cells,neardup,recall — default all).
  */
object ClusterStudy {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(1000)
    val sections = args.lift(2).map(_.split(",").map(_.trim).toSet)
    def want(s: String) = sections.forall(_.contains(s))
    val spark = GraftSession.builder(32, 32).appName("graft-clusterstudy").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    val nlist = Similarity.suggestNlist(n)
    val out = collection.mutable.LinkedHashMap[String, Double]()
    out += "n" -> n.toDouble
    out += "nlist" -> nlist.toDouble

    def cellCounts(assigned: DataFrame): Map[Int, Long] =
      assigned.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def projected(m: Map[Int, Long]): Double =
      m.values.map(c => c.toDouble * (c.toDouble - 1) / 2).sum

    if (want("cells")) {
      val t0 = System.nanoTime()
      val cents = Similarity.ivfCentroids(emb, nlist, iters = 1)
      out += "train_s" -> (System.nanoTime() - t0) / 1e9
      val assigned = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
        explode(graft.functions.ivf_probe(col("embedding"), cents, 2)).as("cell"))
        .localCheckpoint()
      val before = cellCounts(assigned)
      val total = before.values.sum
      val target = math.max(Similarity.HotCellMinTarget,
        math.ceil(total.toDouble / nlist).toLong)
      val cap = math.ceil(Similarity.DefaultHotCellFactor * target).toLong
      out += "max_cell_frac" -> before.values.max.toDouble / total
      out += "hot_cells" -> before.count(_._2 > cap).toDouble
      out += "projected_pairs_unsplit" -> projected(before)
      val t1 = System.nanoTime()
      val splits = Similarity.detectHotSplits(assigned, nlist, "id", "v",
        iters = 1, factor = Similarity.DefaultHotCellFactor, opName = "ClusterStudy")
      out += "split_detect_train_s" -> (System.nanoTime() - t1) / 1e9
      val after = cellCounts(Similarity.applyHotSplits(assigned, splits, "v", width = 2))
      out += "n_splits" -> splits.size.toDouble
      out += "max_cell_frac_split" -> after.values.max.toDouble / after.values.sum
      out += "projected_pairs_split" -> projected(after)
    }

    if (want("neardup")) {
      def run(factor: Double): (Double, Long) = {
        val t = System.nanoTime()
        val p = Similarity.ivfNearDupPairs(emb, threshold = 0.7, nlist = nlist,
          hotCellFactor = factor)
        val c = p.count()
        ((System.nanoTime() - t) / 1e9, c)
      }
      val (tOn, cOn) = run(Similarity.DefaultHotCellFactor)
      val (tOff, cOff) = run(Double.PositiveInfinity)
      out += "neardup_guard_on_s" -> tOn
      out += "neardup_guard_on_pairs" -> cOn.toDouble
      out += "neardup_guard_off_s" -> tOff
      out += "neardup_guard_off_pairs" -> cOff.toDouble
      out += "neardup_pair_recall_vs_off" ->
        (if (cOff == 0) 1.0 else cOn.toDouble / cOff)
    }

    if (want("recall")) {
      val qs = emb.where(col("vec_id") % lit(n / nQueries) === 0)
        .limit(nQueries).localCheckpoint()
      val k = 10
      def rows(d: DataFrame): Set[(Long, Long)] =
        d.select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = rows(Similarity.bruteForceTopK(emb, qs, k))
      def recallOf(name: String, d: => DataFrame): Unit = {
        val t = System.nanoTime()
        val got = rows(d)
        out += s"${name}_s" -> (System.nanoTime() - t) / 1e9
        out += s"${name}_recall" -> got.intersect(exact).size.toDouble / exact.size
      }
      recallOf("ivf_topk", Similarity.ivfTopK(emb, qs, k, nlist = nlist, nprobe = 8))
      recallOf("pq_topk", Similarity.ivfPqTopK(emb, qs, k, nlist = nlist,
        nprobe = 8, m = 8, ksub = 256, rerank = 100))
      recallOf("pq_residual", Similarity.ivfPqTopK(emb, qs, k, nlist = nlist,
        nprobe = 8, m = 8, ksub = 256, rerank = 100, residual = true))
      recallOf("ivf_topk_noguard", Similarity.ivfTopK(emb, qs, k, nlist = nlist,
        nprobe = 8, hotCellFactor = Double.PositiveInfinity))
    }

    println(out.map { case (key, v) =>
      val r = if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
              else f"$v%.4f"
      s""""$key":$r"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
