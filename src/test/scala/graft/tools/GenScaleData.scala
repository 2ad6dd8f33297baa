package graft.tools

import graft.GraftSession
import scala.util.Random

/** Seeded generator for the round-5 scaling study (BASELINE.md §G):
  * documents + embeddings tables with the driver corpus's measured
  * statistics (31-word uniform vocab, 10..100 tokens/doc, 20 sources,
  * en-heavy lang mix, ~0.2% exact dups, ~0.5% near-dups with two token
  * substitutions; embeddings 64-dim gaussian with ~1% planted
  * near-dup pairs at cosine ≈ 0.9). Same process at every size, so
  * timings across sizes isolate the PLAN's scaling, not corpus drift.
  *
  * Usage: Test/runMain graft.tools.GenScaleData <outDir> <nDocs> [clustered]
  * (embeddings count = nDocs * 2 / 5, matching sf0.1's 5000/2000).
  *
  * `clustered` switches the embeddings from isotropic gaussians to the
  * PRODUCTION regime ANN indexes are deployed for (BASELINE.md §G4):
  * 1000 gaussian clusters with zipf(1) mass — the head cluster captures
  * ~13% of the corpus, so the coarse quantizer's head Voronoi cell is
  * genuinely hot (the regime the hot-cell guard exists for). Cluster
  * σ = 0.1 against unit centers ⇒ member↔center cosine ≈ 0.78,
  * member↔member ≈ 0.61 — clustered enough to shape cells, loose
  * enough that 0.7-threshold near-dups stay the planted pairs. Planted
  * near-dup rate matches the isotropic mode.
  */
object GenScaleData {

  val Vocab: Vector[String] = Vector(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "query", "hash", "sort", "scan", "filter", "group", "order",
    "line", "part", "batch", "agg", "join", "key", "fast", "slow",
    "small", "large", "the", "a", "customer", "supplier", "index", "cache")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nDocs = args(1).toInt
    // mode flags compose: `stress` = clustered embeddings AND the
    // tailvocab token stream — both production stresses in one corpus
    // (the hybrid-retrieval grading regime: realistic df on the
    // lexical arm, zipf cell skew on the dense arm)
    val mode = args.lift(2).getOrElse("")
    // `shifted`: clustered geometry with the cluster CENTERS drawn from
    // an independent seed — the mass sits on different sphere regions
    // than the `clustered` corpus at the same size. Appending a shifted
    // corpus to an index trained on the clustered one is the §G11
    // quantizer-drift regime: cells shaped for corpus A serve corpus B.
    val shifted = mode == "shifted"
    val clustered = mode == "clustered" || mode == "stress" || shifted
    // `aniso`: isotropic gaussians scaled by an exponentially-decaying
    // per-dim spectrum (σ_d = e^(−d/16)) — the variance profile real
    // embedding models produce (what `Similarity.anisotropy` flags)
    // and the regime OPQ's rotation exists for (§G12)
    val aniso = mode == "aniso"
    // `tailvocab`: 25% of tokens draw from a 100k-id uniform tail
    // ("tail<k>") on top of the 31-word head — the realistic df
    // distribution the BM25 serve-vs-scan separation needs (with the
    // head-only vocab every query term's df ≈ 0.83·n, so an index
    // serve degenerates to a corpus scan by construction). Head-token
    // statistics (dup rates, lengths) are unchanged.
    val tailVocab = mode == "tailvocab" || mode == "stress"
    val nVecs = nDocs * 2 / 5
    val dims = 64
    val rnd = new Random(4242)

    // zipf(1)-weighted cluster centers for the clustered mode: center
    // sampling via inverse-CDF over the harmonic weights
    val nClusters = 1000
    val centerRnd = if (shifted) new Random(9191) else rnd
    val centers: Array[Array[Float]] =
      if (!clustered) Array.empty
      else Array.fill(nClusters) {
        val c = Array.fill(dims)(centerRnd.nextGaussian().toFloat)
        val nrm = math.sqrt(c.map(x => x * x).sum).toFloat
        c.map(_ / nrm)
      }
    val zipfCdf: Array[Double] =
      if (!clustered) Array.empty
      else {
        val w = Array.tabulate(nClusters)(c => 1.0 / (c + 1))
        val s = w.sum
        w.scanLeft(0.0)(_ + _).tail.map(_ / s)
      }
    def sampleCluster(): Int = {
      val u = rnd.nextDouble()
      val i = java.util.Arrays.binarySearch(zipfCdf, u)
      math.min(nClusters - 1, if (i >= 0) i else -i - 1)
    }

    val langs = Vector("en", "en", "en", "en", "zh", "zh", "es", "es", "fr", "fr", "de")
    val texts = new Array[String](nDocs)
    val docs = (0 until nDocs).map { i =>
      val text =
        if (i > 10 && rnd.nextDouble() < 0.002) texts(rnd.nextInt(i)) // exact dup
        else if (i > 10 && rnd.nextDouble() < 0.005) {                // near dup
          val base = texts(rnd.nextInt(i)).split(" ")
          (0 until 2).foreach(_ => base(rnd.nextInt(base.length)) =
            Vocab(rnd.nextInt(Vocab.size)))
          base.mkString(" ")
        } else {
          val n = 10 + rnd.nextInt(91)
          Seq.fill(n)(
            if (tailVocab && rnd.nextDouble() < 0.25) s"tail${rnd.nextInt(100000)}"
            else Vocab(rnd.nextInt(Vocab.size))).mkString(" ")
        }
      texts(i) = text
      (i.toLong, text, langs(rnd.nextInt(langs.size)), s"src${i % 20}",
        text.length.toLong)
    }

    val vecs = new Array[Array[Float]](nVecs)
    val embs = (0 until nVecs).map { i =>
      val v =
        if (i > 10 && rnd.nextDouble() < 0.01) {
          // planted near-dup: small gaussian perturbation keeps
          // cosine ≈ 0.9 against the base vector
          val base = vecs(rnd.nextInt(i))
          // clustered bases have norm ≈ 1.28 (unit center + σ 0.1
          // noise) vs ≈ 8 isotropic, so the same absolute perturbation
          // would push far past the near-dup band — 0.08 keeps the
          // planted pair at cosine ≈ 0.9 in that geometry
          base.map(x => x + (if (clustered) 0.08f else 0.22f) *
            rnd.nextGaussian().toFloat)
        } else if (clustered)
          centers(sampleCluster()).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
        else if (aniso)
          Array.tabulate(dims)(d =>
            (rnd.nextGaussian() * math.exp(-d / 16.0)).toFloat)
        else Array.fill(dims)(rnd.nextGaussian().toFloat)
      vecs(i) = v
      (i.toLong, v.toSeq, rnd.nextInt(10))
    }

    val spark = GraftSession.builder(8, 8).appName("graft-genscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embs.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) as embedding",
        "cast(label as int) as label")
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[genscale] wrote $nDocs docs / $nVecs vecs to $outDir")
    spark.stop()
  }
}
