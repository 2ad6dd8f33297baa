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
  * Usage: Test/runMain graft.tools.GenScaleData <outDir> <nDocs>
  * (embeddings count = nDocs * 2 / 5, matching sf0.1's 5000/2000).
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
    val nVecs = nDocs * 2 / 5
    val dims = 64
    val rnd = new Random(4242)

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
          Seq.fill(n)(Vocab(rnd.nextInt(Vocab.size))).mkString(" ")
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
          base.map(x => x + 0.22f * rnd.nextGaussian().toFloat)
        } else Array.fill(dims)(rnd.nextGaussian().toFloat)
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
