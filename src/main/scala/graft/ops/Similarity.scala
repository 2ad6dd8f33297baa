package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (Array[Float]).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the corpus once — no shuffle until the per-query top-k
  * (which AQE keeps tiny). The LSH path buckets by random-hyperplane
  * signature so candidate generation touches only same-bucket pairs;
  * at 100 TB the bucket join replaces the quadratic cross product.
  */
object Similarity {

  /** Codegen'd double-precision dot product (custom Catalyst
    * expression — the higher-order `aggregate(zip_with(...))` fallback
    * evaluates lambdas interpretively and dominated pairwise scans). */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every corpus vector scored against every
    * query vector (queries broadcast), ranked per query. Norms are
    * computed once per vector, not once per pair. Exact — the baseline
    * the ANN path is measured against. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_nrm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    val scored = q.crossJoin(c)
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** All pairs with cosine ≥ threshold (near-duplicate detection),
    * brute force; ids only so the result is float-robust. The threshold
    * test is dot ≥ t·‖a‖·‖b‖ — one dot product per pair, norms
    * precomputed per vector. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(dot(col("va"), col("vb")) >= lit(threshold) * col("na") * col("nb"))
      .select(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH signature: `bits` seeded ±1 hyperplanes as a
    * literal matrix; sign of each projection becomes a signature bit.
    * Built from three nested higher-order folds so the expression tree
    * stays constant-size regardless of bits × dims (a per-term column
    * expansion blows up codegen at dims=64). */
  def lshSignature(vec: Column, bits: Int, dims: Int, seed: Int = 42): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(bits)(Seq.fill(dims)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val bitVals = transform(typedlit(planes), plane =>
      when(dot(vec, plane) >= 0, 1L).otherwise(0L))
    aggregate(bitVals, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** ANN top-k via multi-table LSH: `tables` independent signatures of
    * `bits` hyperplanes each (distinct seeds); candidates = union over
    * tables of same-bucket vectors, then exact cosine rank within
    * candidates. Recall ≈ 1-(1-p^bits)^tables for per-bit agreement p.
    * On unclustered (near-random) embeddings LSH recall is inherently
    * modest — that is the worst case; real corpora cluster. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dims: Int,
              tables: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.ensureRegistered(corpus.sparkSession)
    def buckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val sigs = (0 until tables).map(t =>
        struct(lit(t).as("t"), lshSignature(col(vec), bits, dims, seed = 42 + t).as("sig")))
      df.select(col(id), col(vec), explode(array(sigs: _*)).as("bk"))
        .select(col(id), col(vec), col("bk.t").as("t"), col("bk.sig").as("sig"))
    }
    val sigCorpus = buckets(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id", "n_vec")
    val sigQ = buckets(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")), "q_id", "q_vec")
    val cands = sigQ.join(sigCorpus, Seq("t", "sig"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec")).distinct()
    val scored = cands.select(col("q_id"), col("n_id"),
      cosine(col("q_vec"), col("n_vec")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }
}
