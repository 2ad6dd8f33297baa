package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import graft.sketch.{HdrSketchAgg, HdrSummaryExpr}

/** Column-level API for the engine's custom Catalyst functions.
  *
  * Functions are registered into a session's FunctionRegistry (idempotent)
  * and invoked via `call_function`, which keeps us on the public Column
  * API across Spark 4's sql-api split.
  */
package object functions {

  // weak IDENTITY set of sessions (ADVICE r13): keying by
  // sessionState.hashCode() risked an identity-hash collision after
  // session churn silently SKIPPING registration for a new session
  // (its SQL calls would then fail unresolved), and the string set
  // grew unboundedly. Weak keys also let churned sessions unpin.
  private val registered = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotently register graft functions into this session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (registered.add(spark)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "hdr_sketch", exprs => HdrSketchAgg(exprs.head, fromSketches = false)
          .toAggregateExpression(), "scala_udf")
      reg.createOrReplaceTempFunction(
        "hdr_merge", exprs => HdrSketchAgg(exprs.head, fromSketches = true)
          .toAggregateExpression(), "scala_udf")
      reg.createOrReplaceTempFunction(
        "hdr_summary", exprs => HdrSummaryExpr(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction(
        "word_shingles", exprs => WordShingles(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "lsh_sigs", exprs => LshSigs(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue(),
          exprs(3).eval().asInstanceOf[Number].intValue(),
          exprs(4).eval().asInstanceOf[Number].intValue()), "scala_udf")
      // Spark's runtime-filter bloom machinery, exposed as functions:
      // the aggregate builds a serialized filter over xxhash64 values,
      // the probe is a codegen'd membership test against a literal
      // filter. Used by Dedup.exactIncrementalBloom to pre-route new
      // digests before the exact residual join.
      reg.createOrReplaceTempFunction(
        "bloom_agg", exprs =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            exprs.head, exprs(1), exprs(2)).toAggregateExpression(), "scala_udf")
      reg.createOrReplaceTempFunction(
        "bloom_might_contain", exprs =>
          new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            exprs.head, exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction(
        "ivf_probe", exprs => IvfProbe(exprs.head,
          centroidsOf(exprs(1)),
          exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "ivf_probe_hier", exprs => IvfProbeHier(exprs.head,
          centroidsOf(exprs(1)),
          exprs(2).eval().asInstanceOf[Number].intValue(),
          exprs(3).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "pq_encode", exprs => PqEncode(exprs.head, codebooksOf(exprs(1)),
          exprs.lift(2).forall(_.eval().asInstanceOf[Boolean])), "scala_udf")
      reg.createOrReplaceTempFunction(
        "pq_lut", exprs => PqLut(exprs.head, codebooksOf(exprs(1)),
          exprs.lift(2).forall(_.eval().asInstanceOf[Boolean])), "scala_udf")
      reg.createOrReplaceTempFunction(
        "pq_adc", exprs => PqAdc(exprs.head, exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue(),
          exprs(3).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "pq_sdc", exprs => PqSdc(exprs.head, exprs(1),
          doublesOf(exprs(2)),
          exprs(3).eval().asInstanceOf[Number].intValue(),
          exprs(4).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "vec_rotate", exprs => VecRotate(exprs.head, doublesOf(exprs(1)),
          exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
      reg.createOrReplaceTempFunction(
        "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction(
        "gram_buckets", exprs => GramBuckets(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    }
  }

  /** Literal Seq[Double] from a foldable array arg. */
  private def doublesOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[Double] = {
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(arr.getDouble).toSeq
  }

  /** Literal Seq[Seq[Double]] centroid matrix from a foldable arg. */
  private def centroidsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[Seq[Double]] = {
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { i =>
      val row = arr.getArray(i)
      (0 until row.numElements()).map(row.getDouble).toSeq
    }.toSeq
  }

  /** Aggregate raw non-negative Longs into a serialized HDR sketch. */
  def hdr_sketch(c: Column): Column = call_function("hdr_sketch", c)

  /** Merge serialized HDR sketches (rollup tier k-1 → tier k). */
  def hdr_merge(c: Column): Column = call_function("hdr_merge", c)

  /** Unpack a sketch into the summary struct (count..p999). */
  def hdr_summary(c: Column): Column = call_function("hdr_summary", c)

  /** Codegen'd double-precision dot product of two numeric arrays. */
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Distinct word k-shingles of normalized text, single pass. */
  def word_shingles(text: Column, k: Int): Column =
    call_function("word_shingles", text, org.apache.spark.sql.functions.lit(k))

  /** Codegen'd engine-portable polynomial string hash (seed 7, ×31,
    * mod 1e9+7 over code points; `''` hashes to 217 — see
    * [[PolyHash]]). */
  def poly_hash(s: Column): Column = call_function("poly_hash", s)

  /** Hashed unigram+bigram buckets of a token array in one pass (the
    * DSIR featurizer — see [[GramBuckets]]). */
  def gram_buckets(toks: Column, nBuckets: Int): Column =
    call_function("gram_buckets", toks, org.apache.spark.sql.functions.lit(nBuckets))

  /** All multi-table random-hyperplane LSH signatures of a vector
    * (tables × bits, planes seeded per table), one codegen'd pass. */
  def lsh_sigs(vec: Column, dims: Int, bits: Int, tables: Int, seed: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("lsh_sigs", vec, lit(dims), lit(bits), lit(tables), lit(seed))
  }

  /** Serialized bloom filter over a Long (xxhash64) column. */
  def bloom_agg(h: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_agg", h, lit(expectedItems), lit(numBits))
  }

  /** Codegen'd membership probe of a Long against a bloom literal. */
  def bloom_might_contain(bloom: Column, h: Column): Column =
    call_function("bloom_might_contain", bloom, h)

  /** The nprobe nearest IVF centroid ids by cosine, nearest first. */
  def ivf_probe(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("ivf_probe", vec, typedlit(centroids), lit(nprobe))
  }

  /** Two-level probe: rank ⌈√nlist⌉ super-centroids, scan only the
    * `superProbe` nearest super-cells' centroids — ≈ (1+superProbe)·
    * √nlist dots per vector instead of nlist (see [[IvfProbeHier]]). */
  def ivf_probe_hier(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int,
                     superProbe: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("ivf_probe_hier", vec, typedlit(centroids), lit(nprobe), lit(superProbe))
  }

  /** Literal m × ksub × dsub PQ codebook tensor from a foldable arg. */
  private def codebooksOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[Seq[Seq[Double]]] = {
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { j =>
      val sub = arr.getArray(j)
      (0 until sub.numElements()).map { c =>
        val row = sub.getArray(c)
        (0 until row.numElements()).map(row.getDouble).toSeq
      }.toSeq
    }.toSeq
  }

  /** PQ codes of a vector, packed into one long (code j at bit j·⌈log2
    * ksub⌉) — the 8-byte scan-side representation. `normalize = false`
    * for residual inputs (their norms carry the geometry). */
  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Double]]],
                normalize: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_encode", vec, typedlit(codebooks), lit(normalize))
  }

  /** Per-query ADC lookup table (m·ksub squared subspace distances). */
  def pq_lut(vec: Column, codebooks: Seq[Seq[Seq[Double]]],
             normalize: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_lut", vec, typedlit(codebooks), lit(normalize))
  }

  /** Codegen'd ADC distance of packed codes against a query LUT. */
  def pq_adc(lut: Column, codes: Column, m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("pq_adc", lut, codes, lit(m), lit(ksub))
  }

  /** Symmetric PQ distance between two packed code words against a
    * flat m·ksub² codeword-pair table (see [[PqSdc]]). */
  def pq_sdc(a: Column, b: Column, table: Seq[Double], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_sdc", a, b, typedlit(table), lit(m), lit(ksub))
  }

  /** Rotate a vector by a plan-literal row-major d×d matrix (the OPQ
    * rotation step — see [[VecRotate]]). */
  def vec_rotate(vec: Column, mat: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    val d = mat.length
    call_function("vec_rotate", vec, typedlit(mat.flatten), lit(d))
  }

  /** Unpack a packed-codes long into its m per-subspace code ids —
    * literal shifts only, so it stays in whole-stage codegen. */
  def pq_unpack(codes: Column, m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{array, lit, shiftrightunsigned}
    val bits = PqCodec.codeBits(ksub)
    val mask = if (bits == 0) 0L else (1L << bits) - 1L
    array((0 until m).map(j =>
      shiftrightunsigned(codes, j * bits).bitwiseAND(lit(mask)).cast("int")): _*)
  }
}
