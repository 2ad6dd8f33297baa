package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Product-quantization codec (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search"): a d-dim vector splits into m
  * contiguous subvectors of d/m dims; each subspace has its own ksub
  * codewords, and a vector stores only its m nearest-codeword ids —
  * m·log2(ksub) bits instead of 4d bytes on the scan side. Distances
  * are Asymmetric (ADC): the query stays exact, each subspace
  * contributes a table lookup of ‖q_sub − codeword‖², and the scan cost
  * per pair is m adds instead of d multiplies.
  *
  * Vectors are unit-normalized inside the codec, so squared-L2 ADC
  * order equals cosine order (‖a−b‖² = 2 − 2·cos for unit vectors) and
  * the exact re-rank downstream can keep using cosine.
  *
  * Shared geometry of the three expressions: codebooks is m × ksub ×
  * dsub, flattened row-major; codes index [0, ksub); LUTs are m·ksub
  * doubles with subspace-major layout lut[j·ksub + c].
  */
private[functions] trait PqCodebooks {
  def codebooks: Seq[Seq[Seq[Double]]]

  final def m: Int = codebooks.length
  final def ksub: Int = codebooks.head.length
  final def dsub: Int = codebooks.head.head.length
  final def dims: Int = m * dsub

  /** Flat m × ksub × dsub codeword matrix, row-major, raw values
    * (codewords are subspace means of already-normalized vectors — they
    * are NOT renormalized; a subvector's norm carries information). */
  @transient final lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val row = codebooks(j)(c)
        var d = 0
        while (d < dsub) { out((j * ksub + c) * dsub + d) = row(d); d += 1 }
        c += 1
      }
      j += 1
    }
    out
  }

  final def checkVec(e: Expression, name: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name requires array<float|double> input, got $other")
    }

  final def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Whether the input vector is unit-normalized before encoding.
    * True for raw vectors (cosine ≡ L2 on the unit sphere); FALSE for
    * residual inputs (v − centroid), whose norms carry the geometry —
    * renormalizing a residual would destroy it. */
  def normalizeInput: Boolean

  /** Read (and optionally unit-normalize) the input vector. */
  final def normalizedVec(v: ArrayData, fl: Boolean, name: String): Array[Double] = {
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"$name: vector has ${v.numElements()} dims, expected $dims")
    val x = new Array[Double](dims)
    var s = 0.0
    var i = 0
    while (i < dims) {
      val xv = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = xv; s += xv * xv; i += 1
    }
    if (normalizeInput) {
      val nrm = math.sqrt(s) max 1e-12
      i = 0
      while (i < dims) { x(i) /= nrm; i += 1 }
    }
    x
  }

  /** Codegen fragment reading (and optionally normalizing) the input
    * into a fresh `double[]`; returns (code, arrayVarName). EVERY
    * local is freshName'd: with a CodegenFallback sibling (e.g. a
    * zip_with residual child) the projection compiles in non-whole-
    * stage mode, where the input ROW parameter is literally named `i`
    * — a bare `for (int i ...)` is a compile-time redefinition. */
  final def normalizeGen(ctx: CodegenContext, v: String, get: String,
                         name: String): (String, String) = {
    val x = ctx.freshName("pqX")
    val ss = ctx.freshName("pqSs")
    val ix = ctx.freshName("pqI")
    val xv = ctx.freshName("pqXv")
    val nrm = ctx.freshName("pqNrm")
    val ix2 = ctx.freshName("pqI")
    val normPart =
      if (!normalizeInput) ""
      else
        s"""
           |double $nrm = java.lang.Math.max(java.lang.Math.sqrt($ss), 1e-12);
           |for (int $ix2 = 0; $ix2 < $dims; $ix2++) { $x[$ix2] /= $nrm; }
         """.stripMargin
    val code =
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "$name: vector has " + $v.numElements() + " dims, expected $dims");
         |}
         |double[] $x = new double[$dims];
         |double $ss = 0.0;
         |for (int $ix = 0; $ix < $dims; $ix++) {
         |  double $xv = (double) $v.$get($ix);
         |  $x[$ix] = $xv; $ss += $xv * $xv;
         |}
         |$normPart
       """.stripMargin
    (code, x)
  }
}

private[functions] object PqCodec {
  /** Bits per code: ⌈log2(ksub)⌉ (0 for a single-codeword book). */
  def codeBits(ksub: Int): Int =
    if (ksub <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros((ksub - 1).toLong)
}

/** PQ encoder: the m nearest-codeword ids (squared L2 per subspace,
  * ties to the lower id) of the unit-normalized vector, PACKED into a
  * single long — code j occupies bits [j·b, (j+1)·b) with b =
  * ⌈log2 ksub⌉ (m·b ≤ 64; the canonical m=8 × 8-bit config fills the
  * word exactly). A primitive 8-byte column is what the candidate scan
  * shuffles and holds per corpus vector — vs 4·d bytes of float32 — and
  * it lays out flat in UnsafeRow where an array<int> carries header +
  * width overhead. This runs once per corpus vector. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                    normalizeInput: Boolean = true)
  extends UnaryExpression with PqCodebooks {

  private val bits = PqCodec.codeBits(ksub)
  require(m * bits <= 64,
    s"pq_encode: $m subspaces x $bits bits/code exceed one 64-bit word")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec(child, "pq_encode")

  override def nullSafeEval(input: Any): Any = {
    val x = normalizedVec(input.asInstanceOf[ArrayData], isFloat(child), "pq_encode")
    var packed = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        var dist = 0.0
        var d = 0
        val off = (j * ksub + c) * dsub
        while (d < dsub) {
          val diff = x(j * dsub + d) - flat(off + d)
          dist += diff * diff; d += 1
        }
        if (dist < bestD) { best = c; bestD = dist }
        c += 1
      }
      packed |= best.toLong << (j * bits)
      j += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat(child)) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (readCode, x) = normalizeGen(ctx, v, get, "pq_encode")
      val packed = ctx.freshName("pqPacked")
      val j = ctx.freshName("pqJ")
      val best = ctx.freshName("pqBest")
      val bestD = ctx.freshName("pqBestD")
      val c = ctx.freshName("pqC")
      val dist = ctx.freshName("pqDist")
      val off = ctx.freshName("pqOff")
      val d = ctx.freshName("pqD")
      val diff = ctx.freshName("pqDiff")
      s"""
         |$readCode
         |long $packed = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dist = 0.0;
         |    int $off = ($j * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $x[$j * $dsub + $d] - $cbRef[$off + $d];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $best = $c; $bestD = $dist; }
         |  }
         |  $packed |= ((long) $best) << ($j * $bits);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Query-side ADC lookup table: ‖q_sub_j − codeword_c‖² for every
  * (subspace j, codeword c), subspace-major. Computed once per query
  * (m·ksub·dsub work), amortized over every candidate it scores. */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                 normalizeInput: Boolean = true)
  extends UnaryExpression with PqCodebooks {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec(child, "pq_lut")

  override def nullSafeEval(input: Any): Any = {
    val x = normalizedVec(input.asInstanceOf[ArrayData], isFloat(child), "pq_lut")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var dist = 0.0
        var d = 0
        val off = (j * ksub + c) * dsub
        while (d < dsub) {
          val diff = x(j * dsub + d) - flat(off + d)
          dist += diff * diff; d += 1
        }
        out(j * ksub + c) = dist; c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat(child)) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (readCode, x) = normalizeGen(ctx, v, get, "pq_lut")
      val lut = ctx.freshName("pqLut")
      val j = ctx.freshName("pqJ")
      val c = ctx.freshName("pqC")
      val dist = ctx.freshName("pqDist")
      val off = ctx.freshName("pqOff")
      val d = ctx.freshName("pqD")
      val diff = ctx.freshName("pqDiff")
      s"""
         |$readCode
         |double[] $lut = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dist = 0.0;
         |    int $off = ($j * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $x[$j * $dsub + $d] - $cbRef[$off + $d];
         |      $dist += $diff * $diff;
         |    }
         |    $lut[$j * $ksub + $c] = $dist;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut);
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_lut"
  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
}

/** ADC distance: Σ_j lut[j·ksub + code_j] with code_j unpacked from
  * the candidate's packed-long codes — the per-candidate hot loop of a
  * PQ scan, m shifts + m lookups + m adds per pair, no allocation.
  * left = the query's LUT, right = the candidate's packed codes. */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression {

  require(m >= 1 && ksub >= 1, s"m/ksub must be >= 1, got $m/$ksub")
  private val bits = PqCodec.codeBits(ksub)
  // same packing bound PqEncode enforces — without it a mis-sized
  // (m, ksub) pair would wrap shifts mod 64 and read garbage LUT slots
  require(m * bits <= 64,
    s"pq_adc: $m subspaces x $bits bits/code exceed one 64-bit word")
  private val mask = if (bits == 0) 0L else (1L << bits) - 1L

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<double>, bigint), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val packed = b.asInstanceOf[Long]
    // UnsafeArrayData does no bounds check — a LUT built under different
    // (m, ksub) would silently yield garbage distances, not an error
    if (lut.numElements() != m * ksub)
      throw new IllegalArgumentException(
        s"pq_adc: LUT has ${lut.numElements()} entries, expected m*ksub = ${m * ksub}")
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * ksub + ((packed >>> (j * bits)) & mask).toInt)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sum = ctx.freshName("adcSum")
      val j = ctx.freshName("adcJ")
      s"""
         |if ($a.numElements() != ${m * ksub}) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: LUT has " + $a.numElements() + " entries, expected m*ksub = ${m * ksub}");
         |}
         |double $sum = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $sum += $a.getDouble($j * $ksub + (int) (($b >>> ($j * $bits)) & ${mask}L));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** Symmetric-distance (SDC) PQ: Σ_j T[(j·ksub + a_j)·ksub + b_j], both
  * operands' sub-codes unpacked from their packed longs and T the flat
  * m·ksub² codeword-pair table ‖c_ja − c_jb‖² — shipped ONCE per task
  * through the references array (ctx.addReferenceObj), not embedded as
  * a per-use literal. The pair-scan hot loop of
  * [[graft.ops.Similarity.ivfPqNearDupPairs]]: 2m shifts + m loads +
  * m adds per candidate, no allocation, no ArrayData indirection
  * (measured 17× faster than the equivalent element_at chain at 200k
  * vectors — BASELINE.md §G6). */
case class PqSdc(left: Expression, right: Expression,
                 table: Seq[Double], m: Int, ksub: Int)
  extends BinaryExpression {

  require(m >= 1 && ksub >= 1, s"m/ksub must be >= 1, got $m/$ksub")
  private val bits = PqCodec.codeBits(ksub)
  require(m * bits <= 64,
    s"pq_sdc: $m subspaces x $bits bits/code exceed one 64-bit word")
  require(table.length == m * ksub * ksub,
    s"pq_sdc: table has ${table.length} entries, expected m*ksub^2 = ${m * ksub * ksub}")
  private val mask = if (bits == 0) 0L else (1L << bits) - 1L
  @transient private lazy val tbl: Array[Double] = table.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_sdc requires (bigint, bigint), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val pa = a.asInstanceOf[Long]
    val pb = b.asInstanceOf[Long]
    var s = 0.0
    var j = 0
    while (j < m) {
      val ca = ((pa >>> (j * bits)) & mask).toInt
      val cb = ((pb >>> (j * bits)) & mask).toInt
      s += tbl((j * ksub + ca) * ksub + cb)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local freshName'd — non-whole-stage projections name the
      // input row 'i', and two instances in one projection must not
      // collide (same convention as PqCodec.normalizeGen)
      val t = ctx.addReferenceObj("sdcTable", tbl, "double[]")
      val sum = ctx.freshName("sdcSum")
      val j = ctx.freshName("sdcJ")
      s"""
         |double $sum = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $sum += $t[($j * $ksub + (int) (($a >>> ($j * $bits)) & ${mask}L)) * $ksub
         |             + (int) (($b >>> ($j * $bits)) & ${mask}L)];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override def prettyName: String = "pq_sdc"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqSdc =
    copy(left = l, right = r)
}
