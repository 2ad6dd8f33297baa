package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** IVF coarse-quantizer probe: the `nprobe` centroid ids nearest to the
  * vector by cosine, nearest first (ties break to the lower id).
  * Centroids are unit-normalized at construction, so ranking by raw dot
  * equals ranking by cosine — one fused dot-products-plus-selection
  * loop in generated code. `nprobe = 1` is cell assignment; larger
  * values are the query-side probe list.
  */
case class IvfProbe(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
  extends UnaryExpression {

  private val nlist = centroids.length
  require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe out of [1, $nlist]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_probe requires array<float|double> input, got $other")
    }

  /** Flat nlist × dims matrix of unit-normalized centroids, row-major. */
  @transient lazy val flat: Array[Double] = {
    val dims = centroids.head.length
    val out = new Array[Double](nlist * dims)
    var c = 0
    while (c < nlist) {
      val row = centroids(c)
      val nrm = math.sqrt(row.map(x => x * x).sum) max 1e-12
      var i = 0
      while (i < dims) { out(c * dims + i) = row(i) / nrm; i += 1 }
      c += 1
    }
    out
  }

  private def dims: Int = centroids.head.length

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"ivf_probe: vector has ${v.numElements()} dims, expected $dims")
    val n = dims
    val fl = isFloat
    val dots = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        s += flat(c * dims + i) * xv
        i += 1
      }
      dots(c) = s
      c += 1
    }
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](nlist)
    var k = 0
    while (k < nprobe) {
      // seed with the first unused id so NaN dots (a NaN component in
      // the vector) degrade to index order instead of crashing
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < nlist) {
        if (!used(c) && (best == -1 || dots(c) > bestDot)) { best = c; bestDot = dots(c) }
        c += 1
      }
      used(best) = true
      out(k) = best
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val centRef = ctx.addReferenceObj("centroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      // every local freshName'd — non-whole-stage projections name the
      // input ROW parameter `i`, so a bare loop variable is a Janino
      // compile error that silently drops to interpreted eval (the
      // PqCodec.normalizeGen convention)
      val dots = ctx.freshName("ivfDots")
      val c = ctx.freshName("ivfC")
      val s = ctx.freshName("ivfS")
      val off = ctx.freshName("ivfOff")
      val i = ctx.freshName("ivfI")
      val sel = ctx.freshName("ivfSel")
      val used = ctx.freshName("ivfUsed")
      val k = ctx.freshName("ivfK")
      val best = ctx.freshName("ivfBest")
      val bestDot = ctx.freshName("ivfBestDot")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "ivf_probe: vector has " + $v.numElements() + " dims, expected $dims");
         |}
         |double[] $dots = new double[$nlist];
         |for (int $c = 0; $c < $nlist; $c++) {
         |  double $s = 0.0;
         |  int $off = $c * $dims;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $s += $centRef[$off + $i] * (double) $v.$get($i);
         |  }
         |  $dots[$c] = $s;
         |}
         |int[] $sel = new int[$nprobe];
         |boolean[] $used = new boolean[$nlist];
         |for (int $k = 0; $k < $nprobe; $k++) {
         |  int $best = -1;
         |  double $bestDot = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $nlist; $c++) {
         |    if (!$used[$c] && ($best == -1 || $dots[$c] > $bestDot)) { $best = $c; $bestDot = $dots[$c]; }
         |  }
         |  $used[$best] = true;
         |  $sel[$k] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sel);
       """.stripMargin
    })
  }

  override def prettyName: String = "ivf_probe"
  override protected def withNewChildInternal(c: Expression): IvfProbe = copy(child = c)
}
