package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense matrix–vector product against a plan-literal d×d matrix,
  * row-major — the rotation step of OPQ (Ge et al. 2014, public): an
  * orthogonal R redistributes variance across the m PQ subspaces
  * before encoding, which is where plain PQ loses accuracy on
  * anisotropic embeddings (a subspace spanning only low-variance dims
  * wastes its ksub codewords). Orthogonality preserves inner products,
  * so everything downstream of the rotation — coarse assignment,
  * cosine rerank, recall — sees identical geometry in rotated
  * coordinates; only the subspace PARTITION changes.
  *
  * One tight d² multiply-add loop in whole-stage codegen (the
  * `transform(sequence(...))` higher-order equivalent evaluates
  * lambdas interpretively, d× per element). The matrix ships once per
  * task via the codegen references array, same as [[PqSdc]]'s table.
  */
case class VecRotate(child: Expression, mat: Seq[Double], dims: Int)
  extends UnaryExpression {

  require(dims >= 1 && mat.length == dims * dims,
    s"vec_rotate: matrix has ${mat.length} entries, expected dims^2 = ${dims * dims}")
  @transient private lazy val m: Array[Double] = mat.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_rotate requires array<float|double> input, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    // a wrong-width corpus served/appended through a rotated store must
    // fail, not be silently zero-padded/truncated into wrong geometry
    if (x.numElements() != dims)
      throw new IllegalArgumentException(
        s"vec_rotate: input vector has ${x.numElements()} dims, rotation matrix expects $dims")
    val out = new Array[Double](dims)
    val f = isFloat
    var r = 0
    while (r < dims) {
      var s = 0.0
      var c = 0
      while (c < dims) {
        s += m(r * dims + c) * (if (f) x.getFloat(c).toDouble else x.getDouble(c))
        c += 1
      }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      // every local freshName'd — non-whole-stage projections name the
      // input row 'i' (the PqCodec.normalizeGen convention)
      val mref = ctx.addReferenceObj("rotMat", m, "double[]")
      val out = ctx.freshName("rotOut")
      val r = ctx.freshName("rotR")
      val c = ctx.freshName("rotC")
      val s = ctx.freshName("rotS")
      s"""
         |if ($x.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "vec_rotate: input vector has " + $x.numElements() +
         |    " dims, rotation matrix expects " + $dims);
         |}
         |double[] $out = new double[$dims];
         |for (int $r = 0; $r < $dims; $r++) {
         |  double $s = 0.0;
         |  for (int $c = 0; $c < $dims; $c++) {
         |    $s += $mref[$r * $dims + $c] * (double) $x.$get($c);
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override def prettyName: String = "vec_rotate"
  override protected def withNewChildInternal(c: Expression): VecRotate =
    copy(child = c)
}
