package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** All multi-table random-hyperplane LSH signatures of a vector in one
  * codegen'd pass: `tables` signatures of `bits` bits each, table t's
  * hyperplanes drawn as ±1 entries from `scala.util.Random(seed + t)`
  * (identical planes to building each table separately, so single-table
  * callers compose). The higher-order-function formulation
  * (`aggregate(transform(typedlit(planes), ...))`) evaluates its lambdas
  * interpretively per row per table; this is one tight generated loop
  * over a flat plane matrix — the difference between milliseconds and
  * seconds once `tables × bits` reaches the hundreds that low-threshold
  * exact near-dup detection needs.
  */
case class LshSigs(child: Expression, dims: Int, bits: Int, tables: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_sigs requires array<float|double> input, got $other")
    }

  /** Flat (tables*bits) x dims plane matrix, row-major. */
  @transient lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * bits * dims)
    var o = 0
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(seed + t)
      var i = 0
      while (i < bits * dims) {
        out(o) = if (rnd.nextBoolean()) 1.0 else -1.0
        o += 1
        i += 1
      }
      t += 1
    }
    out
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // fail loudly on a dims mismatch — silently truncating the vector
    // would void every recall bound derived from the plane count
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"lsh_sigs: vector has ${v.numElements()} dims, expected $dims")
    val n = dims
    val fl = isFloat
    val out = new Array[Long](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        var i = 0
        while (i < n) {
          val xv = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          s += planes(off + i) * xv
          i += 1
        }
        off += dims
        sig = sig * 2 + (if (s >= 0) 1L else 0L)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      // every local freshName'd — non-whole-stage projections name the
      // input ROW parameter `i`, so a bare loop variable is a Janino
      // compile error that silently drops to interpreted eval (the
      // PqCodec.normalizeGen convention; pinned by CodegenSpec)
      val sigs = ctx.freshName("lshSigs")
      val off = ctx.freshName("lshOff")
      val t = ctx.freshName("lshT")
      val sig = ctx.freshName("lshSig")
      val b = ctx.freshName("lshB")
      val s = ctx.freshName("lshS")
      val i = ctx.freshName("lshI")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "lsh_sigs: vector has " + $v.numElements() + " dims, expected $dims");
         |}
         |long[] $sigs = new long[$tables];
         |int $off = 0;
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      $s += $planesRef[$off + $i] * (double) $v.$get($i);
         |    }
         |    $off += $dims;
         |    $sig = $sig * 2 + ($s >= 0 ? 1L : 0L);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override def prettyName: String = "lsh_sigs"
  override protected def withNewChildInternal(c: Expression): LshSigs = copy(child = c)
}
