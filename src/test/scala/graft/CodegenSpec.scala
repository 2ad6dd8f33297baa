package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The generated-code contract the custom vector expressions rely on:
  * in a NON-whole-stage projection (the mode any CodegenFallback
  * sibling forces) the input row parameter is literally named `i`, so
  * a bare `for (int i ...)` local is a Janino compile-time
  * redefinition — which Spark's higher layers mask by silently
  * dropping to interpreted eval, defeating the codegen the expression
  * exists for. Generating the projection DIRECTLY (no fallback at
  * this API layer) turns that silent degradation into a test failure.
  * Two instances of each expression share one projection, so
  * cross-instance local collisions fail too.
  */
class CodegenSpec extends AnyFunSuite {

  private val dims = 8
  private val vecType = ArrayType(DoubleType, containsNull = false)
  private val cents = Seq.tabulate(7)(c => Seq.tabulate(dims)(d => math.sin(c * dims + d + 1.0)))
  // m=2 subspaces x ksub=4 codewords x dsub=4
  private val cbs = Seq.tabulate(2)(j =>
    Seq.tabulate(4)(c => Seq.tabulate(4)(d => math.cos(j * 16 + c * 4 + d + 1.0))))

  private val vec = BoundReference(0, vecType, nullable = true)
  private val lut = BoundReference(1, vecType, nullable = true)
  private val codes = BoundReference(2, LongType, nullable = true)

  private def row(lutLen: Int): InternalRow = new GenericInternalRow(Array[Any](
    ArrayData.toArrayData(Array.tabulate(dims)(i => 0.1 * (i + 1))),
    ArrayData.toArrayData(Array.tabulate(lutLen)(i => 0.01 * i)),
    java.lang.Long.valueOf(0b1110L)))

  test("vector expressions compile in non-whole-stage codegen (input row named `i`)") {
    val exprs = Seq(
      graft.functions.IvfProbe(vec, cents, 2),
      graft.functions.IvfProbeHier(vec, cents, nprobe = 2, superProbe = 2),
      graft.functions.PqEncode(vec, cbs),
      graft.functions.PqLut(vec, cbs),
      graft.functions.PqAdc(lut, codes, m = 2, ksub = 4),
      graft.functions.PqSdc(codes, codes,
        Seq.tabulate(2 * 4 * 4)(i => 0.01 * i), m = 2, ksub = 4),
      graft.functions.VecDot(vec, vec),
      graft.functions.VecRotate(vec,
        Seq.tabulate(dims * dims)(i => math.sin(i + 1.0)), dims),
      graft.functions.LshSigs(vec, dims, bits = 4, tables = 2, seed = 7))
    // throws CompileException (wrapped) on any bare-local collision
    val proj = GenerateUnsafeProjection.generate(exprs ++ exprs)
    val out = proj(row(lutLen = 8))
    // generated and interpreted paths agree, instance pairs agree
    exprs.zipWithIndex.foreach { case (e, idx) =>
      val interp = e.eval(row(lutLen = 8))
      val gen = out.get(idx, e.dataType)
      val genTwin = out.get(idx + exprs.length, e.dataType)
      assert(gen == interp || gen.toString == interp.toString,
        s"${e.prettyName}: codegen $gen != interpreted $interp")
      assert(gen == genTwin || gen.toString == genTwin.toString,
        s"${e.prettyName}: twin instances diverged")
    }
  }

  test("poly_hash compiles in non-whole-stage codegen and matches the pinned semantics") {
    val str = BoundReference(3, StringType, nullable = true)
    def rowOf(s: String): InternalRow = new GenericInternalRow(Array[Any](
      null, null, null, org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    val ph = graft.functions.PolyHash(str)
    val proj = GenerateUnsafeProjection.generate(Seq(ph, ph))
    def both(s: String): Long = {
      val out = proj(rowOf(s))
      val gen = out.getLong(0)
      assert(gen == out.getLong(1), "twin instances diverged")
      assert(gen == ph.eval(rowOf(s)), s"codegen != interpreted for '$s'")
      gen
    }
    // the exact fold the HOF chain and the DuckDB oracles compute
    def ref(s: String): Long =
      if (s.isEmpty) 217L
      else s.codePoints().toArray.foldLeft(7L)((a, c) => (a * 31 + c) % 1000000007L)
    Seq("", "a", "spark table", "漢字 test", "naïve", "🙂🙃").foreach { s =>
      assert(both(s) == ref(s), s"poly_hash('$s') diverged from the pinned fold")
    }
  }

  test("pq_adc rejects a LUT sized for different (m, ksub) instead of reading garbage") {
    val adc = graft.functions.PqAdc(lut, codes, m = 2, ksub = 4)
    // interpreted path
    val exI = intercept[IllegalArgumentException](adc.eval(row(lutLen = 6)))
    assert(exI.getMessage.contains("expected m*ksub = 8"))
    // generated path
    val proj = GenerateUnsafeProjection.generate(Seq(adc))
    val exG = intercept[IllegalArgumentException](proj(row(lutLen = 6)))
    assert(exG.getMessage.contains("expected m*ksub = 8"))
  }
}
