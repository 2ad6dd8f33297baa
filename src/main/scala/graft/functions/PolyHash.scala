package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable polynomial string hash (seed 7, ×31, mod 1e9+7
  * over code points) as ONE codegen'd scan expression — replaces the
  * `aggregate(transform(split(s, ''), ascii), …)` higher-order chain,
  * whose per-CHARACTER lambda interpretation made it the dominant cost
  * of every hashed-feature pass (the [[WordShingles]] story again; the
  * DSIR gram explode evaluates this once per gram × corpus).
  *
  * Semantics are pinned to the HOF chain it replaces, which is also
  * what every oracle replays in DuckDB:
  *  - iteration is per CODE POINT (Spark's `split(s, '')` advances by
  *    code point, `ascii` returns `codePointAt(0)`; DuckDB's
  *    `string_split(s, '')` yields characters and `ascii` the code
  *    point) — so supplementary-plane text hashes identically in all
  *    three;
  *  - the EMPTY string hashes to 217, not the seed 7: `split('', '')`
  *    yields `['']` in both engines and `ascii('') = 0`, so the fold
  *    runs once with x = 0. [[hash]] reproduces that quirk explicitly.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Static so generated code calls it without captured state — a pure
    * function call emits no locals, so no freshName discipline needed. */
  def hash(u: UTF8String): Long = {
    val s = u.toString
    if (s.isEmpty) return (7L * 31) % Mod // split('','') = [''], ascii('') = 0
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
