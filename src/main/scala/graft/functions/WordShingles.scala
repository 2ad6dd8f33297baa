package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of normalized text (lowercase, whitespace
  * tokens) in one pass — replaces a regexp_replace → split → transform →
  * slice → concat_ws higher-order chain whose per-row lambda
  * interpretation dominated the dedup pipeline. Semantics match the
  * oracle SQL: tokens = non-empty whitespace splits of lower(trim(text));
  * < k tokens → one shingle of all tokens joined.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[UTF8String]
    if (toks.length < k) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder(k * 12)
      var i = 0
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
