package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR featurizer fused into one pass: hashed buckets of a token
  * array's unigrams AND word bigrams (`w ++ ngramsAll(w, 2)` →
  * [[PolyHash]] → mod nBuckets), without materializing a single bigram
  * string — `polyHash("a b")` is a sequential fold, so the bigram hash
  * continues the left token's fold through a space (code point 32) and
  * the right token's characters. The explode + transform + concat_ws
  * chain this replaces built and garbage-collected ~2 strings per
  * token per corpus pass; after [[PolyHash]] removed the per-character
  * lambda cost, THIS was the measured remainder of the DSIR hot path.
  *
  * Semantics pinned to the composed column path (and the DuckDB
  * oracles): short arrays collapse — a 1-token array contributes its
  * token twice (unigram + whole-doc "bigram"); an EMPTY array yields
  * NO buckets (the composed path's collapse gram is `''`, which
  * [[graft.ops.Sampling]] filters before hashing). Repetitions kept.
  */
case class GramBuckets(child: Expression, nBuckets: Int)
  extends UnaryExpression with CodegenFallback {

  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gram_buckets"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_buckets expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    // fold each token once; reuse the per-token fold states for both
    // the unigram hash and the bigram continuation
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out = new Array[Int](n + math.max(1, n - 1))
    i = 0
    while (i < n) {
      out(i) = (PolyHash.hash(UTF8String.fromString(toks(i))) % nBuckets).toInt
      i += 1
    }
    if (n < 2) {
      // collapse gram = the whole (single-token) doc joined — its hash
      // is the token's hash; tokens are non-empty so never ''
      out(n) = out(0)
    } else {
      i = 0
      while (i < n - 1) {
        var acc = foldOver(7L, toks(i))
        acc = (acc * 31 + 32) % PolyHash.Mod // the joining space
        acc = foldOver(acc, toks(i + 1))
        out(n + i) = (acc % nBuckets).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  private def foldOver(seed: Long, s: String): Long = {
    var acc = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % PolyHash.Mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}
