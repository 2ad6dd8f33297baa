package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.sketch.{HdrSketchAgg, HdrSummaryExpr}
import graft.functions.{IvfProbe, LshSigs, VecDot, WordShingles}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment-grade
  * alternative to per-session `graft.functions.ensureRegistered`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo("graft", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("hdr_sketch"), info("hdr_sketch"),
      (exprs: Seq[Expression]) => HdrSketchAgg(exprs.head, fromSketches = false).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("hdr_merge"), info("hdr_merge"),
      (exprs: Seq[Expression]) => HdrSketchAgg(exprs.head, fromSketches = true).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("hdr_summary"), info("hdr_summary"),
      (exprs: Seq[Expression]) => HdrSummaryExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("word_shingles"), info("word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("lsh_sigs"), info("lsh_sigs"),
      (exprs: Seq[Expression]) => LshSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue(),
        exprs(4).eval().asInstanceOf[Number].intValue())))
    // SQL TABLE functions over the pipeline entry points (curate,
    // dedup, quality, ANN serve) — the non-Scala access path; see
    // GraftTableFunctions for the surface and semantics
    GraftTableFunctions.inject(ext)
    // raw→tier aggregate rewrite (SURVEY §4 polish): routes hand-written
    // hdr_merge re-bucketing aggregates onto materialized cascade tiers;
    // OFF until spark.graft.tiers.autoRoute names a TierStore base dir
    ext.injectOptimizerRule(session => new graft.plans.RawToTierRule(session))
    ext.injectFunction((FunctionIdentifier("ivf_probe"), info("ivf_probe"),
      (exprs: Seq[Expression]) => IvfProbe(exprs.head,
        {
          val arr = exprs(1).eval()
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until arr.numElements()).map { i =>
            val row = arr.getArray(i)
            (0 until row.numElements()).map(row.getDouble).toSeq
          }.toSeq
        },
        exprs(2).eval().asInstanceOf[Number].intValue())))
  }
}
