package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.ops.{Curation, Dedup, PqIndexStore, Similarity, TextAnalysis}

/** SQL TABLE-function surface over the highest-traffic pipeline
  * entry points — the non-Scala access path the metrics engine always
  * had (its query language + HTTP) and the curation surface lacked: a
  * data engineer on spark-sql / PySpark / JDBC with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or a session
  * bootstrapped by [[ensure]]) drives dedup / curation / ANN serving
  * with nothing but SQL over registered views:
  *
  * {{{
  *   SELECT * FROM graft_dedup_exact('docs')                   -- (keep_id, n_dups)
  *   SELECT * FROM graft_curate('docs', 'bench')               -- curated corpus
  *   SELECT * FROM graft_curation_funnel('docs', 'bench')      -- (stage, n_docs, n_tokens)
  *   SELECT * FROM graft_quality('docs')                       -- per-doc quality scores
  *   SELECT * FROM graft_cosine_topk('emb', 'queries', 5)      -- exact ANN baseline
  *   SELECT * FROM graft_pq_serve_topk('/store', 'emb', 'queries', 5, 16, 1000)
  * }}}
  *
  * Arguments are literals: table/view NAMES (resolved against the
  * calling session's catalog — temp views, global views, and catalog
  * tables all work) plus the op's numeric knobs. The builder runs at
  * ANALYSIS time of the calling query: it composes the op's full
  * DataFrame plan over the named tables and embeds the analyzed plan
  * as the function's output — so Catalyst sees the same plan the Scala
  * API produces, with every pushdown/codegen property intact and zero
  * translation layer.
  *
  * Analysis-time COST caveat (ADVICE r13): ops whose construction
  * materializes shared frames — graft_curate / graft_curation_funnel
  * under the default `spark.graft.curation.eagerStages=true` — execute
  * those Spark jobs DURING analysis of the calling query, not at first
  * execution. EXPLAIN, view re-resolution, or referencing the TVF
  * twice in one query therefore re-runs the pipeline once per
  * analyzed occurrence. For repeated querying of one curation result,
  * materialize it once (CREATE TABLE ... AS SELECT, or cache a view of
  * one TVF call) instead of re-invoking the TVF; the stateless
  * functions (dedup/quality/ANN) build pure plans and have no such
  * cost.
  */
object GraftTableFunctions {

  private def active = SparkSession.active

  private def str(e: Expression, what: String): String = e.eval() match {
    case null => sys.error(s"graft table function: $what must be a string literal")
    case v => v.toString
  }
  private def int(e: Expression, what: String): Int = e.eval() match {
    case n: Number => n.intValue()
    case v => sys.error(s"graft table function: $what must be an int literal, got $v")
  }
  private def table(name: String): DataFrame = active.table(name)
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** name → (arg spec for the usage string, builder). */
  val builders: Seq[(String, String, Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_dedup_exact", "(docsTable[, idCol, textCol])", es => {
      val (id, text) = (es.lift(1).map(str(_, "idCol")).getOrElse("doc_id"),
        es.lift(2).map(str(_, "textCol")).getOrElse("text"))
      plan(Dedup.exact(table(str(es.head, "docsTable")), id, text))
    }),
    ("graft_curate", "(docsTable, benchTable)", es =>
      plan(Curation.curate(table(str(es.head, "docsTable")),
        table(str(es(1), "benchTable"))))),
    ("graft_curation_funnel", "(docsTable, benchTable)", es =>
      plan(Curation.funnel(table(str(es.head, "docsTable")),
        table(str(es(1), "benchTable"))))),
    ("graft_quality", "(docsTable[, idCol, textCol])", es => {
      import org.apache.spark.sql.functions.{col, round}
      val (id, text) = (es.lift(1).map(str(_, "idCol")).getOrElse("doc_id"),
        es.lift(2).map(str(_, "textCol")).getOrElse("text"))
      plan(table(str(es.head, "docsTable")).select(col(id),
        round(TextAnalysis.qualityScore(col(text)), 4).as("quality")))
    }),
    ("graft_cosine_topk", "(corpusTable, queriesTable, k)", es =>
      plan(Similarity.bruteForceTopK(table(str(es.head, "corpusTable")),
        table(str(es(1), "queriesTable")), int(es(2), "k")))),
    ("graft_ivf_topk", "(corpusTable, queriesTable, k, nlist, nprobe)", es =>
      plan(Similarity.ivfTopK(table(str(es.head, "corpusTable")),
        table(str(es(1), "queriesTable")), int(es(2), "k"),
        nlist = int(es(3), "nlist"), nprobe = int(es(4), "nprobe")))),
    ("graft_pq_serve_topk", "(storeDir, corpusTable, queriesTable, k, nprobe, rerank)", es =>
      plan(new PqIndexStore(active, str(es.head, "storeDir"))
        .topK(table(str(es(1), "corpusTable")), table(str(es(2), "queriesTable")),
          int(es(3), "k"), nprobe = int(es(4), "nprobe"),
          rerank = int(es(5), "rerank")))))

  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, usage, b) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, s"$name$usage"), b))
    }

  // weak identity set of sessions (ADVICE r13) — a hashCode-keyed
  // string set risked a collision after session churn silently
  // skipping registration for the new session, and grew unboundedly;
  // see graft.functions.ensureRegistered (same fix)
  private val registered = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Per-session registration (idempotent) for sessions not built with
    * `spark.sql.extensions` — the [[graft.functions.ensureRegistered]]
    * convention applied to the table-function registry. */
  def ensure(spark: SparkSession): Unit = {
    if (registered.add(spark)) {
      val reg = spark.sessionState.tableFunctionRegistry
      builders.foreach { case (name, _, b) =>
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
      }
    }
  }
}
