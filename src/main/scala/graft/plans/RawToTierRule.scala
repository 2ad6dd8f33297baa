package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

import graft.sketch.HdrSketchAgg

/** The SURVEY §4 "optional future polish" Catalyst rule, made real:
  * rewrite a histogram-merge AGGREGATE over a finer tier to a READ of
  * the materialized coarser tier when the cascade already holds it.
  *
  * The reference answers `group by time(1h)` from its 1h summary store
  * rather than re-merging raw buckets (its planner routes by
  * resolution — InfluxQueryParser + the per-resolution SummaryStore
  * reads); this engine's [[graft.planner.InfluxPlanner]] does the same
  * routing ABOVE Catalyst for its own query language. The rule extends
  * that routing to everyone else: an ad-hoc DataFrame/SQL user who
  * writes the re-bucketing aggregate themselves —
  *
  * {{{
  *   spark.read.parquet(s"$base/tier_raw")        // or tier_<finer>
  *     .groupBy(col("metric"),
  *       (col("bucket_start") - pmod(col("bucket_start"), lit(3600000L)))
  *         .cast("long").as("bucket_start"))
  *     .agg(hdr_merge(col("sketch")).as("sketch"))
  * }}}
  *
  * — gets the plan a tier-aware engine would pick: a partition-pruned
  * scan of `tier_3600000` (one row per metric-hour) instead of merging
  * 720× the rows. Sketch merge is associative and the cascade
  * materializes exactly this aggregate ([[graft.rollup.Rollup
  * .histogramTierUp]]), so the rewrite is result-identical whenever
  * the target tier is CURRENT for the source's closed buckets.
  *
  * OPT-IN: set `spark.graft.tiers.autoRoute` to the [[graft.sources
  * .TierStore]] base dir. Freshness is the caller's trade (the same
  * one the reference makes): the cascade rolls closed buckets behind a
  * cursor, so between cascade runs the raw tier can hold buckets the
  * target tier does not — a deployment that runs the cascade on its
  * tick (the reference's shape) serves identical results, a caller
  * mid-ingest must not enable the route.
  *
  * COUNTER tiers route the same way (`counter_tier_raw`/`counter_tier_<f>`
  * with `sum(count)` — integer addition is associative exactly like
  * sketch merge, and the counter cascade materializes that aggregate).
  *
  * Match conditions (all must hold, otherwise the plan is untouched):
  *  - single-path parquet source under the configured base dir:
  *    `tier_raw`/`tier_<f>` (histogram) or `counter_tier_raw`/
  *    `counter_tier_<f>` (counter), f dividing the target duration;
  *  - grouping = (metric, bucketOf(bucket_start, L)) — the
  *    `ts − pmod(ts, L)` shape [[graft.rollup.Rollup.bucketOf]] emits,
  *    cast-tolerant;
  *  - the one aggregate is `hdr_merge(sketch)` / `sum(count)` for the
  *    matching kind (no DISTINCT/FILTER);
  *  - the target tier dir `<kind>_<L>` exists;
  *  - any Filter between aggregate and scan splits into conjuncts the
  *    tier can answer: predicates on `metric` alone, or
  *    `bucket_start >= c` / `bucket_start < c` with c a multiple of L
  *    (alignment makes filter-then-merge ≡ merge-then-filter; an
  *    unaligned or unrecognized predicate vetoes the rewrite).
  *
  * Output attributes keep the aggregate's names, exprIds, and order,
  * so the rewritten subtree drops in under any parent plan.
  */
class RawToTierRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import RawToTierRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(ConfKey) match {
      case None => plan
      case Some(base) =>
        plan.transformUp {
          // base is normalized the same way as the relation's rootPath
          // (scheme-tolerant), so file:/, bare-local, and remote
          // (hdfs://, s3a://) bases all match their scans
          case agg: Aggregate => rewrite(agg, normalize(base)).getOrElse(agg)
        }
    }

  private def rewrite(agg: Aggregate, base: String): Option[LogicalPlan] = {
    // --- source: a single-rootPath parquet relation under `base`,
    // optionally beneath Projects and one Filter. Projects may carry
    // ALIASES (the optimizer's PullOutGroupingExpressions hoists the
    // bucket expression into `_groupingexpression AS ...` below the
    // Aggregate) — `subst` maps those alias attributes back to their
    // defining expressions so matching sees the original shape.
    val (src, residual, subst) = unwrap(agg.child)
    def resolve(e: Expression): Expression = e.transform {
      case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
    }
    val rel = src match { case lr: LogicalRelation => lr; case _ => return None }
    val path = rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.toSeq match {
        case Seq(single) => normalize(single.toString)
        case _ => return None
      }
      case _ => return None
    }
    // histogram tiers merge sketches; counter tiers add counts — the
    // same associativity argument, so both kinds route (the reference
    // keeps per-resolution summary stores for both bucket types)
    val (kind, valueName, sourceDur) = path match {
      case p if p == s"$base/tier_raw" => ("tier", "sketch", RawMs)
      case p if p == s"$base/counter_tier_raw" => ("counter_tier", "count", RawMs)
      case p if p.startsWith(s"$base/counter_tier_") =>
        ("counter_tier", "count",
          p.stripPrefix(s"$base/counter_tier_").toLongOption.getOrElse(return None))
      case p if p.startsWith(s"$base/tier_") =>
        ("tier", "sketch",
          p.stripPrefix(s"$base/tier_").toLongOption.getOrElse(return None))
      case _ => return None
    }
    def attrOf(name: String): Option[AttributeReference] =
      rel.output.collectFirst { case a: AttributeReference if a.name == name => a }
    val (metricAttr, bucketAttr, valueAttr) =
      (attrOf("metric"), attrOf("bucket_start"), attrOf(valueName)) match {
        case (Some(m), Some(b), Some(s)) => (m, b, s)
        case _ => return None
      }

    // --- grouping: exactly (metric, ts − pmod(ts, L)); L a multiple
    // of the source resolution (cascade associativity needs f | L)
    val grouping = agg.groupingExpressions.map(e => resolve(stripAlias(e)))
    if (grouping.size != 2) return None
    if (!grouping.exists(_.semanticEquals(metricAttr))) return None
    val targetDur = grouping.collectFirst(Function.unlift(bucketDuration(_, bucketAttr)))
      .getOrElse(return None)
    if (targetDur <= sourceDur || targetDur % sourceDur != 0) return None

    // --- output: (metric, Alias(bucket), Alias(hdr_merge(sketch))) in
    // any order, nothing else
    var metricOut: Option[NamedExpression] = None
    var bucketOut: Option[Alias] = None
    var sketchOut: Option[Alias] = None
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if a.semanticEquals(metricAttr) =>
        metricOut = Some(a)
      case al @ Alias(e, _) if bucketDuration(resolve(e), bucketAttr).contains(targetDur) =>
        bucketOut = Some(al)
      case al @ Alias(ae: AggregateExpression, _) if !ae.isDistinct &&
          ae.filter.isEmpty && (ae.aggregateFunction match {
            case h: HdrSketchAgg if kind == "tier" =>
              h.fromSketches && resolve(h.child).semanticEquals(valueAttr)
            case sm: Sum if kind == "counter_tier" =>
              resolve(sm.child).semanticEquals(valueAttr)
            case _ => false
          }) =>
        sketchOut = Some(al)
      case _ => return None
    }
    val (mOut, bOut, sOut) = (metricOut, bucketOut, sketchOut) match {
      case (Some(m), Some(b), Some(s)) => (m, b, s)
      case _ => return None
    }

    // --- the target tier must be materialized — probed through the
    // path's own Hadoop FileSystem, not java.io.File (a remote base
    // would otherwise leave the rule silently inert on exactly the
    // deployments the routing targets)
    val tierDir = s"$base/${kind}_$targetDur"
    val exists = scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(tierDir)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(p).isDirectory
    }.getOrElse(false)
    if (!exists) return None

    // --- residual filters: every conjunct must be tier-answerable.
    // Conjuncts are RESOLVED through the Project-alias substitution
    // first (a filter above the pulled-out-grouping Project references
    // alias attributes, not relation columns).
    val conjuncts = residual.flatMap(splitConjuncts).map(resolve)
    if (!conjuncts.forall(answerable(_, metricAttr, bucketAttr, targetDur)))
      return None

    // --- build the tier read; remap (metric, bucket_start) attrs in
    // the carried filter, and re-alias outputs onto the ORIGINAL
    // names/exprIds so the subtree drops in under any parent
    val tierPlan = spark.read.parquet(tierDir).queryExecution.analyzed
    def tierAttr(name: String): Option[AttributeReference] =
      tierPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    val (tm, tb, ts) =
      (tierAttr("metric"), tierAttr("bucket_start"), tierAttr(valueName)) match {
        case (Some(m), Some(b), Some(s)) => (m, b, s)
        case _ => return None
      }
    val remap: Map[ExprId, AttributeReference] =
      Map(metricAttr.exprId -> tm, bucketAttr.exprId -> tb)
    val carried = conjuncts.map(_.transform {
      case a: AttributeReference if remap.contains(a.exprId) => remap(a.exprId)
    })
    val filtered: LogicalPlan =
      if (carried.isEmpty) tierPlan
      else Filter(carried.reduce(And), tierPlan)
    val out = agg.aggregateExpressions.map { ne =>
      val (source, name, id) = ne match {
        case a: AttributeReference if a.semanticEquals(metricAttr) => (tm, mOut.name, a.exprId)
        case al: Alias if al eq bOut => (tb, al.name, al.exprId)
        case al: Alias if al eq sOut => (ts, al.name, al.exprId)
        case _ => return None // unreachable given the matching above
      }
      Alias(source, name)(exprId = id)
    }
    logInfo(s"graft raw→tier rewrite: $path (${sourceDur} ms buckets) " +
      s"aggregate at $targetDur ms → $tierDir")
    Some(Project(out, filtered))
  }

  /** Strip Projects (collecting alias definitions into a substitution
    * map, innermost first) and collect EVERY Filter condition along
    * the way — stacked .where() calls and filter-above-project shapes
    * both route; the caller resolves and screens each conjunct. */
  private def unwrap(p: LogicalPlan)
      : (LogicalPlan, Seq[Expression], Map[ExprId, Expression]) = p match {
    case Project(pl, child)
        if pl.forall(e => e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      val (src, filts, subst) = unwrap(child)
      val withAliases = subst ++ pl.collect { case a: Alias =>
        a.exprId -> a.child.transform {
          case ar: AttributeReference if subst.contains(ar.exprId) => subst(ar.exprId)
        }
      }
      (src, filts, withAliases)
    case Filter(cond, child) =>
      val (src, filts, subst) = unwrap(child)
      (src, filts :+ cond, subst)
    case other => (other, Nil, Map.empty)
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(inner, _) => inner
    case other => other
  }

  /** `ts − pmod(ts, L)` (cast-tolerant) → Some(L). */
  private def bucketDuration(e: Expression, ts: AttributeReference): Option[Long] =
    e match {
      case c: Cast if c.dataType == LongType => bucketDuration(c.child, ts)
      case Subtract(a: AttributeReference, Pmod(b: AttributeReference, lit, _), _)
          if a.exprId == ts.exprId && b.exprId == ts.exprId =>
        literalLong(lit)
      case _ => None
    }

  private def literalLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case c: Cast => literalLong(c.child)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A conjunct the tier answers identically: metric-only predicates
    * (the tier holds the same metric values), or L-aligned half-open
    * bucket ranges (aligned bounds make filter∘merge ≡ merge∘filter). */
  private def answerable(e: Expression, metric: AttributeReference,
                         bucket: AttributeReference, dur: Long): Boolean = e match {
    case GreaterThanOrEqual(a: AttributeReference, lit) if a.exprId == bucket.exprId =>
      literalLong(lit).exists(_ % dur == 0)
    case LessThan(a: AttributeReference, lit) if a.exprId == bucket.exprId =>
      literalLong(lit).exists(_ % dur == 0)
    // the optimizer's inferred null guard: a NULL bucket belongs to no
    // tier bucket on either side, and tier bucket_start is never null
    case IsNotNull(a: AttributeReference) if a.exprId == bucket.exprId => true
    case _ =>
      e.references.nonEmpty && e.references.forall(_.exprId == metric.exprId) &&
        e.deterministic
  }
}

object RawToTierRule {
  /** Session conf holding the TierStore base dir; unset → rule is off. */
  val ConfKey = "spark.graft.tiers.autoRoute"

  /** The raw tier's 5 s pre-aggregation resolution
    * ([[graft.rollup.Rollup.RawGroupMs]]). */
  val RawMs: Long = graft.rollup.Rollup.RawGroupMs

  private def stripTrailingSlash(s: String): String =
    if (s.endsWith("/")) s.dropRight(1) else s

  private[plans] def normalize(p: String): String = {
    val noScheme = if (p.startsWith("file:")) p.stripPrefix("file:") else p
    stripTrailingSlash(noScheme)
  }
}
