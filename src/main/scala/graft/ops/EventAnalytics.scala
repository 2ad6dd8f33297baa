package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators: ordered conversion funnels and
  * weekly retention cohorts — the two questions every product/events
  * table gets asked first. Both reduce the event log to a small
  * per-user frame as early as the semantics allow (funnel: one
  * user-keyed exchange serves every window step; cohorts: map-side
  * distinct before any wide exchange), so the expensive shuffles move
  * users, not events.
  */
object EventAnalytics {

  /** Ordered conversion funnel over an event log.
    *
    * A user "reaches" step i when an event of type `steps(i)` exists
    * STRICTLY AFTER the time they reached step i−1 (min-ts cascade:
    * the reach time of step i is the earliest qualifying event). This
    * is the standard ordered-funnel semantic — a purchase before the
    * first view does not count as a conversion.
    *
    * Output: one row per step — (step "<i>_<name>", n_users) — users
    * whose cascade reached that step, ordered by step.
    *
    * `withinMs` bounds each transition: step i must land within
    * `withinMs` of the step-(i−1) reach time (on an epoch-ms `tsCol`)
    * — the conversion-window form dashboards ask for ("purchased
    * within 2 h of the click"). The cascade stays greedy-earliest
    * (each reach time is the FIRST qualifying event given the
    * previous reach) — the standard first-occurrence dashboard
    * semantic, deterministic and oracle-replayable; it does not
    * search alternative later chains.
    *
    * Plan shape: one shuffle on `userCol`; the per-step reach times are
    * stacked Window mins over the same partitioning (no extra
    * exchange), followed by a per-user collapse and one global
    * aggregate whose output is `steps.size` rows via `stack`.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts", withinMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinMs.forall(_ > 0), s"withinMs must be positive, got $withinMs")
    val w = Window.partitionBy(userCol)
    // Only events of the funnel's own step types can qualify at any
    // step — filter them out BEFORE the user-keyed exchange (pushed to
    // the scan), so the shuffle carries funnel events, not the log.
    val relevant = events
      .select(col(userCol), col(typeCol), col(tsCol))
      .where(col(typeCol).isin(steps: _*))
    val withReach = steps.zipWithIndex.foldLeft(relevant) {
      case (df, (step, i)) =>
        val after =
          if (i == 0) lit(true)
          else withinMs match {
            case None => col(tsCol) > col(s"__t${i - 1}")
            case Some(ms) => col(tsCol) > col(s"__t${i - 1}") &&
              col(tsCol) <= col(s"__t${i - 1}") + lit(ms)
          }
        val qualifies = col(typeCol) === step && after
        df.withColumn(s"__t$i", min(when(qualifies, col(tsCol))).over(w))
    }
    // All rows of a user carry identical __t values; collapse to one
    // row per user (same key as the window exchange — no new shuffle),
    // then count non-null reach times in a single 1-row aggregate and
    // unpivot it with stack so the result is steps.size tiny rows.
    val perUser = withReach.groupBy(col(userCol))
      .agg(first(col("__t0")).as("__t0"),
        steps.indices.drop(1).map(i => first(col(s"__t$i")).as(s"__t$i")): _*)
    val counted = perUser.agg(
      count(col("__t0")).as("__c0"),
      steps.indices.drop(1).map(i => count(col(s"__t$i")).as(s"__c$i")): _*)
    // step labels: zero-padded index so 10+ steps still sort in funnel
    // order (width 1 for <= 9 steps keeps the classic '1_view' labels);
    // names are data-defined strings — escape them, they land in SQL
    val width = steps.size.toString.length
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) =>
        val label = s"%0${width}d_%s".format(i + 1, s).replace("\\", "\\\\").replace("'", "\\'")
        s"'$label', __c$i"
      }
      .mkString(", ")
    counted
      .selectExpr(s"stack(${steps.size}, $stackArgs) as (step, n_users)")
      .orderBy("step")
  }

  /** Rolling-window rate anomalies: bucket events per (`keyCol`,
    * `bucketMs`), then flag buckets whose count exceeds
    * mean + `sigmas`·stddev of the TRAILING `lookback` buckets
    * (current excluded — the baseline must not contain the anomaly).
    * Buckets with fewer than `minPeriods` trailing observations emit
    * unflagged (cold start).
    *
    * Numerics: the window carries exact integer sums (Σn, Σn²) and
    * derives mean/variance with one fixed float expression —
    * reproducible on any engine, unlike builtin stddev aggregates
    * whose internal accumulation differs engine-to-engine in the last
    * ulp. Variance is clamped at 0 before the sqrt (catastrophic-
    * cancellation guard).
    *
    * Plan shape: one partial-aggregated shuffle to (key, bucket)
    * counts — events reduce map-side — then a window over the small
    * per-key bucket series. Output: (key, bucket_ms, n, mean, std,
    * is_anomaly) ordered by (key, bucket).
    */
  def rateAnomalies(events: DataFrame, keyCol: String = "event_type",
                    tsMsCol: String = "ts_ms", bucketMs: Long = 3600000L,
                    lookback: Int = 24, minPeriods: Int = 12,
                    sigmas: Double = 2.0): DataFrame = {
    // the sample-variance denominator is (c - 1): with minPeriods = 1 a
    // single-observation baseline divides 0/0 into a NaN std and every
    // such bucket silently judges non-anomalous
    require(minPeriods >= 2, s"minPeriods must be >= 2, got $minPeriods")
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val counts = events
      .select(col(keyCol).as("key"),
        (expr(s"CAST($tsMsCol AS BIGINT) DIV $bucketMs") * bucketMs).as("bucket_ms"))
      .groupBy("key", "bucket_ms")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("key").orderBy("bucket_ms")
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("__s", sum(col("n")).over(w))
      .withColumn("__ss", sum(col("n") * col("n")).over(w))
      .withColumn("__c", count(col("n")).over(w))
      .withColumn("mean",
        when(col("__c") >= minPeriods,
          round(col("__s").cast("double") / col("__c").cast("double"), 4)))
      .withColumn("std",
        when(col("__c") >= minPeriods, round(sqrt(greatest(lit(0.0),
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") / col("__c").cast("double")) /
            (col("__c").cast("double") - 1.0))), 4)))
      .withColumn("is_anomaly",
        col("__c") >= minPeriods &&
          col("n").cast("double") > col("mean") + lit(sigmas) * col("std"))
      .select(col("key"), col("bucket_ms"), col("n"), col("mean"), col("std"),
        col("is_anomaly"))
      .orderBy("key", "bucket_ms")
  }

  /** Rolling active users: per calendar day, the exact count of
    * distinct users active that day (DAU) and in the trailing
    * `windowDays`-day window ending that day (WAU for 7), plus the
    * stickiness ratio DAU/WAU — the product-analytics headline series.
    *
    * Exact, not approximate: the event log is reduced to distinct
    * (user, day) pairs FIRST (map-side partial dedup — at 100 TB the
    * events never cross the network), and the rolling distinct is an
    * explode of that small frame over the `windowDays` target days each
    * pair serves, deduped again. Shuffled volume is bounded by
    * |users| × |active days| × windowDays rows of two longs, not by
    * events. Only days with at least one event emit a row.
    */
  def activeUsers(events: DataFrame, windowDays: Int = 7,
                  userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val userDays = events
      .where(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
      .sharedCheckpoint(eager = true) // feeds dau AND the window explode
    val dau = userDays.groupBy("__d").agg(count(lit(1)).as("dau"))
    val windowed = userDays
      .select(col("__u"),
        explode(transform(sequence(lit(0), lit(windowDays - 1)),
          o => date_add(col("__d"), o))).as("__td"))
      .distinct()
      .groupBy("__td").agg(count(lit(1)).as("wau"))
    dau.join(windowed, dau("__d") === windowed("__td"))
      .select(date_format(col("__d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 4)
          .as("stickiness"))
      .orderBy("day")
  }

  /** Weekly retention cohorts: users grouped by the ISO week (Monday-
    * truncated) of their first event; for each cohort and each later
    * week, how many of its users were active.
    *
    * Output: (cohort_week 'yyyy-MM-dd', week_offset INT, n_users)
    * ordered by (cohort_week, week_offset). week_offset 0 is the
    * cohort week itself, so its n_users is the cohort size. The week
    * is emitted as an ISO date string — the one temporal encoding
    * every engine and dataframe runtime agrees on byte-for-byte.
    *
    * Plan shape: project each event to its (user, Monday) week — a
    * cheap codegen'd date_trunc — and distinct FIRST, with map-side
    * partial aggregation, so raw events are reduced to user-week pairs
    * before anything is shuffled. The window min and the final
    * (cohort_week, offset) aggregate then only ever move that small
    * frame (|users| × |weeks| rows at most) — at 100 TB of events the
    * event rows themselves never cross the network beyond the partial-
    * agg shuffle.
    */
  def retentionCohorts(events: DataFrame,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val weeks = events
      // NULL users would survive the distinct and emit a zero-count
      // cohort row (count of a null column) — drop them like every
      // other user-keyed operator here
      .where(col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
        to_date(date_trunc("week", col(tsCol))).as("__wk"))
      .distinct()
    val w = Window.partitionBy("__u")
    weeks
      .withColumn("__cw", min(col("__wk")).over(w))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__wk"), col("__cw")) / 7).cast("int").as("week_offset"),
        col("__u"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(col("__u")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Multi-level daily activity rollup: (event_type, day), per-type
    * subtotals, and the grand total in ONE pass via `ROLLUP` — Spark
    * expands the grouping sets inside a single aggregate (one shuffle,
    * map-side partials at every level) instead of the 3-scan UNION a
    * dashboard would otherwise run. Days are exact integer epoch-days
    * (ts_ms div 86400000 — no timezone, no calendar lib); subtotal
    * rows surface as 'ALL' / -1 through `grouping()` rather than SQL
    * NULLs, so downstream consumers (and the oracle's hash compare)
    * never depend on engine null-ordering.
    *
    * `n_users` is an exact COUNT(DISTINCT) — Spark plans the standard
    * two-phase expand-distinct; corpora that prefer sketches use the
    * HLL path (see the hll_users surface) on the same grouping sets. */
  /** Gap-based session assignment: a user's events split into sessions
    * wherever the gap to the previous event exceeds `gapMs` (classic
    * 30-min web sessionization). Returns the input columns plus a
    * per-user `session` ordinal (1-based). ALL event types participate
    * in the gap structure — a session is defined by activity, not by
    * any particular funnel's steps. One user-keyed exchange; both
    * windows (lag + running sum) ride the same partitioning. */
  def sessionIds(events: DataFrame, gapMs: Long = 1800000L,
                 userCol: String = "user_id", tsCol: String = "ts",
                 tieCol: String = "event_id"): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(byUser))
      .withColumn("session",
        sum(when(col("__gap").isNull || col("__gap") > gapMs, 1L).otherwise(0L))
          .over(byUser))
      .drop("__gap")
  }

  /** Sessionized conversion funnel: [[funnel]] with the SESSION as the
    * unit of conversion — "did the visit convert", the form a web
    * dashboard reports (a purchase in next week's visit does not count
    * for this visit's funnel). Sessions come from [[sessionIds]] over
    * ALL events; the cascade then runs per (user, session) with the
    * same strict min-ts semantics (and optional `withinMs` transition
    * windows). Output: (step, n_sessions).
    *
    * Plan: both sessionization windows and the funnel's cascade
    * partition by the user (the session key only refines it), so the
    * whole composition still rides ONE user-keyed exchange. */
  def sessionFunnel(events: DataFrame, steps: Seq[String], gapMs: Long = 1800000L,
                    userCol: String = "user_id", typeCol: String = "event_type",
                    tsCol: String = "ts", tieCol: String = "event_id",
                    withinMs: Option[Long] = None): DataFrame = {
    val sess = sessionIds(events, gapMs, userCol, tsCol, tieCol)
      .withColumn("__sess_key",
        concat_ws("#", col(userCol), col("session")))
    funnel(sess, steps, userCol = "__sess_key", typeCol = typeCol,
      tsCol = tsCol, withinMs = withinMs)
      .withColumnRenamed("n_users", "n_sessions")
  }

  /** Corpus-level session statistics — the web-analytics topline:
    * session count, bounce rate (single-event sessions, quantized
    * e6), and exact duration percentiles (ms; linear interpolation —
    * Spark `percentile` ≡ DuckDB `quantile_cont`). One pass: the
    * [[sessionIds]] windows, a (user, session) aggregate on the same
    * partitioning, then one global aggregate over the sessions frame.
    * Bounces have duration 0 and ARE included in the percentiles —
    * that is the honest distribution; filter upstream to exclude. */
  def sessionStats(events: DataFrame, gapMs: Long = 1800000L,
                   userCol: String = "user_id", tsCol: String = "ts",
                   tieCol: String = "event_id"): DataFrame =
    sessionIds(events, gapMs, userCol, tsCol, tieCol)
      .groupBy(col(userCol), col("session"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("dur"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"),
        expr("percentile(dur, 0.5)").as("__p50"),
        expr("percentile(dur, 0.9)").as("__p90"),
        max("dur").as("max_duration_ms"),
        sum("n_events").as("n_events_total"))
      .select(col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 1000000 div n_sessions").as("bounce_e6"),
        round(col("__p50"), 4).as("p50_duration_ms"),
        round(col("__p90"), 4).as("p90_duration_ms"),
        col("max_duration_ms"), col("n_events_total"))

  def dailyRollup(events: DataFrame, tsCol: String = "ts_ms",
                  typeCol: String = "event_type",
                  userCol: String = "user_id"): DataFrame =
    dailyGrouping(events, cube = false, tsCol, typeCol, userCol)

  /** [[dailyRollup]]'s CUBE twin: adds the per-day totals ACROSS types
    * (grouping set (day)) that ROLLUP's hierarchy lacks — the "all
    * traffic by day" row a dashboard's topline reads — still in the
    * single grouping-sets aggregate. */
  def dailyCube(events: DataFrame, tsCol: String = "ts_ms",
                typeCol: String = "event_type",
                userCol: String = "user_id"): DataFrame =
    dailyGrouping(events, cube = true, tsCol, typeCol, userCol)

  private def dailyGrouping(events: DataFrame, cube: Boolean, tsCol: String,
                            typeCol: String, userCol: String): DataFrame = {
    val base = events
      .select(col(typeCol).as("__t"),
        expr(s"$tsCol div 86400000").as("__d"), col(userCol).as("__u"))
    val grouped =
      if (cube) base.cube(col("__t"), col("__d"))
      else base.rollup(col("__t"), col("__d"))
    grouped
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__u")).as("n_users"),
        grouping(col("__t")).as("__gt"), grouping(col("__d")).as("__gd"))
      .select(
        when(col("__gt") === 1, lit("ALL")).otherwise(col("__t")).as(typeCol),
        when(col("__gd") === 1, lit(-1L)).otherwise(col("__d")).as("day_idx"),
        col("n_events"), col("n_users"))
  }
}
