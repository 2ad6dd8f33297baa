package graft

import graft.ops.{EventAnalytics, RangeJoin, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the event-analytics operators (ordered funnel, retention
  * cohorts) and the TF-IDF / quantile text stats on hand-computed
  * fixtures — edge cases the sf corpora don't guarantee to contain
  * (same-timestamp non-conversion, out-of-order steps, cohort gaps,
  * score ties).
  */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  test("ordered funnel: strict min-ts cascade") {
    val events = Seq(
      // user 1: clean view -> click -> purchase
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      // user 2: click before first view must not count; the click at 4
      // (after view@2) unlocks the purchase at 5
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 5L), (2L, "click", 4L),
      // user 3: purchase before view, no click -> stops at view
      (3L, "purchase", 1L), (3L, "view", 2L),
      // user 4: click at the SAME instant as view is not strictly after
      (4L, "view", 5L), (4L, "click", 5L),
      // user 5: never views -> reaches nothing
      (5L, "click", 1L),
      // noise type is filtered before the shuffle
      (1L, "error", 1L)
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 2L))
  }

  test("bounded funnel: each transition must land inside the conversion window") {
    val W = 100L
    val events = Seq(
      // user 1: full chain, every hop inside the window
      (1L, "view", 10L), (1L, "click", 60L), (1L, "purchase", 160L),
      // user 2: click exactly AT the window edge qualifies (<=); the
      // purchase 1 ms past its window does not
      (2L, "view", 10L), (2L, "click", 110L), (2L, "purchase", 211L),
      // user 3: click outside the view window -> stops at view, and the
      // in-window purchase after that click must NOT count either
      (3L, "view", 10L), (3L, "click", 150L), (3L, "purchase", 200L),
      // user 4: greedy-earliest — the first view anchors the cascade;
      // a later view that WOULD make the click reachable is not used
      (4L, "view", 10L), (4L, "view", 300L), (4L, "click", 350L)
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"),
        withinMs = Some(W))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
    // the unbounded funnel on the same log converts more: the window is
    // the only difference
    val unbounded = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(unbounded("2_click") == 4L && unbounded("3_purchase") == 3L)
  }

  test("session funnel: conversions count per visit, cross-session chains break") {
    val G = 1000L // session gap for the fixture
    val events = Seq(
      // user 1, visit 1: view + click; visit 2 (after the gap): the
      // purchase lands in a NEW session and must not convert visit 1
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L),
      (1L, "purchase", 5000L, 102L),
      // user 2: one visit with the complete chain
      (2L, "view", 10L, 200L), (2L, "click", 20L, 201L), (2L, "purchase", 30L, 202L),
      // user 2, second visit: view only -> a second '1_view' session
      (2L, "view", 9000L, 203L),
      // non-step events still glue sessions together: user 3's error at
      // 500 keeps view(10)..click(900) in ONE session despite the
      // direct gap exceeding G
      (3L, "view", 10L, 300L), (3L, "error", 500L, 301L), (3L, "click", 900L, 302L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.sessionFunnel(events,
        Seq("view", "click", "purchase"), gapMs = G)
      .as[(String, Long)].collect().toSeq
    // sessions reaching view: u1v1, u1v2 has NO view (purchase-only
    // session: does not reach step 1), u2v1, u2v2, u3v1 -> 4
    assert(got == Seq("1_view" -> 4L, "2_click" -> 3L, "3_purchase" -> 1L))
  }

  test("session stats: bounce rate and durations over gap-split visits") {
    val events = Seq(
      // user 1: one 2-event session (dur 50), then a bounce
      (1L, "view", 10L, 1L), (1L, "click", 60L, 2L), (1L, "view", 5000L, 3L),
      // user 2: one 3-event session (dur 200)
      (2L, "view", 10L, 4L), (2L, "click", 110L, 5L), (2L, "purchase", 210L, 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val r = EventAnalytics.sessionStats(events, gapMs = 1000L).collect()(0)
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_bounces") == 1L)
    assert(r.getAs[Long]("bounce_e6") == 333333L)
    // durations {0, 50, 200}: p50 = 50, p90 = 170 (linear interp)
    assert(r.getAs[Double]("p50_duration_ms") == 50.0)
    assert(r.getAs[Double]("p90_duration_ms") == 170.0)
    assert(r.getAs[Long]("max_duration_ms") == 200L)
    assert(r.getAs[Long]("n_events_total") == 6L)
  }

  test("funnel is order-sensitive, not just presence-sensitive") {
    // all three types present but in reverse order: only step 1 counts
    val events = Seq(
      (1L, "purchase", 1L), (1L, "click", 2L), (1L, "view", 3L)
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("1_view" -> 1L, "2_click" -> 0L, "3_purchase" -> 0L))
  }

  test("retention cohorts: Monday-week cohort with offsets and gaps") {
    val events = Seq(
      // user 1: cohort week 2024-01-01; active again week of 01-15 (offset 2)
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-15 09:00:00"),
      // user 2: same cohort (Wednesday of week 1), active offset 1
      (2L, "2024-01-03 00:00:00"), (2L, "2024-01-08 23:00:00"),
      // user 3: later cohort, single week
      (3L, "2024-01-10 12:00:00"),
      // duplicate events inside one week count once
      (1L, "2024-01-02 11:00:00")
    ).toDF("user_id", "ts_s").select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = EventAnalytics.retentionCohorts(events)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("rate anomalies: trailing baseline excludes current bucket, cold start unflagged") {
    // counts per 1 s bucket: 2, 2, 4, 3 — with lookback=3/minPeriods=2,
    // bucket 2000 is the first judged one (baseline [2,2] → mean 2,
    // std 0) and only it is anomalous; bucket 3000's baseline [2,2,4]
    // absorbs the spike (mean 8/3, std √(4/3))
    val ts = Seq(0L, 500L, 1000L, 1100L, 2000L, 2100L, 2200L, 2300L, 3000L, 3100L, 3200L)
    val events = ts.map(t => ("a", t)).toDF("event_type", "ts_ms")
    val got = graft.ops.EventAnalytics.rateAnomalies(events,
      bucketMs = 1000L, lookback = 3, minPeriods = 2, sigmas = 1.0)
      .as[(String, Long, Long, Option[Double], Option[Double], Boolean)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got == Seq(
      ("a", 0L, 2L, None, None, false),
      ("a", 1000L, 2L, None, None, false),
      ("a", 2000L, 4L, Some(2.0), Some(0.0), true),
      ("a", 3000L, 3L, Some(r4(8.0 / 3)), Some(r4(math.sqrt(4.0 / 3))), false)))
  }

  test("rate anomalies: keys are judged independently") {
    // key b has its own (shorter) history — its buckets must never see
    // key a's counts in their baselines
    val a = Seq(0L, 1000L, 2000L, 2100L).map(t => ("a", t))
    val b = Seq(2000L).map(t => ("b", t))
    val got = graft.ops.EventAnalytics.rateAnomalies((a ++ b).toDF("event_type", "ts_ms"),
      bucketMs = 1000L, lookback = 3, minPeriods = 2, sigmas = 1.0)
      .as[(String, Long, Long, Option[Double], Option[Double], Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 1L, None, None, false),
      ("a", 1000L, 1L, None, None, false),
      ("a", 2000L, 2L, Some(1.0), Some(0.0), true),
      ("b", 2000L, 1L, None, None, false)))
  }

  test("active users: exact DAU/WAU with trailing window and stickiness") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
      (2L, "2024-01-01 23:00:00"), (3L, "2024-01-03 12:00:00"),
      // same user same day counts once
      (1L, "2024-01-01 11:00:00")
    ).toDF("user_id", "ts_s").select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = EventAnalytics.activeUsers(events, windowDays = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    // windows (2 days, trailing): 01-01 {u1,u2}; 01-02 {u1,u2}; 01-03 {u1,u3}
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-03", 1L, 2L, 0.5)))
  }

  test("tfidf top-k: corpus-wide terms score 0, rank ties break by token") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry banana cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, k = 2)
      .orderBy("doc_id", "rnk")
      .as[(Long, String, Double, Long)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val ln3 = math.log(3.0)   // idf(apple), df=1
    val ln15 = math.log(1.5)  // idf(cherry), df=2
    assert(got == Seq(
      (1L, "apple", r4(2 * ln3), 1L), (1L, "banana", 0.0, 2L),
      (2L, "cherry", r4(ln15), 1L), (2L, "banana", 0.0, 2L),
      (3L, "cherry", r4(2 * ln15), 1L), (3L, "banana", 0.0, 2L)))
  }

  test("tfidf top-k: no eager job at plan build; corpus count rides the plan") {
    val docs = Seq((1L, "apple banana"), (2L, "banana cherry")).toDF("doc_id", "text")
    val before = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        before.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // plan construction launches the term frame's EAGER checkpoint
      // (the r14 race-class sweep: the frame feeds both the tf join
      // side and the docFreq aggregate, the raced multi-site shape) —
      // under AQE that is up to 2 jobs (exchange materialization +
      // result), and it is mandatory work MOVED earlier, not extra.
      // The guard's target stays what it was: the OLD shape's eager
      // docs.count() — a full-scan job + driver sync ON TOP of the
      // term materialization — which would push the build past the
      // checkpoint's own job budget
      val planned = TextAnalysis.tfidfTopK(docs, k = 1)
      Thread.sleep(300) // let any async job-start events drain
      assert(before.get <= 2, s"plan build launched ${before.get} job(s), expected <= 2")
      assert(planned.count() == 2)
      // a caller-supplied count skips even the in-plan aggregate and
      // changes idf accordingly
      val withN = TextAnalysis.tfidfTopK(docs, k = 1, nDocs = Some(4L))
        .orderBy("doc_id").collect()
      assert(withN.map(_.getDouble(2)).forall(_ > 0.0)) // ln(4/df) > 0 for df <= 2
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("funnel counts are monotone non-increasing on a random event log") {
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "error")
    val events = Seq.fill(2000)(
      (rnd.nextInt(80).toLong, types(rnd.nextInt(types.size)), rnd.nextInt(100000).toLong))
      .toDF("user_id", "event_type", "ts")
    val counts = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().map(_._2).toSeq
    assert(counts.size == 3)
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
  }

  test("retention cohorts drop NULL users instead of emitting zero-count rows") {
    val events = Seq(
      (Some(1L), "2024-01-02 10:00:00"), (Option.empty[Long], "2024-01-02 11:00:00")
    ).toDF("user_id", "ts_s").select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = EventAnalytics.retentionCohorts(events)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", 0, 1L)))
  }

  test("retention: offset-0 cohort sizes sum to the distinct user count") {
    val rnd = new scala.util.Random(7)
    val events = Seq.fill(500)(
      (rnd.nextInt(40).toLong, s"2024-0${1 + rnd.nextInt(3)}-${10 + rnd.nextInt(18)} 12:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = EventAnalytics.retentionCohorts(events)
    val cohortSizes = got.where(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].collect()(0)
    val distinctUsers = events.select("user_id").distinct().count()
    // every user belongs to exactly one cohort and is active in their
    // own first week by construction
    assert(cohortSizes == distinctUsers)
  }

  test("range join: bin rewrite equals brute force, pairs surface exactly once") {
    val rnd = new scala.util.Random(11)
    val points = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("p_id", "p_ts")
    val intervals = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(10000).toLong
      (1000L + i, s, s + rnd.nextInt(900).toLong) // spans 0..900, bins of 256
    }.toDF("i_id", "i_start", "i_end")
    val got = RangeJoin.pointInInterval(points, intervals,
      "p_ts", "i_start", "i_end", binWidth = 256L)
    val gotPairs = got.select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    // exactly-once: no pair may appear twice even when an interval
    // spans several bins
    assert(gotPairs.size == gotPairs.distinct.size)
    val brute = points.crossJoin(intervals)
      .where(col("p_ts") >= col("i_start") && col("p_ts") <= col("i_end"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    assert(gotPairs.sorted == brute.sorted)
    // and the rewrite must not plan a nested loop
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("corpus shards: one file per shard dir, lossless, assignment-stable") {
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    graft.ops.CorpusShards.write(docs, out, nShards = 8)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8)
    // exactly one data file per shard — the property a trainer's
    // data-parallel reader keys off
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // round-tripped shard column equals the assignment function
    val mismatch = back.select(col("doc_id"), col("shard").cast("long").as("got"))
      .join(graft.ops.CorpusShards.assign(docs, 8).select(col("doc_id"), col("shard")), "doc_id")
      .where(col("got") =!= col("shard")).count()
    assert(mismatch == 0)
  }

  test("token quantiles: Spark percentile linear interpolation") {
    val docs = Seq(
      (1L, "a", "en"), (2L, "a b", "en"), (3L, "a b c", "en"), (4L, "a b c d", "en")
    ).toDF("doc_id", "text", "lang")
    val got = graft.queries.PipelineQueries.tokenLenQuantiles0(docs)
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq
    // sorted counts 1,2,3,4: p = v[p*(n-1)] linearly interpolated
    assert(got == Seq(("en", 1.75, 2.5, 3.25, 3.7, 4L)))
  }
}
