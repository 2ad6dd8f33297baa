package graft

import graft.rollup.Rollup
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {

  private lazy val meas = Rollup.eventsAsMeasurements(Tables.events(spark, sf))

  test("cascade summaries equal direct-from-raw summaries (merge thesis)") {
    val raw = Rollup.rawHistogramTier(meas)
    // via cascade: 5s → 30s → 1m → 5m
    val cascade = Rollup.histogramSummaries(
      Rollup.histogramTierUp(
        Rollup.histogramTierUp(
          Rollup.histogramTierUp(raw, 30000L), 60000L), 300000L))
    // direct: one shot from measurements grouped at 5m
    graft.functions.ensureRegistered(spark)
    val direct = Rollup.histogramSummaries(
      meas.where(col("value") >= 0)
        .groupBy(col("metric"), Rollup.bucketOf(col("ts_ms"), 300000L).as("bucket_start"))
        .agg(graft.functions.hdr_sketch(col("value")).as("sketch")))
    val a = cascade.orderBy("metric", "bucket_start").collect().toSeq
    val b = direct.orderBy("metric", "bucket_start").collect().toSeq
    assert(a == b)
  }

  test("counter cascade equals direct counts") {
    val counts = Tables.events(spark, sf).select(
      col("event_type").as("metric"), col("ts_ms"), lit(1L).as("value"))
    val cascade = Rollup.counterTierUp(
      Rollup.counterTierUp(Rollup.counterTier(counts, 5000L), 30000L), 3600000L)
    val direct = Rollup.counterTier(counts, 3600000L)
    assert(cascade.orderBy("metric", "bucket_start").collect().toSeq ==
           direct.orderBy("metric", "bucket_start").collect().toSeq)
  }

  test("aligned one-exchange cascade is bit-identical to the plain cascade (r15)") {
    // histogram: full standard chain to 1 h
    val plain = Rollup.histogramSummaries(
      Rollup.histogramCascade(Rollup.rawHistogramTier(meas))(3600000L))
      .orderBy("metric", "bucket_start").collect().toSeq
    val aligned = Rollup.histogramSummaries(
      Rollup.histogramCascadeAlignedTop(meas))
      .orderBy("metric", "bucket_start").collect().toSeq
    assert(aligned == plain)
    // ONE real shuffle exchange in the aligned tier plan (the
    // repartition; summaries/orderBy excluded by planning just the
    // tier): the plain chain pays 1 + |tiers|. Counted on the plan TREE
    // (not a string grep, which would also match BroadcastExchange /
    // ReusedExchange and is brittle across AQE formatting).
    val tierPlan = Rollup.histogramCascadeAlignedTop(meas)
      .queryExecution.executedPlan
    // the AQE wrapper is a leaf to collect(); count inside its input plan
    val inner = tierPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val nShuffles = inner.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(nShuffles == 1, inner.toString)
    // counter: 5 s → 30 s → 1 m chain
    val counts = Tables.events(spark, sf).select(
      col("event_type").as("metric"), col("ts_ms"), lit(1L).as("value"))
    val cPlain = Rollup.counterTierUp(
      Rollup.counterTierUp(Rollup.counterTier(counts, 5000L), 30000L), 60000L)
      .orderBy("metric", "bucket_start").collect().toSeq
    val cAligned = Rollup.counterCascadeAlignedTop(counts, Seq(30000L, 60000L))
      .orderBy("metric", "bucket_start").collect().toSeq
    assert(cAligned == cPlain)
    // non-dividing tier durations must be rejected (the carried
    // top-bucket would not be functionally dependent)
    intercept[IllegalArgumentException] {
      Rollup.histogramCascadeAlignedTop(meas, Seq(40000L, 60000L))
    }
  }

  test("bucket alignment floors to duration multiples") {
    val rows = Rollup.rawHistogramTier(meas).select("bucket_start").distinct().collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 5000L == 0))
  }
}
