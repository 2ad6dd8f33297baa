package graft

import java.nio.file.Files

import graft.planner.{InfluxPlanner, TierSummaryProvider}
import graft.streaming.CurationMetrics

/** The funnel→metrics bridge: curation throughput charts through the
  * SAME InfluxQL surface as ingest metrics. */
class CurationMetricsSpec extends SparkSpec {

  test("funnel record publishes as ~curation.* counters readable via InfluxQL") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cmx").toString
    val funnel = s"$base/funnel"
    val T0 = 1704067200000L // tier-aligned (2024-01-01T00:00Z)
    Seq(
      (0L, "1_total", 6L, T0),
      (0L, "5_decontaminated", 2L, T0),
      (1L, "1_total", 3L, T0 + 300000L),
      (1L, "5_decontaminated", 1L, T0 + 300000L),
      // replayed batch 1 (at-least-once funnel append): must collapse
      // to its first stamp, never double-count
      (1L, "1_total", 3L, T0 + 300500L),
      (1L, "5_decontaminated", 1L, T0 + 300500L))
      .toDF("batch_id", "stage", "n_docs", "ts_ms")
      .write.mode("append").parquet(funnel)
    val store = s"$base/metrics"
    CurationMetrics.publish(spark, funnel, store)

    val planner = new InfluxPlanner(new TierSummaryProvider(spark, store))
    // per-5m throughput of the total gate: batch replay deduped
    val totals = planner.executeLong(spark,
      s"""select count from "~curation.1_total" where time between $T0 """ +
      s"and ${T0 + 599999L} force group by time(5m) order asc")
      .orderBy("time").collect()
    assert(totals.map(_.getAs[String]("series")).distinct.toSeq ==
      Seq("~curation.1_total.count"))
    assert(totals.map(_.getAs[Double]("value")).toSeq == Seq(6.0, 3.0))
    // survivors at the end of the funnel, coarser tier
    val kept = planner.executeLong(spark,
      s"""select count from "~curation.5_decontaminated" where time between $T0 """ +
      s"and ${T0 + 3599999L} force group by time(1h) order asc").collect()
    assert(kept.length == 1 && kept(0).getAs[Double]("value") == 3.0)
    // the catalog lists the bridged series like any other metric
    val listed = planner.executeLong(spark, "list series /curation/")
      .collect().map(_.getAs[String]("value")).sorted.toSeq
    assert(listed == Seq("~curation.1_total", "~curation.5_decontaminated"))

    // re-publish is idempotent (atomic snapshot swap, no accumulation)
    CurationMetrics.publish(spark, funnel, store)
    val again = planner.executeLong(spark,
      s"""select count from "~curation.1_total" where time between $T0 """ +
      s"and ${T0 + 599999L} force group by time(5m) order asc")
      .orderBy("time").collect()
    assert(again.map(_.getAs[Double]("value")).toSeq == Seq(6.0, 3.0))
  }

  test("source card publishes as ~corpus.* counters readable via InfluxQL") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cpx").toString
    val T0 = 1704067200000L
    val docs = Seq(
      (1L, "a", "en", "same text here"), (2L, "a", "en", "same text here"),
      (3L, "b", "fr", "encore des mots differents ici"))
      .toDF("doc_id", "source", "lang", "text")
    val card = graft.ops.Reports.sourceCard(docs)
    val store = s"$base/metrics"
    graft.streaming.CorpusMetrics.publish(spark, card, store, T0)
    val planner = new InfluxPlanner(new TierSummaryProvider(spark, store))
    val dups = planner.executeLong(spark,
      s"""select count from "~corpus.a.dup_rate_e6" where time between $T0 """ +
      s"and ${T0 + 599999L} force group by time(5m) order asc").collect()
    assert(dups.length == 1 && dups(0).getAs[Double]("value") == 500000.0)
    val toks = planner.executeLong(spark,
      s"""select count from "~corpus.b.tokens" where time between $T0 """ +
      s"and ${T0 + 599999L} force group by time(5m) order asc").collect()
    assert(toks.length == 1 && toks(0).getAs[Double]("value") == 5.0)
    val listed = planner.executeLong(spark, "list series /corpus.a/")
      .collect().map(_.getAs[String]("value")).sorted.toSeq
    assert(listed == Seq("~corpus.a.docs", "~corpus.a.dup_rate_e6",
      "~corpus.a.tokens"))
    // re-publish swaps, never accumulates
    graft.streaming.CorpusMetrics.publish(spark, card, store, T0)
    val again = planner.executeLong(spark,
      s"""select count from "~corpus.a.dup_rate_e6" where time between $T0 """ +
      s"and ${T0 + 599999L} force group by time(5m) order asc").collect()
    assert(again.length == 1 && again(0).getAs[Double]("value") == 500000.0)
  }

  test("card source names sanitize to the InfluxQL-addressable charset") {
    import spark.implicits._
    // a raw crawl source full of '.', '/', '"' and regex metacharacters
    // — the first data-driven series-name component on the surface
    val docs = Seq((1L, "web/cc.v2 (2024)\"*\"", "en", "some words here"))
      .toDF("doc_id", "source", "lang", "text")
    val card = graft.ops.Reports.sourceCard(docs)
    val names = graft.streaming.CorpusMetrics.cardMeasurements(card, 0L)
      .select("metric").collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq(
      "~corpus.web_cc_v2__2024____.docs",
      "~corpus.web_cc_v2__2024____.dup_rate_e6",
      "~corpus.web_cc_v2__2024____.tokens"))
    // every emitted name is addressable by a quoted InfluxQL read
    names.foreach(n => assert(n.matches("~corpus\\.[A-Za-z0-9_-]+\\.[a-z0-9_]+"), n))
  }

  test("gateAlerts flag collapsed stages per batch, replay-deduped") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_galert").toString
    val funnel = s"$base/funnel"
    val T0 = 1704067200000L
    Seq(
      // batch 0: healthy ratios (5/6, 4/5)
      (0L, "1_total", 6L, T0), (0L, "2_quality", 5L, T0), (0L, "3_exact", 4L, T0),
      // batch 1: the quality gate collapses to 1/50
      (1L, "1_total", 50L, T0 + 1000L), (1L, "2_quality", 1L, T0 + 1000L),
      // replayed append of batch 1 with a LYING second stamp — first wins
      (1L, "2_quality", 50L, T0 + 2000L),
      // batch 2: empty input, nothing to lose -> no alert
      (2L, "1_total", 0L, T0 + 3000L), (2L, "2_quality", 0L, T0 + 3000L))
      .toDF("batch_id", "stage", "n_docs", "ts_ms")
      .write.mode("append").parquet(funnel)
    val rows = CurationMetrics.gateAlerts(spark, funnel, minRatioE6 = 100000L)
      .orderBy("batch_id", "stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getBoolean(5)))
      .toSeq
    assert(rows == Seq(
      (0L, "2_quality", 833333L, false), (0L, "3_exact", 800000L, false),
      (1L, "2_quality", 20000L, true),
      (2L, "2_quality", 1000000L, false)))
  }

  test("CurationJob: one invocation writes sharded corpus + funnel + queryable metrics") {
    val out = Files.createTempDirectory("graft_cjob").toString
    graft.ops.CurationJob.run(spark, sf, out)
    // sharded corpus layout, and its size equals the funnel's last stage
    val corpus = spark.read.parquet(s"$out/corpus")
    val funnel = spark.read.parquet(s"$out/funnel")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(corpus.count() == funnel("5_decontaminated"))
    assert(corpus.select("shard").distinct().count() > 1L)
    // the job's gate counts chart through the same Influx surface
    val planner = new InfluxPlanner(new TierSummaryProvider(spark, s"$out/metrics"))
    val now = System.currentTimeMillis()
    val total = planner.executeLong(spark,
      s"""select count from "~curation.1_total" where time between """ +
      s"${now - 3600000L} and ${now + 3600000L} force group by time(1h) order asc")
      .collect().map(_.getAs[Double]("value")).sum
    assert(total == funnel("1_total").toDouble)
    // release-health card published alongside: per-source doc counts of
    // the CURATED corpus sum to the final funnel stage
    val cp = new InfluxPlanner(new TierSummaryProvider(spark, s"$out/corpus_metrics"))
    val cardSeries = cp.executeLong(spark, "list series /corpus/")
      .collect().map(_.getAs[String]("value"))
    assert(cardSeries.exists(_.endsWith(".docs")))
    val docTotal = cardSeries.filter(_.endsWith(".docs")).map { s =>
      cp.executeLong(spark,
        s"""select count from "$s" where time between """ +
        s"${now - 3600000L} and ${now + 3600000L} force group by time(1h) order asc")
        .collect().map(_.getAs[Double]("value")).sum
    }.sum
    assert(docTotal == funnel("5_decontaminated").toDouble)
  }

  test("a running StreamingCuration auto-publishes chartable ~curation.* counters") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cmx_live").toString
    val in = s"$base/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val store = s"$base/metrics"
    val benchmark = Seq((900L, "eval question alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sc = new graft.streaming.StreamingCuration(spark, base, benchmark,
      metricsStoreDir = Some(store))
    val q = sc.start(sc.readJsonDocs(in),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
    try {
      val rows = Seq(
        """{"doc_id":1,"text":"the cat sat on the mat today"}""",
        """{"doc_id":2,"text":"THE CAT  SAT ON THE MAT TODAY"}""",
        """{"doc_id":3,"text":"a completely different clean document here"}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b1.json"),
        rows.mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()
    // the store exists WITHOUT any manual publish call; the full-range
    // grand total over the raw tier carries this batch's gate counts
    val planner = new InfluxPlanner(new TierSummaryProvider(spark, store))
    val series = planner.executeLong(spark, "list series /curation/")
      .collect().map(_.getAs[String]("value")).toSet
    assert(series.contains("~curation.1_total") &&
      series.contains("~curation.5_decontaminated"))
    val now = System.currentTimeMillis()
    val total = planner.executeLong(spark,
      s"""select count from "~curation.1_total" where time between """ +
      s"${now - 3600000L} and ${now + 3600000L} force group by time(1h) order asc")
      .collect().map(_.getAs[Double]("value")).sum
    assert(total == 3.0, s"expected the batch's 3 total docs, got $total")
  }
}
