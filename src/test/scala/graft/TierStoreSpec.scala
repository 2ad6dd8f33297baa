package graft

import java.nio.file.Files
import graft.planner.{MetaStore, Metric}
import graft.rollup.Rollup
import graft.sources.TierStore
import org.apache.spark.sql.functions._

class TierStoreSpec extends SparkSpec {

  private val DAY = 86400000L

  test("tier store: date partitioning, pruned slice reads, retention drops") {
    val base = Files.createTempDirectory("graft_tiers").toString
    val store = new TierStore(spark, base)

    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, sf))
    val raw = Rollup.rawHistogramTier(meas)
    store.append("hist", 5000L, raw)

    // partition dirs exist per day
    val dirs = new java.io.File(store.path("hist", 5000L)).listFiles()
      .filter(_.getName.startsWith("bucket_date=")).map(_.getName).sorted
    assert(dirs.length >= 25, s"expected ~30 day partitions, got ${dirs.length}")

    // slice read matches in-memory filter
    val f = 1704067200000L
    val t = f + 2 * DAY - 1
    val got = store.slice("hist", 5000L, f, t).count()
    val want = raw.where(col("bucket_start").between(f, t)).count()
    assert(got == want && got > 0)

    // partition pruning shows up in the physical plan
    val plan = store.slice("hist", 5000L, f, t).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket_date"))

    // retention: keep 5 days from the end of January
    val now = 1706659200000L // 2024-01-31
    val dropped = store.enforceRetention("hist", 5000L, ttlMs = 5 * DAY, nowMs = now)
    assert(dropped.nonEmpty)
    val remaining = new java.io.File(store.path("hist", 5000L)).listFiles()
      .count(_.getName.startsWith("bucket_date="))
    assert(remaining < dirs.length && remaining >= 5)
    // reads still work after drops
    assert(store.slice("hist", 5000L, now - 4 * DAY, now).count() >= 0)
  }

  test("MaterializedTiers.ensure sweeps stale-format tier dirs, keeps current") {
    import graft.planner.MaterializedTiers
    val staleName = "v" + (MaterializedTiers.FormatVersion - 1) + "_spec_stale"
    val stale = new java.io.File(MaterializedTiers.TiersRoot, staleName)
    new java.io.File(stale, "sub").mkdirs()
    Files.write(new java.io.File(stale, "sub/part.parquet").toPath, Array[Byte](1, 2))
    val current = MaterializedTiers.ensure(spark, sf)
    assert(!stale.exists(), "stale-format tier dir survived the sweep")
    assert(new java.io.File(current, "_GRAFT_TIERS_OK").exists())
  }

  test("meta store lifecycle: register, deactivate on empty slice, reactivate") {
    val meta = new MetaStore
    meta.track(Metric("api.latency", "timer"), 1000L)
    meta.track(Metric("jobs", "counter"), 1000L)
    assert(meta.allActiveMetrics.map(_.name) == Seq("api.latency", "jobs"))

    meta.notifyEmptySlice("jobs")
    assert(!meta.isActive("jobs"))
    assert(meta.searchByRegex(".*").map(_.name) == Seq("api.latency"))
    assert(meta.allMetrics.size == 2) // still tracked, just inactive

    meta.track(Metric("jobs", "counter"), 2000L) // data reappears
    assert(meta.isActive("jobs"))
    assert(meta.lastProcessed("jobs").contains(2000L))

    meta.update(Seq("api.latency"), 5000L)
    assert(meta.lastProcessed("api.latency").contains(5000L))
  }
}
