package graft.tools
import graft.{GraftSession, Tables}
import graft.rollup.Rollup
import graft.sources.TierStore
import org.apache.spark.sql.functions._
object ProfileRollupJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).appName("profile-rollup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val outDir = "target/tiers_profile"
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    rm(new java.io.File(outDir))
    val store = new TierStore(spark, outDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val meas = Rollup.eventsAsMeasurements(Tables.events(spark, sfDir))
    println("events rows: " + Tables.events(spark, sfDir).count())
    val raw = Rollup.rawHistogramTier(meas)
    t("raw5s write")(store.append("hist", Rollup.RawGroupMs, raw))
    println("raw rows: " + store.readAll("hist", 5000L).count())
    var prev: org.apache.spark.sql.DataFrame = raw
    Seq(30000L, 60000L, 300000L, 600000L, 1800000L, 3600000L).foreach { d =>
      val source = if (d == 30000L) prev else store.readAll("hist", prevD(d))
      t(s"hist $d write")(store.append("hist", d, Rollup.histogramTierUp(source, d)))
      t(s"summary $d write")(store.append("hist_summary", d,
        Rollup.histogramSummaries(store.readAll("hist", d))))
    }
    val counts = Tables.events(spark, sfDir).selectExpr(
      "event_type || '_count' AS metric", "ts_ms", "CAST(1 AS BIGINT) AS value")
    val cr = Rollup.counterTier(counts, 5000L)
    t("counter5s write")(store.append("counter", 5000L, cr))
    Seq(30000L, 60000L, 300000L, 600000L, 1800000L, 3600000L).foreach { d =>
      val source = if (d == 30000L) cr else store.readAll("counter", prevD(d))
      t(s"counter $d write")(store.append("counter", d, Rollup.counterTierUp(source, d)))
    }
    spark.stop()
  }
  def prevD(d: Long): Long = {
    val s = Seq(30000L, 60000L, 300000L, 600000L, 1800000L, 3600000L)
    val i = s.indexOf(d); if (i <= 0) 5000L else s(i-1)
  }
}
