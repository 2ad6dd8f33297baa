package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession
import graft.streaming.StreamingIngest
import org.apache.spark.sql.streaming.Trigger

/** Manual demo of the streaming ingest surface: feed MetricBatch JSON
  * files into a watched dir, observe raw tier + cascade output.
  * Run: Test/runMain graft.tools.StreamDemo */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000L
    val base = Files.createTempDirectory("graft_demo").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    def line(m: String, ts: Long, v: Double) =
      s"""{"metrics":[{"name":"$m","mtype":"timer","measurements":[{"ts":$ts,"values":[$v]}]}]}"""

    val si = new StreamingIngest(spark, base)
    var q = si.startRawTier(si.readJsonStream(in), Trigger.ProcessingTime("300 milliseconds"))
    Files.write(Paths.get(s"$in/b1.json"),
      ((0 until 100).map(i => line("api.latency", T0 + i * 500, 50 + i % 37)) :+
        line("api.latency", T0 + 600000, 1)).mkString("\n").getBytes)
    q.processAllAvailable()
    println(s"DEMO raw tier after batch1: ${spark.read.parquet(si.rawTierPath).count()} buckets")

    // PROBE: malformed JSON + wrong shapes must not kill the stream
    Files.write(Paths.get(s"$in/b2.json"),
      Seq("{not json at all", """{"metrics":"wrong type"}""", "",
        line("api.latency", T0 + 650000, 2)).mkString("\n").getBytes)
    q.processAllAvailable()
    println(s"DEMO stream alive after garbage: ${q.isActive}")

    // PROBE: restart from checkpoint → no duplicates
    q.stop()
    val before = spark.read.parquet(si.rawTierPath).count()
    q = si.startRawTier(si.readJsonStream(in), Trigger.ProcessingTime("300 milliseconds"))
    Files.write(Paths.get(s"$in/b3.json"),
      Seq(line("api.latency", T0 + 700000, 3), line("api.latency", T0 + 900000, 1)).mkString("\n").getBytes)
    q.processAllAvailable()
    q.stop()
    val after = spark.read.parquet(si.rawTierPath)
    println(s"DEMO buckets before restart: $before, after: ${after.count()}")
    val dups = after.groupBy("metric", "bucket_start").count().where("count > 1").count()
    println(s"DEMO duplicate (metric,bucket) rows: $dups")

    si.runCascadeIncrement(Seq(30000L, 60000L))
    val t30 = si.tier(30000L); val t60 = si.tier(60000L)
    println(s"DEMO tier30 rows: ${t30.count()}, tier60 rows: ${t60.count()}")
    import graft.functions.hdr_summary
    import org.apache.spark.sql.functions.col
    t60.select(col("metric"), col("bucket_start"), hdr_summary(col("sketch")).as("s"))
      .select("metric", "bucket_start", "s.count", "s.p50", "s.p99", "s.max")
      .orderBy("bucket_start").show(5, false)
    spark.stop()
  }
}
