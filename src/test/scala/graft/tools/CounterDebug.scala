package graft.tools
import java.nio.file.{Files, Paths}
import graft.GraftSession
import graft.streaming.StreamingIngest
import org.apache.spark.sql.streaming.Trigger
object CounterDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000L
    val base = Files.createTempDirectory("graft_cdbg").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    def line(m: String, mt: String, ts: Long, vs: Seq[Double]) =
      s"""{"metrics":[{"name":"$m","mtype":"$mt","measurements":[{"ts":$ts,"values":[${vs.mkString(",")}]}]}]}"""
    val si = new StreamingIngest(spark, base)
    // spec order: start query FIRST, then write the file
    val q = si.startCounterTier(si.readJsonStream(in), Trigger.ProcessingTime("300 milliseconds"))
    Files.write(Paths.get(s"$in/c1.json"), Seq(
      line("reqs", "counter", T0, Seq(1, 1, 3)),
      line("reqs", "counter", T0 + 2000, Seq(2)),
      line("reqs", "counter", T0 + 31000, Seq(5)),
      line("reqs", "counter", T0 + 120000, Seq(1))).mkString("\n").getBytes)
    q.processAllAvailable()
    (1 to 20).foreach { i =>
      Thread.sleep(500)
      val n = try spark.read.parquet(si.counterRawTierPath).count() catch { case _: Throwable => -1 }
      println(s"DBG t=${i*500}ms rows=$n lastBatch=${Option(q.lastProgress).map(_.batchId)} wm=${Option(q.lastProgress).map(_.eventTime.get("watermark"))}")
      if (n >= 2) { spark.read.parquet(si.counterRawTierPath).show(5, false); q.stop(); spark.stop(); return }
    }
    q.stop(); spark.stop()
  }
}
