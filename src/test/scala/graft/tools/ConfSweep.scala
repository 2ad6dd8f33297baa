package graft.tools

/** A/B measurement of runtime-settable SQL confs over named queries in
  * ONE JVM: run each query `repeat` times under configuration A (the
  * session defaults), then under configuration B (the overrides), and
  * print medians side by side. For adjudicating whether a conf change
  * (e.g. AQE coalescing toward advisory partition sizes, guide §2.2)
  * is a real win or local-mode noise.
  *
  * Usage: Test/runMain graft.tools.ConfSweep <q1,q2,...> <k=v,k=v,...> [sfDir] [repeat]
  */
object ConfSweep {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val overrides = args(1).split(",").map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder(32, 32).appName("graft-conf-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.planner.MaterializedTiers.ensure(spark, dir) catch { case _: Throwable => () }
    try graft.ops.Bucketing.ensureOrderTables(spark, dir) catch { case _: Throwable => () }
    try { graft.queries.PqServeStores.ensure(spark, dir); () } catch { case _: Throwable => () }
    def force(df: org.apache.spark.sql.DataFrame): Unit = graft.Bench.force(df)
    def time(n: String): Double = {
      val t0 = System.nanoTime()
      force(graft.SparkEntry.queries(n)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    // warm both plans once at the smallest SF
    names.foreach { n =>
      try force(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    val baseVals = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    def setB(): Unit = overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    def setA(): Unit = baseVals.foreach { case (k, ov) =>
      ov match { case Some(v) => spark.conf.set(k, v); case None => spark.conf.unset(k) }
    }
    // warm the B plans too (different conf can mean different codegen)
    setB()
    names.foreach { n =>
      try force(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    setA()
    // INTERLEAVED per query with ALTERNATING arm order (AB, BA, AB, …):
    // box drift and JIT warming hit both arms equally AND neither arm
    // systematically runs first, so paired differences cancel drift
    val a = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    val b = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    for (i <- 0 until repeat; n <- names) {
      if (i % 2 == 0) {
        setA(); a(n) = a(n) :+ time(n)
        setB(); b(n) = b(n) :+ time(n)
      } else {
        setB(); b(n) = b(n) :+ time(n)
        setA(); a(n) = a(n) :+ time(n)
      }
      setA()
    }
    println(f"${"query"}%-28s ${"A(md)"}%8s ${"B(md)"}%8s  ratio  (A=${"defaults"}, B=${overrides.map(kv => kv._1.split('.').last + "=" + kv._2).mkString(" ")})")
    names.foreach { n =>
      val (ma, mb) = (median(a(n)), median(b(n)))
      val diffs = a(n).zip(b(n)).map { case (x, y) => y - x }
      println(f"$n%-28s $ma%8.2f $mb%8.2f  ${mb / ma}%5.2f  mnA=${a(n).min}%5.2f mnB=${b(n).min}%5.2f pairedMd(B-A)=${median(diffs)}%+6.2f   A=${a(n).map(t => f"$t%.2f").mkString(" ")} B=${b(n).map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
