package graft.tools

/** Formalizes the bench-sentinel adjudication protocol (BASELINE.md
  * §F11) as one command: re-measure named queries in THIS fresh JVM,
  * repeat-N each, and emit a markdown verdict table comparing against
  * a driver bench artifact — so "driver says 17 s, is the code or the
  * box at fault?" is answered by running one tool instead of a
  * hand-run protocol each round.
  *
  * Usage:
  *   Test/runMain graft.tools.SentinelCheck <q1,q2,...> [artifact.json]
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_REPEAT (default 5)
  *
  * One invocation = one fresh JVM (the §F11 requirement). Queries run
  * in the given order after the standard bench prep (sf0.001 warm of
  * the NAMED queries only + tier/bucket/index pre-build), so a single
  * query name measures it isolated; a comma-list measures them in
  * sequence inside one JVM (the order-interaction bisect arm).
  *
  * Artifact formats accepted: the full bench artifact
  * (target/bench_result.json — `queries_median`/`queries_min` maps) or
  * a driver BENCH_r{N}.json (per-query lines inside its `tail`
  * capture). No artifact → local columns only.
  *
  * Verdicts (driver md vs local md):
  *   driver ≥ 3× local → driver-box-anomaly (code exonerated)
  *   local ≥ 3× driver → local-regression (investigate the code/box)
  *   otherwise         → consistent
  */
object SentinelCheck {

  private def timesOf(json: String, key: String): Map[String, Double] = {
    // tiny regex extraction — both artifact shapes carry
    // "<name>":<sec> inside the named map, or {"q":"<name>",...,"md":x}
    val m = scala.collection.mutable.Map.empty[String, Double]
    val full = ("\"" + key + "\"\\s*:\\s*\\{([^}]*)\\}").r
    full.findFirstMatchIn(json).foreach { g =>
      "\"([A-Za-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(g.group(1))
        .foreach(x => m(x.group(1)) = x.group(2).toDouble)
    }
    if (m.isEmpty) { // driver-tail shape: per-query lines live ESCAPED
      // inside the artifact's "tail" string — unescape before matching
      val plain = json.replace("\\\"", "\"")
      "\\{\"q\":\"([A-Za-z0-9_]+)\",\"s\":(-?[0-9.]+),\"mn\":(-?[0-9.]+),\"md\":(-?[0-9.]+)".r
        .findAllMatchIn(plain)
        .foreach(x => m(x.group(1)) = x.group(4).toDouble)
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SentinelCheck <q1,q2,...> [driver_bench.json]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val driverMd: Map[String, Double] = args.drop(1).headOption.map { p =>
      val src = scala.io.Source.fromFile(p, "UTF-8")
      val json = try src.mkString finally src.close()
      val t = timesOf(json, "queries_median")
      if (t.nonEmpty) t else timesOf(json, "tail")
    }.getOrElse(Map.empty)

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.builder(32, 32)
      .appName("graft-sentinel").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map { n =>
      n -> graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n (not in SparkEntry.queries)"))
    }
    // standard bench prep — measure the operator, not codegen/JIT or
    // one-time amortized builds
    val warmDir = "/root/testdata/sf0.001"
    qs.foreach { case (_, fn) =>
      try graft.Bench.force(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    try graft.planner.MaterializedTiers.ensure(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.ops.Bucketing.ensureOrderTables(spark, sfDir)
    catch { case _: Throwable => () }
    try { graft.queries.PqServeStores.ensure(spark, sfDir); () }
    catch { case _: Throwable => () }

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    println(s"\n| query | local min | local md | local max | driver md | ratio | verdict |")
    println(s"|---|---|---|---|---|---|---|")
    qs.foreach { case (name, fn) =>
      val ts = (0 until repeat).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val md = median(ts)
      def f(x: Double) = f"$x%.2f"
      val (dcol, rcol, verdict) = driverMd.get(name) match {
        case Some(d) =>
          val v = if (d >= 3 * md) "driver-box-anomaly"
                  else if (md >= 3 * d) "local-regression"
                  else "consistent"
          (f(d), f(d / md), v)
        case None => ("n/a", "n/a", "local-only")
      }
      println(s"| $name | ${f(ts.min)} | ${f(md)} | ${f(ts.max)} | $dcol | $rcol | $verdict |")
    }
    println(s"\n(fresh JVM, repeat=$repeat, sf=$sfDir, " +
      s"${java.time.LocalDate.now()})")
    spark.stop()
  }
}
