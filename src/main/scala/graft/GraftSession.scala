package graft

import org.apache.spark.sql.SparkSession

/** Standard session settings for the engine. Mirrors what a cluster
  * deployment would set via spark-defaults; local[N] here stands in for
  * N executor cores.
  */
object GraftSession {
  def builder(cores: Int = 32, shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores INT64 TIMESTAMP(NANOS); Spark reads it as
      // Long only with this flag (Tables.events normalizes back).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // hdr_sketch/hdr_merge run as ObjectHashAggregate; the default
      // 128-group fallback to sort-based aggregation cripples the
      // rollup cascade (one sketch per metric×bucket = many small
      // groups, each buffer only a few hundred bytes)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // cached tier frames carry binary sketch blobs; trying column
      // compression schemes on them dominates cache build time
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** [[builder]] pointed at a REAL multi-process cluster master (e.g.
    * `local-cluster[2,2,2048]`, which forks one executor JVM per
    * worker) instead of in-process local[n] threads. Same engine
    * settings; adds what separate executor JVMs need that local mode
    * gets for free: the application classpath (class DIRECTORIES reach
    * same-host executors via extraClassPath — standalone `spark.jars`
    * shipping wants jars) and the JDK-17 module opens (the launcher
    * injects them for spark-submit; forked executors of an
    * sbt-launched driver must carry them explicitly). Requires
    * SPARK_HOME *and* SPARK_SCALA_VERSION (e.g. 2.13) in the
    * environment — the in-JVM worker invokes the distribution's
    * launcher as a LIBRARY, skipping bin/load-spark-env.sh which
    * normally derives the scala version; without it executor launch
    * dies with "Cannot find any build directories". */
  def clusterBuilder(master: String, shufflePartitions: Int = 8,
                     executorMemory: String = "1500m"): SparkSession.Builder = {
    val appCp = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(p => new java.io.File(p).getAbsolutePath).mkString(":")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    builder(cores = 4, shufflePartitions = shufflePartitions)
      .master(master)
      .config("spark.executor.memory", executorMemory)
      .config("spark.executor.extraClassPath", appCp)
      .config("spark.executor.extraJavaOptions", addOpens)
  }
}
