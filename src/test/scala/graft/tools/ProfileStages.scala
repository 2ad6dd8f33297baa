package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time profile of named queries at a given sf dir —
  * quantifies the eager-checkpoint job tax (VERDICT r13 #1): how many
  * isolated jobs one query schedules and how long each runs, so the
  * fix (fewer forced frames) is measured, not guessed.
  *
  * Usage: Test/runMain graft.tools.ProfileStages <q1,q2,...> [sfDir]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(32, 32).appName("profile-stages").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Seq[Int])]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stageTasks.put(i.stageId, (i.numTasks, i.taskMetrics.executorRunTime))
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("")
        // stage details carry the user-code callsite of the action
        val site = j.stageInfos.flatMap(s =>
          s.details.linesIterator.find(l => l.contains("graft.") && !l.contains("tools.")))
          .headOption.getOrElse("").trim
        starts.put(j.jobId,
          (System.nanoTime(), (desc + " " + site).take(110), j.stageInfos.map(_.stageId)))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d, stageIds) =>
          val ran = stageIds.flatMap(id => Option(stageTasks.get(id)))
          val nt = ran.map(_._1).sum
          val rt = ran.map(_._2).sum / 1e3
          lines.add(f"    job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
            f"stages=${ran.size}%2d/${stageIds.size}%2d tasks=$nt%3d taskTime=$rt%6.2f s  $d")
        }
      }
    })

    def run(name: String, sfDir: String, show: Boolean): Double = {
      lines.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      if (show) {
        println(f"== $name: $sec%.2f s total, ${lines.size} jobs")
        lines.forEach(l => println(l))
      }
      sec
    }
    names.foreach(n => run(n, "/root/testdata/sf0.001", show = false)) // JIT warm
    names.foreach { n =>
      run(n, dir, show = true)
      val again = run(n, dir, show = false)
      println(f"   (repeat: $again%.2f s)")
    }
    spark.stop()
  }
}
