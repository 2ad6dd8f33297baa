package graft.streaming

import java.io.File

import org.apache.spark.sql.SparkSession

/** Small-file compaction for the flat state stores the streaming dedup
  * pipelines append to ([[StreamingDedup]] digests, [[StreamingNearDup]]
  * signatures): one file lands per micro-batch, and at a 30 s cadence
  * that is ~2880 slivers/day — file listings degrade long before data
  * volume does. Same maintenance-window contract and three-name
  * crash-safety as `TierStore.compact`: run it while the stream is
  * stopped (or between triggers); a crash leaves the store under
  * exactly one of its three names and the recovery branch restores it
  * on the next call.
  */
object StoreCompaction {

  /** Rewrite `dir` to a single parquet file when it holds more than
    * `maxFiles` data files. Returns true if a compaction ran. */
  def compactDir(spark: SparkSession, dir: String, maxFiles: Int = 8): Boolean = {
    import graft.sources.TierStore.{deleteTree, recoverSwap, swapInto}
    val root = new File(dir)
    val tmp = new File(dir + "__compact_new")
    val old = new File(dir + "__compact_old")
    recoverSwap(root, old)
    deleteTree(tmp)
    deleteTree(old)
    if (!root.exists()) return false
    val files = Option(root.listFiles()).toSeq.flatten
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    if (files <= maxFiles) return false
    spark.read.parquet(dir).coalesce(1).write.parquet(tmp.getPath)
    swapInto(root, tmp, old)
    spark.catalog.refreshByPath(dir)
    true
  }
}
