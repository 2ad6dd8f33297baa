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

  /** Rewrite `dir` down to `targetFiles` parquet files when it holds
    * more than `maxFiles` data files. Returns true if a compaction
    * ran. The sf-scale stores compact to one file; a 100 TB
    * deployment's digest/posting stores set `targetFiles` to keep
    * per-file size bounded (the swap protocol is file-count
    * agnostic). */
  def compactDir(spark: SparkSession, dir: String, maxFiles: Int = 8,
                 targetFiles: Int = 1): Boolean = {
    import graft.sources.TierStore.{deleteTree, recoverSwap, swapInto}
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
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
    spark.read.parquet(dir).coalesce(targetFiles).write.parquet(tmp.getPath)
    swapInto(root, tmp, old)
    spark.catalog.refreshByPath(dir)
    true
  }

  /** Known flat-store leaf names across every streaming twin — the ONE
    * registry a deployment's maintenance job walks. Streaming-engine
    * internals (`chk`, `in`), outputs (`kept`), and the swap-committed
    * single-snapshot stores (CMS cells, mixture counts, TopK summary,
    * weight/λ frames) are deliberately absent: the first two are not
    * stores, the latter are rewritten whole on every commit and never
    * accumulate slivers. */
  val FlatStoreNames: Set[String] = Set(
    "digests", "signatures", "buckets",         // dedup / curation twins
    "grams",                                     // span dedup
    "cells",                                     // vec near-dup assignments
                                                 // (the CMS snapshot store of
                                                 // the same name never exceeds
                                                 // maxFiles — sweep is a no-op)
    "postings", "docs",                          // BM25 index
    "funnel")                                    // curation funnel record

  /** Maintenance sweep: compact every known flat store found anywhere
    * under `base` (a deployment root holding any number of twin
    * `baseDir`s). Same maintenance-window contract as [[compactDir]] —
    * run with the streams stopped or between triggers. Returns the
    * dirs that were actually rewritten. Depth-bounded walk; unknown
    * directory names are never touched (compaction must not guess at
    * layouts it doesn't own). */
  def sweep(spark: SparkSession, base: String, maxFiles: Int = 8,
            maxDepth: Int = 4, targetFiles: Int = 1): Seq[String] = {
    def walk(f: File, depth: Int): Seq[File] =
      if (!f.isDirectory || depth > maxDepth) Nil
      else {
        val here = if (FlatStoreNames(f.getName)) Seq(f) else Nil
        here ++ Option(f.listFiles()).toSeq.flatten
          .filter(_.isDirectory).flatMap(walk(_, depth + 1))
      }
    walk(new File(base), 0)
      .filter(d => compactDir(spark, d.getPath, maxFiles, targetFiles))
      .map(_.getPath)
  }
}
