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
    * agnostic).
    *
    * `sortCols` makes the rewrite range-partition and sort by those
    * columns — the layout that turns a reader's pushed key predicate
    * into parquet row-group/file PRUNING (an unsorted store interleaves
    * every key through every row group, so min/max stats prune
    * nothing and a "read one key" serve silently scans the store).
    * `canonicalize` lets the owning twin fold its read-side healing
    * rule (e.g. per-key max dedup) into the rewrite, so the compacted
    * store is also the smallest correct one. */
  def compactDir(spark: SparkSession, dir: String, maxFiles: Int = 8,
                 targetFiles: Int = 1,
                 sortCols: Seq[String] = Nil,
                 canonicalize: org.apache.spark.sql.DataFrame =>
                   org.apache.spark.sql.DataFrame = identity): Boolean = {
    import graft.sources.TierStore.{deleteTree, recoverSwap, swapInto}
    import org.apache.spark.sql.functions.col
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
    val base = canonicalize(spark.read.parquet(dir))
    // sortCols apply only when the store actually has them — the
    // maintenance sweep passes layout HINTS by store name, and a
    // same-named store with a different schema must compact plain
    // rather than fail (sweep must not guess at layouts it doesn't own)
    val sc = sortCols.filter(base.columns.contains)
    val laid =
      if (sc.isEmpty) base.coalesce(targetFiles)
      else base.repartitionByRange(targetFiles, sc.map(col): _*)
        .sortWithinPartitions(sc.head, sc.tail: _*)
    laid.write.parquet(tmp.getPath)
    swapInto(root, tmp, old)
    spark.catalog.refreshByPath(dir)
    true
  }

  /** Keep-`version >= v` prune as a compactDir canonicalizer; identity
    * when no committed version is readable or the store lacks the
    * column (same-named stores with other schemas compact plain). */
  private[streaming] def versionPrune(committed: Option[Long]):
      org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    committed match {
      case Some(v) => df =>
        if (df.columns.contains("version"))
          df.where(org.apache.spark.sql.functions.col("version") >= v)
        else df
      case None => identity
    }

  /** The committed centroid generation beside a vec near-dup `cells`
    * dir ([[StreamingVecNearDup]] layout: sibling `centroids` holds
    * exactly the current generation, so its max version IS the
    * commit). None when no centroids sibling exists or it is
    * unreadable — the caller compacts plain. */
  private[streaming] def centroidVersionBeside(spark: SparkSession,
                                               cellsDir: String): Option[Long] = {
    val base = Option(new File(cellsDir).getParent).getOrElse(".")
    val cent = new File(base, "centroids")
    if (!cent.exists()) None
    else {
      spark.catalog.refreshByPath(cent.getPath)
      try spark.read.parquet(cent.getPath)
        .agg(org.apache.spark.sql.functions.max("version")).head(1).headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
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
    "codes",                                     // PQ index code rows
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
      .filter { d =>
        // stores served by a pushed key predicate rewrite key-sorted so
        // parquet row-group pruning holds after maintenance (§G9);
        // canonicalization stays with the owning twin's compactStore
        // (it needs the twin's healing rule, which sweep must not guess)
        val sortCols = if (d.getName == "postings") Seq("token") else Nil
        // PQ code stores append per retrain generation while reads pin
        // `version = committed` — fold the superseded-generation prune
        // into the rewrite (the committed version is readable from the
        // sibling quantizer without instantiating the store; a `codes`
        // dir with no quantizer beside it compacts plain). The prune
        // keeps `version >= committed`, NOT `= committed`: an in-flight
        // retrain has already appended its NEWER rows behind the
        // version pin, and dropping them would invalidate the build's
        // codes-first/commit-second crash design; a crashed build's
        // orphaned newer rows linger only until the next retrain
        // commits past them.
        val canonicalize: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame =
          if (d.getName == "codes")
            versionPrune(graft.ops.PqIndexStore.committedVersionBeside(spark, d.getPath))
          else if (d.getName == "cells")
            // vec near-dup assignment rows: reads pin version = the
            // committed centroid generation, so superseded generations
            // prune exactly like PQ code rows (keep >= committed — an
            // in-flight retrain's newer rows must survive, same crash
            // design). The CMS snapshot store of the same name has no
            // version column / no centroids sibling → identity.
            versionPrune(centroidVersionBeside(spark, d.getPath))
          else identity
        compactDir(spark, d.getPath, maxFiles, targetFiles, sortCols, canonicalize)
      }
      .map(_.getPath)
  }
}
