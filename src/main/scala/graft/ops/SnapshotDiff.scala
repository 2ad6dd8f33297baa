package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-refresh primitive: given two
  * versions of a corpus, classify every id as added, removed, changed,
  * or unchanged by comparing content digests. A nightly pipeline diffs
  * tonight's crawl against the served corpus and routes only
  * added/changed docs through curation (the expensive stages), and
  * removed ids through index deletion.
  *
  * Scale: both sides reduce to (id, 32-byte digest) before the one
  * full-outer shuffle join on id — text never crosses the network, and
  * the join is equi on the id key (AQE handles skew). Digest equality
  * stands in for content equality (sha-256; collision odds are
  * negligible next to corpus error rates).
  */
object SnapshotDiff {

  /** One row per id present in either version, with its change kind.
    * Content comparison uses the normalized-text digest (the
    * [[Dedup.exact]] key), so whitespace-only edits read as unchanged —
    * pass a different `digestOf` for byte-exact semantics. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // presence is tracked by explicit flags, not digest NULLness — a
    // NULL-text doc has a NULL digest and would otherwise masquerade
    // as absent from its own side
    val o = oldDocs.select(col(idCol).as("__id"),
      sha2(Dedup.normText(col(textCol)), 256).as("__o_dg"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol).as("__id"),
      sha2(Dedup.normText(col(textCol)), 256).as("__n_dg"),
      lit(true).as("__in_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__o_dg") <=> col("__n_dg")), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** Change-kind counts — the one-line report a refresh job logs. */
  def summary(oldDocs: DataFrame, newDocs: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    diff(oldDocs, newDocs, idCol, textCol)
      .groupBy("change").agg(count(lit(1)).as("n"))
      .orderBy("change")
}
