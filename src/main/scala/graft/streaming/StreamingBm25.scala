package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental BM25 index: the lexical retrieval arm as a continuously
  * maintained store instead of a per-query corpus scan. Each batch
  * appends its postings (token, doc_id, tf) and doc stats (doc_id, dl)
  * — the classic inverted-index build, kept additive so there is
  * nothing to rebuild, ever. [[topK]] then serves queries from the
  * store: ONLY the query terms' posting rows are read (the term
  * predicate reaches the parquet scan as a pushed filter), corpus
  * stats reduce from the doc-stats store, and ranking reuses the exact
  * batch formula ([[TextAnalysis.bm25Rank]]) — so index serve ≡
  * [[TextAnalysis.bm25TopK]] over the ingested corpus, spec-pinned.
  *
  * Scale: serve cost is Σ df(term) posting rows + one doc-stats
  * aggregate — independent of corpus text size; that is the point of
  * an index. State is vocabulary×docs-bounded postings (8 B + token
  * per row), compactable with [[StoreCompaction.compactDir]] like
  * every twin store.
  *
  * Failure semantics: at-least-once. Docs already in the store are
  * excluded per batch by an id anti-join, and a crash BETWEEN the two
  * appends (postings landed, docs not) is healed at read time: both
  * reads dedup per key — max(tf) per (token, doc_id), max(dl) per
  * doc_id — so a replayed batch's re-appends are idempotent (replayed
  * rows are bit-identical, max = the value), and a doc only counts in
  * the corpus stats once. */
class StreamingBm25(spark: SparkSession, baseDir: String,
                    idCol: String = "doc_id", textCol: String = "text") {

  private val postDir = s"$baseDir/postings"
  private val docsDir = s"$baseDir/docs"

  /** Streaming source for JSON-lines document files in `dir`. */
  def readJsonDocs(dir: String): DataFrame =
    spark.readStream.schema(s"$idCol LONG, $textCol STRING").json(dir)

  /** Compact the per-batch posting/doc-stat slivers (maintenance-window
    * op — run between triggers or with the stream stopped). */
  /** Compact both stores. Postings rewrite TOKEN-SORTED and
    * canonicalized (per-(token, id) max tf — the read-side healing
    * rule folded in), so a serve's pushed `In(token, …)` predicate
    * prunes parquet row groups instead of scanning the store: serve
    * cost becomes Σ df(term) posting rows + the (id, dl) doc-stats
    * scan, independent of corpus text volume. Doc stats canonicalize
    * to one row per id. */
  def compactStore(maxFiles: Int = 8): Boolean = {
    val a = StoreCompaction.compactDir(spark, postDir, maxFiles,
      sortCols = Seq("token"),
      canonicalize = df => df.groupBy("token", idCol).agg(max("tf").as("tf")))
    val b = StoreCompaction.compactDir(spark, docsDir, maxFiles,
      canonicalize = df => df.groupBy(idCol).agg(max("dl").as("dl")))
    a || b // true when ANY store compacted (compactDir's contract)
  }

  private def readStore(s: SparkSession, dir: String, like: DataFrame): DataFrame =
    if (Files.exists(Paths.get(dir))) {
      s.catalog.refreshByPath(dir)
      s.read.parquet(dir)
    } else like.limit(0)

  /** Deduped doc-stats view (doc_id, dl). */
  def docStats(s: SparkSession = spark): DataFrame = {
    import s.implicits._
    readStore(s, docsDir, Seq.empty[(Long, Long)].toDF(idCol, "dl"))
      .groupBy(idCol).agg(max("dl").as("dl"))
  }

  /** Serve a term query from the store — no corpus scan, only the
    * query terms' postings move. */
  def topK(queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75,
           s: SparkSession = spark): DataFrame = {
    import s.implicits._
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val postings = readStore(s, postDir,
      Seq.empty[(String, Long, Long)].toDF("token", idCol, "tf"))
      .where(col("token").isInCollection(queryTerms))
      .groupBy("token", idCol).agg(max("tf").as("tf"))
    val docs = docStats(s)
    val stats = docs.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    val tf = postings.join(docs, idCol)
      .select(col(idCol).as("doc_id"), col("dl"), col("token"), col("tf"))
    TextAnalysis.bm25Rank(tf, stats, k, k1, b)
  }

  /** Index one batch of documents — the foreachBatch body, public so
    * bulk backfills (and the scale harness) can drive the identical
    * code path without a stream. */
  def ingestBatch(batch: DataFrame): Unit = {
    val s = batch.sparkSession
    // one row per id within the batch, then exclude already-indexed
    // docs (re-ingest guard: an id is indexed once, first text wins)
    val oneRn = Window.partitionBy(idCol).orderBy(col(textCol).asc)
    val fresh = batch.select(col(idCol), col(textCol))
      .withColumn("__rn", row_number().over(oneRn)).where(col("__rn") === 1)
      .drop("__rn")
      .join(readStore(s, docsDir,
          batch.select(col(idCol), lit(0L).as("dl")).limit(0))
          .select(idCol),
        Seq(idCol), "left_anti")
      .select(col(idCol), Dedup.tokens(col(textCol)).as("w"))
      .localCheckpoint() // postings + stats appends share one eval
    fresh
      .select(col(idCol), explode(col("w")).as("token"))
      .groupBy("token", idCol).agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(postDir)
    fresh
      .select(col(idCol), size(col("w")).cast("long").as("dl"))
      .write.mode("append").parquet(docsDir)
  }

  def start(docs: DataFrame, trigger: Trigger): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/chk")
      .foreachBatch { (batch: DataFrame, _: Long) => ingestBatch(batch) }
      .start()
}
