package graft.ops

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational entry point for the pipeline half — the batch job a
  * cluster schedules per crawl drop, mirroring [[graft.rollup.RollupJob]]
  * for the metrics half. One invocation:
  *
  *  1. curates the corpus (quality → exact dedup → near-dup →
  *     decontamination, plus whatever [[Curation.Params]] knobs the
  *     deployment sets — MinHash pair source is the scale default
  *     here),
  *  2. writes the curated corpus SHARDED ([[CorpusShards.write]] —
  *     deterministic 16-way layout, one file per shard dir, the
  *     training-loader contract),
  *  3. writes the funnel record (batch_id 0, wall-clock stamp — the
  *     same shape the streaming twin appends), and
  *  4. publishes it as `~curation.*` counters
  *     ([[graft.streaming.CurationMetrics]]), so the nightly run's
  *     gate counts chart on the SAME dashboards as the streaming
  *     deployment's.
  *
  * Usage: runMain graft.ops.CurationJob <sfDir> <outDir>
  * (benchmark = the driver convention's every-10th doc; a deployment
  * passes its real held-out set through [[run]]). */
object CurationJob {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.builder().appName("graft-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, outDir: String,
          p: Curation.Params =
            Curation.Params(pairSource = Curation.PairSource.MinHash()),
          nShards: Int = 16): Unit = {
    val docs = Tables.documents(spark, sfDir)
    val (curated, funnel) = Curation.run(
      docs.where(col("doc_id") % 10 =!= 0),
      docs.where(col("doc_id") % 10 === 0), p)
    CorpusShards.write(curated, s"$outDir/corpus", nShards)
    funnel
      .select(lit(0L).as("batch_id"), col("stage"), col("n_docs"),
        lit(System.currentTimeMillis()).as("ts_ms"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/funnel")
    graft.streaming.CurationMetrics.publish(spark, s"$outDir/funnel",
      s"$outDir/metrics")
    // release health: the curated corpus's per-source card, chartable
    // as ~corpus.* next to the ~curation.* funnel counters (sibling
    // store — each publish swaps its own directory whole)
    graft.streaming.CorpusMetrics.publish(spark,
      Reports.sourceCard(curated), s"$outDir/corpus_metrics",
      System.currentTimeMillis())
  }
}
