package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sharding — the output stage of a training-data
  * pipeline. Trainers consume a corpus as N stable shards (shuffle
  * order, resume points, and data-parallel reads all key off the shard
  * layout), so the assignment must be a pure function of the document
  * id: same corpus in → same shards out, on any engine, any cluster
  * size, any rerun. Spark's default file splitting gives none of that.
  *
  * Assignment is the sampling operators' deterministic hash
  * ([[Sampling.detHashMod]]) — SQL-reproducible integer arithmetic, no
  * engine-specific hash — taken mod the shard count. The shared
  * helper's mod-P reduction is what makes strided and sequential ids
  * spread uniformly instead of landing range-clumped (see its note on
  * the A ≡ 1 mod 2^k trap).
  *
  * [[write]] materializes one parquet file per shard: rows are hash-
  * repartitioned on the shard column (each shard value lives in
  * exactly one task, so each `shard=k/` directory receives exactly one
  * file) and written via `partitionBy`, which makes the layout
  * self-describing and partition-prunable on read.
  */
object CorpusShards {

  /** Shard id in [0, nShards) for a non-negative integer id column. */
  def shardOf(id: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    Sampling.detHashMod(id, nShards.toLong)
  }

  /** The corpus with its `shard` assignment column. */
  def assign(df: DataFrame, nShards: Int, idCol: String = "doc_id"): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), nShards))

  /** Write the corpus as `outDir/shard=k/` parquet, one file per
    * shard. Shard size is governed by nShards — pick it so each shard
    * is a few hundred MB at the target corpus size. */
  def write(df: DataFrame, outDir: String, nShards: Int,
            idCol: String = "doc_id"): Unit =
    assign(df, nShards, idCol)
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
}
