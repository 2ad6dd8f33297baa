package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MinHash signature → band-bucket → estimate pipeline shared by
  * [[StreamingNearDup]] and [[StreamingCuration]]'s near-dup stage —
  * ONE implementation so a fix to the signature layout, bucket
  * derivation, or estimate formula cannot silently desynchronize the
  * curation funnel from the standalone twin (they persist
  * interchangeable store rows by design).
  */
private[streaming] final class MinhashTwinOps(k: Int, numHashes: Int,
                                              bands: Int, rows: Int,
                                              idCol: String, textCol: String) {

  /** (id, sig array<long>) signature frame for a document batch. */
  def sigArrOf(docs: DataFrame): DataFrame =
    Dedup.minhashSignatures(docs, k, numHashes, idCol, textCol)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"h$j")): _*).as("sig"))

  /** (id, band, bh) LSH bucket rows of a signature frame. */
  def bucketsOf(sigArr: DataFrame): DataFrame =
    Dedup.bandBuckets(
      sigArr.select(col("id") +:
        (0 until numHashes).map(j => col("sig")(j).as(s"h$j")): _*),
      bands, rows)

  /** Estimated Jaccard per candidate pair: matching-minhash fraction. */
  def estimate(cand: DataFrame, sigA: DataFrame, sigB: DataFrame): DataFrame = {
    val matches = (0 until numHashes)
      .map(j => when(col("sig_a")(j) === col("sig_b")(j), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigA.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigB.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / numHashes).as("est"))
  }
}
