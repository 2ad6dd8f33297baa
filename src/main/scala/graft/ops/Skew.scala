package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has heavy hitters
  * (AQE's skew-join handles sort-merge skew at runtime; salting is the
  * explicit tool when one side can be replicated).
  *
  * `saltedJoin` splits each left-side key's rows across `salt` shuffle
  * partitions and replicates every right-side row `salt` times, so a
  * key holding 30% of a 100 TB fact table spreads over `salt` reducers
  * instead of melting one.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val l = left.withColumn("_salt", (rand(42) * salt).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top heavy-hitter keys by row count — the input to a targeted
    * salting decision (salt only the hot keys, pass the rest through). */
  def heavyHitters(df: DataFrame, key: String, topK: Int): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topK)
}
