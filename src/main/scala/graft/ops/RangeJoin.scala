package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins that never plan a nested-loop: the classic
  * time-bin bucketing rewrite. A raw `ON p.ts BETWEEN i.start AND
  * i.end` predicate has no equi-key, so Spark can only
  * BroadcastNestedLoopJoin it — fine for a broadcast-sized interval
  * side, quadratic otherwise. Bucketing by a fixed-width time bin
  * turns it into an equi-join: intervals are exploded to every bin
  * they overlap, points map to exactly ONE bin, the join runs on the
  * bin key, and the range predicate re-verifies each candidate.
  *
  * Because a point belongs to exactly one bin and an interval appears
  * at most once per bin, each qualifying (point, interval) pair
  * surfaces exactly once — no dedup pass. Shuffle volume is
  * |points| + Σ interval spans/binWidth, both linear for bounded
  * interval lengths; pick `binWidth` near the typical interval length
  * so most intervals land in ≤ 2 bins.
  */
object RangeJoin {

  /** Join each point row to every interval row whose
    * `[startCol, endCol]` (inclusive) contains `pointTs`. All three
    * columns must be of one integer-comparable type (epoch millis is
    * the house convention). Column sets of the two frames must be
    * disjoint — rename before calling. Output: the matched pairs with
    * both sides' columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap — rename first")
    // integer DIV on all three, so a point's bin is always inside its
    // containing interval's bin range (same monotone rounding)
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"CAST($startCol AS BIGINT) DIV $binWidth"),
        expr(s"CAST($endCol AS BIGINT) DIV $binWidth"))))
    val pointBinned = points.withColumn("__bin",
      expr(s"CAST($pointTs AS BIGINT) DIV $binWidth"))
    pointBinned.join(binned, "__bin")
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }
}
