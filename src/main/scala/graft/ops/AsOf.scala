package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and time ≤ the left row's time — the feature
  * join every training pipeline needs and Spark lacks natively.
  *
  * Implementation is the scalable union+window form: tag both sides,
  * union, one shuffle on (key), and a running `last(_, ignoreNulls)`
  * over time order carries each right row forward to the left rows it
  * answers. No join product ever materializes, so a hot key with a
  * million left rows costs a sort, not a million-row nested loop —
  * the property that keeps this viable at 100 TB (a range-join or
  * broadcast backward-scan blows up exactly there).
  *
  * Ties (right.ts == left.ts) match, like DuckDB/pandas ASOF (`>=`).
  */
object AsOf {

  /** leftDf(keyCol, tsCol, …) ⨝asof rightDf(keyCol, tsCol, valueCols…):
    * returns leftDf columns + right value columns (null when no prior
    * right row exists). Column names must not collide except key/ts. */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
               keyCol: String, tsCol: String,
               rightValueCols: Seq[String]): DataFrame = {
    val leftCols = leftDf.columns.toSeq
    val asofTs = s"_asof_$tsCol"
    val left = leftDf.withColumn("_side", lit(1))
      .withColumn(asofTs, lit(null).cast("long"))
      .select((leftCols.map(col) :+ col("_side") :+ col(asofTs)) ++
        rightValueCols.map(c => lit(null).cast(rightDf.schema(c).dataType).as(c)): _*)
    val right = rightDf.withColumn("_side", lit(0))
      .withColumn(asofTs, col(tsCol).cast("long"))
      .select((leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).cast(leftDf.schema(c).dataType).as(c)) :+
        col("_side") :+ col(asofTs)) ++ rightValueCols.map(col): _*)

    // right rows sort before left rows at equal ts → ties match (>=)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = left.unionByName(right)
      .withColumn(s"${tsCol}_right", F.last(col(asofTs), ignoreNulls = true).over(w))
    val carriedVals = rightValueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"${c}_right", F.last(col(c), ignoreNulls = true).over(w))
    }
    val outCols = leftCols.map(col) ++
      Seq(col(s"${tsCol}_right").as(s"${tsCol}_asof")) ++
      rightValueCols.map(c => col(s"${c}_right").as(s"${c}_asof"))
    carriedVals.where(col("_side") === 1).select(outCols: _*)
  }
}
