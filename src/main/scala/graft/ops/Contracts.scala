package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation: declarative per-column constraint checks
  * over a frame, reported as one row per check — the gate an ingest
  * pipeline runs before promoting a batch (and a training pipeline
  * runs before trusting a refreshed corpus).
  *
  * Row checks (null rate, range, set membership, arbitrary predicates)
  * evaluate in ONE pass: a single aggregate of conditional sums, no
  * shuffle beyond the global 1-row reduce, then an unpivot to
  * check-per-row. Uniqueness checks need their own key-grouped
  * aggregate each (count − distinct count); they union in after.
  */
object Contracts {

  /** A named row-level constraint: `violation` is TRUE on rows that
    * break the contract. */
  final case class Check(name: String, violation: Column)

  /** Convenience constructors for the common contracts. */
  def notNull(name: String, c: Column): Check = Check(name, c.isNull)
  def inRange(name: String, c: Column, lo: Column, hi: Column): Check =
    Check(name, c.isNull || c < lo || c > hi)
  def inSet(name: String, c: Column, allowed: Seq[Any]): Check =
    Check(name, c.isNull || !c.isInCollection(allowed))

  /** Evaluate row checks (one scan) and key-uniqueness checks (one
    * distinct aggregate per key) over `df`.
    *
    * Output: (check, violations, total, pass) ordered by check name —
    * `violations` is the breaking-row count (for uniqueness: rows in
    * excess of one per key), `pass` is violations == 0.
    */
  def report(df: DataFrame, checks: Seq[Check],
             uniqueKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val spark = df.sparkSession
    val rowReport: Option[DataFrame] = if (checks.isEmpty) None else {
      val aggs = checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"__v$i")
      } :+ count(lit(1)).as("__total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      // check names are caller-defined strings landing inside SQL —
      // escape them or a quote in a name breaks (or injects into) the
      // generated projection
      val stackArgs = checks.zipWithIndex
        .map { case (c, i) =>
          val name = c.name.replace("\\", "\\\\").replace("'", "\\'")
          s"'$name', __v$i"
        }.mkString(", ")
      Some(one.selectExpr(s"stack(${checks.size}, $stackArgs) AS (check, violations)",
        "__total AS total"))
    }
    val uniqReports = uniqueKeys.map { case (name, keyCol) =>
      df.agg(
        (count(col(keyCol)) - count_distinct(col(keyCol))).as("violations"),
        count(lit(1)).as("total"))
        .select(lit(name).as("check"), col("violations"), col("total"))
    }
    (rowReport.toSeq ++ uniqReports)
      .reduce(_ unionByName _)
      .select(col("check"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
      .orderBy("check")
  }
}
