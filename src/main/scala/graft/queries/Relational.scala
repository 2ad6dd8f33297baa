package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator showcase over the TPC-H-ish testdata tables.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - double aggregates go through an exact decimal sum then one final
  *    cast to double, so Spark's partial-aggregation order can't change
  *    the result;
  *  - every query is fully ordered on a unique key set;
  *  - limits always ride on a total order (no ties at the cut).
  */
object Relational {

  /** Exact order-independent sum of a double column: accumulate as
    * decimal (exact addition), cast to double once at the end.
    *
    * `scale` must match the column's true decimal precision and keep
    * sum*10^scale below 2^53: DuckDB converts decimal→double via
    * (int128 → double) / 10^scale, which is only correctly rounded when
    * the integer part fits a double exactly.
    */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** TPC-H Q1-style pricing summary: the canonical partial-agg +
    * final-agg pattern; shuffles only the 4-ish group keys. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + narrow projection: predicate and both columns must reach
    * the parquet scan (PushedFilters + 3-column ReadSchema). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
             col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Revenue by nation: fact table joins two broadcastable dims.
    * customer and nation are tiny at every SF → broadcast hash joins,
    * single shuffle for the final group-by. */
  def q3RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Global top-k by total order value: Spark plans TakeOrderedAndProject
    * (per-partition top-k, no full sort shuffle). Unique tiebreak on key. */
  def q4TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Semi join: customers having at least one open order. */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).where(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Anti join: parts never shipped in large quantity. */
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p  = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir).where(col("l_quantity") > 45.0)
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy("p_partkey")
  }

  /** Distinct aggregation: exact distinct users per event type (the
    * expensive exact path; approx_count_distinct is the scale path and
    * is exercised separately, rows-only). */
  def q7DistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Per-group top-k via ranking window: top-2 parts by retail price per
    * brand. Single shuffle on the partition key. */
  def q8TopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("p_brand"), col("rk").cast("long").as("rk"), col("p_partkey"), col("p_retailprice"))
      .orderBy("p_brand", "rk")
  }

  /** Revenue by order priority over BUCKETED, co-located tables:
    * lineitem and orders are stored bucketed+sorted on the order key
    * (see [[graft.ops.Bucketing]]), so the sort-merge join planned here
    * runs with NO exchange — the one-time write shuffle is amortized
    * over every join on the key. The merge hint pins the join strategy
    * the bucketed layout exists for (at 100 TB neither side
    * broadcasts). BucketingSpec asserts the exchange-free plan. */
  def q9ColocatedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (liName, ordName) = graft.ops.Bucketing.ensureOrderTables(spark, dir)
    val li = spark.table(liName)
    val o = spark.table(ordName)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project"  -> (q2FilterProject _),
    "q3_revenue_nation"  -> (q3RevenueByNation _),
    "q4_top_orders"      -> (q4TopOrders _),
    "q5_semi_join"       -> (q5SemiJoin _),
    "q6_anti_join"       -> (q6AntiJoin _),
    "q7_distinct_users"  -> (q7DistinctUsers _),
    "q8_top_per_group"   -> (q8TopPerGroup _),
    "q9_colocated_join"  -> (q9ColocatedJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_revenue_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q5_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q6_anti_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 45.0)
        |ORDER BY p_partkey""".stripMargin,
    "q7_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_top_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
        |  FROM part) t
        |WHERE rk <= 2 ORDER BY p_brand, rk""".stripMargin,
    "q9_colocated_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
