package graft.ops

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Bucketed-table layout management: pre-shuffled, co-located storage
  * for a corpus' hottest equi-join keys. A join between two tables
  * bucketed (and sorted) on the join key runs as a sort-merge join with
  * NO exchange and NO sort — at 100 TB the difference between
  * re-shuffling the fact table on every join and reading co-located
  * buckets. This is the storage-side dual of the query-side patterns
  * elsewhere in this engine (broadcast for small dims, salting for
  * skew): pay the shuffle once at write time, amortize it over every
  * subsequent join.
  *
  * Bucket metadata lives in the session catalog (in production, a Hive
  * metastore; in local runs, Spark's in-memory catalog), so tables are
  * (re)written once per session and reused by every query in it.
  */
object Bucketing {

  val Buckets = 8

  /** Ensure bucketed `lineitem`/`orders` tables for `dir` exist in the
    * session catalog, both bucketed+sorted on the order key; returns
    * their table names. The `repartition(buckets, key)` before the
    * write makes each bucket exactly one file. The sortBy layout buys
    * row-group min/max pruning and better encodings always, and an
    * entirely sort-free merge join when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is enabled
    * (Spark 3+ otherwise re-sorts per bucket — a spill-bounded local
    * sort, not an exchange). */
  def ensureOrderTables(spark: SparkSession, dir: String,
                        buckets: Int = Buckets): (String, String) = synchronized {
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    val li = s"graft_bkt_lineitem_$tag"
    val ord = s"graft_bkt_orders_$tag"
    // the warehouse dir outlives the in-memory catalog: a fresh session
    // sees tableExists = false while the previous JVM's files still sit
    // at the managed location (CREATE would fail LOCATION_ALREADY_EXISTS).
    // The layout is a rebuildable cache, so sweep the stale tree.
    def sweepStale(table: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    if (!spark.catalog.tableExists(li)) {
      sweepStale(li)
      Tables.lineitem(spark, dir)
        .repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable(li)
    }
    if (!spark.catalog.tableExists(ord)) {
      sweepStale(ord)
      Tables.orders(spark, dir)
        .repartition(buckets, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable(ord)
    }
    (li, ord)
  }
}
