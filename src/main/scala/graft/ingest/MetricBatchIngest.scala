package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side parsing of the HTTP JSON `MetricBatch` payload
  * (reference: model/MetricMeasurement.scala:42-52; wire shape in
  * FIXTURES.md §1):
  *
  * {"metrics":[{"name":"n","mtype":"timer",
  *   "measurements":[{"ts":1418394322000,"values":[133]}]}]}
  *
  * Semantics preserved:
  *  - fractional values coerced to Long (floor)
  *  - negative values skipped (reference:
  *    store/MetricMeasurementStore.scala:122-127)
  *  - unknown mtype dropped (reference: :49-53)
  *  - missing ts defaults to server time (reference: :40-44) —
  *    injectable for determinism
  */
object MetricBatchIngest {

  val ValidTypes: Seq[String] = Seq("timer", "gauge", "counter")

  val batchSchema: StructType = StructType(Seq(
    StructField("metrics", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("mtype", StringType),
      StructField("measurements", ArrayType(StructType(Seq(
        StructField("ts", LongType),
        StructField("values", ArrayType(DoubleType))))))))))))

  /** JSON lines column → measurements (metric, mtype, ts_ms, value:Long).
    * Works identically on batch and streaming DataFrames. */
  def parse(jsonLines: DataFrame, jsonCol: String = "value",
            defaultTs: () => Long = () => System.currentTimeMillis()): DataFrame = {
    jsonLines
      .select(from_json(col(jsonCol), batchSchema).as("b"))
      .select(explode(col("b.metrics")).as("m"))
      .select(col("m.name").as("metric"), col("m.mtype").as("mtype"),
        explode(col("m.measurements")).as("mm"))
      .where(col("mtype").isInCollection(ValidTypes)) // unknown type → drop
      .select(col("metric"), col("mtype"),
        coalesce(col("mm.ts"), lit(defaultTs())).as("ts_ms"),
        explode(col("mm.values")).as("v"))
      .where(col("v") >= 0) // negative values skipped
      .select(col("metric"), col("mtype"), col("ts_ms"),
        floor(col("v")).cast("long").as("value"))
  }
}
