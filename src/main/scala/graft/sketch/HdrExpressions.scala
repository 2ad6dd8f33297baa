package graft.sketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `hdr_sketch(longCol)` / `hdr_merge(binaryCol)` — the engine's core
  * custom Catalyst aggregate (SURVEY §2.4 A1/A6): builds/merges an
  * [[Hdr]] sketch. Runs as ObjectHashAggregate with map-side partial
  * aggregation, so a 100 TB scan reduces to one few-hundred-byte buffer
  * per (metric, bucket) per partition before the shuffle.
  *
  * Negative inputs are skipped, matching the reference ingest rule
  * (reference: store/MetricMeasurementStore.scala:122-127).
  */
case class HdrSketchAgg(
    child: Expression,
    fromSketches: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Hdr] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Hdr = Hdr.empty

  override def update(buffer: Hdr, input: InternalRow): Hdr = {
    val v = child.eval(input)
    if (v != null) {
      if (fromSketches) {
        val bytes = v.asInstanceOf[Array[Byte]]
        if (bytes.nonEmpty) buffer.add(Hdr.deserialize(bytes))
      } else {
        val l = v.asInstanceOf[Long]
        if (l >= 0) buffer.record(l)
      }
    }
    buffer
  }

  override def merge(b1: Hdr, b2: Hdr): Hdr = { b1.add(b2); b1 }

  override def eval(buffer: Hdr): Any = buffer.serialize()

  override def serialize(buffer: Hdr): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): Hdr =
    Hdr.deserialize(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = if (fromSketches) "hdr_merge" else "hdr_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HdrSketchAgg =
    copy(child = newChild)
}

/** `hdr_summary(sketch)` → struct(count, min, max, mean, p50, p80, p90,
  * p95, p99, p999) — the reference's HistogramSummary row (reference:
  * model/HistogramSummary.scala:21), evaluated from a serialized sketch.
  * Runs on post-aggregation rows (one per metric×bucket), so
  * CodegenFallback costs nothing measurable.
  */
case class HdrSummaryExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = HdrSummaryExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "hdr_summary"

  override def nullSafeEval(input: Any): Any = {
    val h = Hdr.deserialize(input.asInstanceOf[Array[Byte]])
    InternalRow(
      h.totalCount, h.min, h.max, h.meanLong,
      h.valueAtPercentile(50), h.valueAtPercentile(80),
      h.valueAtPercentile(90), h.valueAtPercentile(95),
      h.valueAtPercentile(99), h.valueAtPercentile(99.9))
  }

  override protected def withNewChildInternal(newChild: Expression): HdrSummaryExpr =
    copy(child = newChild)
}

object HdrSummaryExpr {
  val fields: Seq[String] =
    Seq("count", "min", "max", "mean", "p50", "p80", "p90", "p95", "p99", "p999")
  val schema: StructType =
    StructType(fields.map(f => StructField(f, LongType, nullable = false)))
}

/** `hdr_percentiles(sketch, array(p...))` → array of values (Long). */
case class HdrPercentilesExpr(child: Expression, percentiles: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hdr_percentiles"

  override def nullSafeEval(input: Any): Any = {
    val h = Hdr.deserialize(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(percentiles.map(h.valueAtPercentile).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): HdrPercentilesExpr =
    copy(child = newChild)
}
