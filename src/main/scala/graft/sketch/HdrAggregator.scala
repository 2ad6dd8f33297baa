package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset-API alternative to [[HdrSketchAgg]] (SURVEY §2.10):
  * `ds.groupByKey(...).agg(HdrAggregator.sketch.toColumn)` for callers
  * who want compile-time row types instead of Column expressions. Same
  * sketch, same serialized form — outputs are interchangeable with the
  * Catalyst aggregate's.
  */
object HdrAggregator {

  /** Aggregate raw Long values into a serialized sketch. */
  val sketch: Aggregator[Long, Hdr, Array[Byte]] =
    new Aggregator[Long, Hdr, Array[Byte]] {
      def zero: Hdr = Hdr.empty
      def reduce(b: Hdr, v: Long): Hdr = { if (v >= 0) b.record(v); b }
      def merge(a: Hdr, b: Hdr): Hdr = { a.add(b); a }
      def finish(h: Hdr): Array[Byte] = h.serialize()
      def bufferEncoder: Encoder[Hdr] = Encoders.javaSerialization[Hdr]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Merge serialized sketches (tier k-1 → tier k, typed). */
  val merge: Aggregator[Array[Byte], Hdr, Array[Byte]] =
    new Aggregator[Array[Byte], Hdr, Array[Byte]] {
      def zero: Hdr = Hdr.empty
      def reduce(b: Hdr, bytes: Array[Byte]): Hdr = {
        if (bytes != null && bytes.nonEmpty) b.add(Hdr.deserialize(bytes)); b
      }
      def merge(a: Hdr, b: Hdr): Hdr = { a.add(b); a }
      def finish(h: Hdr): Array[Byte] = h.serialize()
      def bufferEncoder: Encoder[Hdr] = Encoders.javaSerialization[Hdr]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
}
