package graft.sketch

import java.io.{ByteArrayOutputStream}

/** A mergeable high-dynamic-range histogram of non-negative Longs with
  * 3 significant decimal digits of value precision — the engine's core
  * sketch, re-derived from the public HDR histogram bucketing scheme.
  *
  * Semantics follow the reference engine's histogram bucket
  * (reference: khronus-core/src/main/scala/com/searchlight/khronus/model/
  * HistogramBucket.scala:28-94 — merge = add counts; percentiles from the
  * merged histogram, never averaged), with two deliberate upgrades:
  * min/max/sum are tracked exactly (the reference quantizes them), so
  * summary min/max/mean are exact while percentiles carry the sketch's
  * 0.1% quantization.
  *
  * Layout: values are bucketed in power-of-two ranges, each range split
  * into 1024 sub-buckets (2048 for the lowest range), giving ≤ 2^-10
  * relative error. The counts array grows on demand (auto-resize), so a
  * sketch of small values stays small; serialized form is sparse
  * varint-encoded — "order of a few hundred bytes" for typical latency
  * distributions, which is what makes a 100 TB rollup cascade feasible:
  * each (metric, bucket) partial is a few hundred bytes regardless of
  * row count.
  */
final class Hdr private (
    private var counts: Array[Long],
    var totalCount: Long,
    var minValue: Long,   // exact; Long.MaxValue when empty
    var maxValue: Long,   // exact; -1 when empty
    var sum: Long) extends Serializable {

  def this() = this(Array.emptyLongArray, 0L, Long.MaxValue, -1L, 0L)

  import Hdr._

  def isEmpty: Boolean = totalCount == 0

  /** Record `n` occurrences of `value` (negative values are the caller's
    * responsibility to skip, matching the reference's ingest rule). */
  def record(value: Long, n: Long = 1L): Unit = {
    require(value >= 0, s"negative value $value")
    val idx = countsIndex(value)
    if (idx >= counts.length) grow(idx + 1)
    counts(idx) += n
    totalCount += n
    sum += value * n
    if (value < minValue) minValue = value
    if (value > maxValue) maxValue = value
  }

  /** Merge another histogram into this one (associative + commutative:
    * the property the rollup cascade relies on). */
  def add(other: Hdr): Unit = {
    if (other.counts.length > counts.length) grow(other.counts.length)
    var i = 0
    while (i < other.counts.length) {
      val c = other.counts(i)
      if (c != 0) counts(i) += c
      i += 1
    }
    totalCount += other.totalCount
    sum += other.sum
    if (other.minValue < minValue) minValue = other.minValue
    if (other.maxValue > maxValue) maxValue = other.maxValue
  }

  private def grow(needed: Int): Unit = {
    // 256-slot granularity: a typical 5 s ingest bucket holds a handful
    // of small values, so right-sizing (vs a fixed 2048-slot array)
    // cuts per-group allocation ~8x in the rollup cascade
    val len = ((needed + 255) >> 8) << 8
    counts = java.util.Arrays.copyOf(counts, len)
  }

  /** Value at percentile p (0..100]: smallest quantized value whose
    * cumulative count reaches round(p/100 * totalCount), reported as the
    * highest value equivalent to that bucket — the standard HDR rule. */
  def valueAtPercentile(p: Double): Long = {
    if (totalCount == 0) return 0L
    val requested = math.min(p, 100.0)
    val countAt = math.max(1L, (requested / 100.0 * totalCount + 0.5).toLong)
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= countAt) return highestEquivalentValue(valueFromIndex(i))
      i += 1
    }
    maxValue
  }

  /** Round-half-up integer mean over exact sum/count. */
  def meanLong: Long =
    if (totalCount == 0) 0L else (2 * sum + totalCount) / (2 * totalCount)

  def mean: Double = if (totalCount == 0) 0.0 else sum.toDouble / totalCount

  def min: Long = if (totalCount == 0) 0L else minValue
  def max: Long = if (totalCount == 0) 0L else maxValue

  /** Sparse serialized form:
    * [version:1][totalCount,min,max,sum: varints][nSlots: varint]
    * [(indexDelta, count): varints]*  — deterministic for a given
    * logical histogram (indexes ascending). */
  def serialize(): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    out.write(1) // version
    writeVarLong(out, totalCount)
    writeVarLong(out, if (totalCount == 0) 0L else minValue)
    writeVarLong(out, if (totalCount == 0) 0L else maxValue)
    writeVarLong(out, sum)
    var n = 0
    var i = 0
    while (i < counts.length) { if (counts(i) != 0) n += 1; i += 1 }
    writeVarLong(out, n.toLong)
    var prev = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) != 0) {
        writeVarLong(out, (i - prev).toLong)
        writeVarLong(out, counts(i))
        prev = i
      }
      i += 1
    }
    out.toByteArray
  }
}

object Hdr {
  // 3 significant decimal digits → 2 * 10^3 rounded up to a power of two
  final val SubBucketHalfCountMagnitude = 10
  final val SubBucketCount = 1 << (SubBucketHalfCountMagnitude + 1) // 2048
  final val SubBucketHalfCount = SubBucketCount / 2                 // 1024
  final val SubBucketMask = (SubBucketCount - 1).toLong             // 2047

  def empty: Hdr = new Hdr()

  def bucketIndexOf(value: Long): Int =
    (64 - 1 - SubBucketHalfCountMagnitude) - java.lang.Long.numberOfLeadingZeros(value | SubBucketMask)

  def countsIndex(value: Long): Int = {
    val bi = bucketIndexOf(value)
    val sbi = (value >>> bi).toInt
    ((bi + 1) << SubBucketHalfCountMagnitude) + (sbi - SubBucketHalfCount)
  }

  def valueFromIndex(index: Int): Long = {
    var bi = (index >> SubBucketHalfCountMagnitude) - 1
    var sbi = (index & (SubBucketHalfCount - 1)) + SubBucketHalfCount
    if (bi < 0) { sbi -= SubBucketHalfCount; bi = 0 }
    sbi.toLong << bi
  }

  def lowestEquivalentValue(value: Long): Long = {
    val bi = bucketIndexOf(value)
    (value >>> bi) << bi
  }

  def highestEquivalentValue(value: Long): Long =
    lowestEquivalentValue(value) + (1L << bucketIndexOf(value)) - 1

  def deserialize(bytes: Array[Byte]): Hdr = {
    val in = new VarIn(bytes)
    val version = in.readByte()
    require(version == 1, s"unknown sketch version $version")
    val total = in.readVarLong()
    val mn = in.readVarLong()
    val mx = in.readVarLong()
    val sm = in.readVarLong()
    val n = in.readVarLong().toInt
    val h = new Hdr(Array.emptyLongArray, 0L, Long.MaxValue, -1L, 0L)
    var idx = 0
    var k = 0
    while (k < n) {
      idx += in.readVarLong().toInt
      val c = in.readVarLong()
      if (idx >= h.counts.length) h.grow(idx + 1)
      h.counts(idx) = c
      k += 1
    }
    h.totalCount = total
    h.sum = sm
    h.minValue = if (total == 0) Long.MaxValue else mn
    h.maxValue = if (total == 0) -1L else mx
    h
  }

  private[sketch] def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private final class VarIn(bytes: Array[Byte]) {
    private var pos = 0
    def readByte(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def readVarLong(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = readByte()
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
  }
}
