package graft.sketch

import java.io.ByteArrayOutputStream

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
  * relative error. Two representations:
  *  - **sparse** (≤ 32 distinct slots): parallel (slotIndex, count)
  *    arrays. This is the dominant regime in a rollup cascade — a 5 s
  *    ingest group holds a handful of values, and sizing the dense
  *    array for one large value would allocate tens of KB per group
  *    (the index scale is logarithmic in the value, ~9 K slots for
  *    values near 2×10^5). The raw tier at scale is mostly singleton
  *    sketches; sparse keeps record/merge/deserialize allocation at
  *    tens of bytes instead.
  *  - **dense** (> 32 distinct slots): the classic HDR counts array,
  *    auto-resized, O(1) record.
  * Serialized form is identical for both (sparse varint pairs) —
  * "order of a few hundred bytes" for typical latency distributions,
  * which is what makes a 100 TB rollup cascade feasible.
  */
final class Hdr private (
    private var counts: Array[Long],  // dense slots; empty while sparse
    private var dense: Boolean,
    private var pIdx: Array[Int],     // sparse slot indexes (unordered, unique)
    private var pCnt: Array[Long],    // sparse slot counts
    private var nPending: Int,
    var totalCount: Long,
    var minValue: Long,   // exact; Long.MaxValue when empty
    var maxValue: Long,   // exact; -1 when empty
    var sum: Long) extends Serializable {

  def this() = this(Array.emptyLongArray, false, null, null, 0,
    0L, Long.MaxValue, -1L, 0L)

  import Hdr._

  def isEmpty: Boolean = totalCount == 0

  /** Record `n` occurrences of `value` (negative values are the caller's
    * responsibility to skip, matching the reference's ingest rule). */
  def record(value: Long, n: Long = 1L): Unit = {
    require(value >= 0, s"negative value $value")
    addSlot(countsIndex(value), n)
    totalCount += n
    sum += value * n
    if (value < minValue) minValue = value
    if (value > maxValue) maxValue = value
  }

  private def addSlot(idx: Int, n: Long): Unit = {
    if (dense) {
      if (idx >= counts.length) grow(idx + 1)
      counts(idx) += n
    } else {
      var i = 0
      while (i < nPending) {
        if (pIdx(i) == idx) { pCnt(i) += n; return }
        i += 1
      }
      if (nPending < SparseSlots) {
        if (pIdx == null) { pIdx = new Array[Int](SparseSlots); pCnt = new Array[Long](SparseSlots) }
        pIdx(nPending) = idx
        pCnt(nPending) = n
        nPending += 1
      } else {
        densify(idx + 1)
        counts(idx) += n
      }
    }
  }

  private def densify(alsoFit: Int): Unit = {
    var needed = alsoFit
    var i = 0
    while (i < nPending) { if (pIdx(i) + 1 > needed) needed = pIdx(i) + 1; i += 1 }
    counts = new Array[Long](((needed + 255) >> 8) << 8)
    i = 0
    while (i < nPending) { counts(pIdx(i)) += pCnt(i); i += 1 }
    dense = true
    pIdx = null
    pCnt = null
    nPending = 0
  }

  /** Merge another histogram into this one (associative + commutative:
    * the property the rollup cascade relies on). */
  def add(other: Hdr): Unit = {
    if (other.dense) {
      if (!dense) densify(other.counts.length)
      else if (other.counts.length > counts.length) grow(other.counts.length)
      var i = 0
      while (i < other.counts.length) {
        val c = other.counts(i)
        if (c != 0) counts(i) += c
        i += 1
      }
    } else {
      var i = 0
      while (i < other.nPending) {
        addSlot(other.pIdx(i), other.pCnt(i))
        i += 1
      }
    }
    totalCount += other.totalCount
    sum += other.sum
    if (other.minValue < minValue) minValue = other.minValue
    if (other.maxValue > maxValue) maxValue = other.maxValue
  }

  private def grow(needed: Int): Unit = {
    // 256-slot granularity: a typical dense histogram's slot span grows
    // logarithmically, so rounding up in pages keeps re-allocations rare
    val len = ((needed + 255) >> 8) << 8
    counts = java.util.Arrays.copyOf(counts, len)
  }

  /** (ascending slot index, count) pairs — sorts the sparse buffer in
    * place; dense arrays iterate as-is. */
  private def sortPending(): Unit = {
    // insertion sort: ≤ 32 elements, usually already nearly ordered
    var i = 1
    while (i < nPending) {
      val vi = pIdx(i); val ci = pCnt(i)
      var j = i - 1
      while (j >= 0 && pIdx(j) > vi) {
        pIdx(j + 1) = pIdx(j); pCnt(j + 1) = pCnt(j); j -= 1
      }
      pIdx(j + 1) = vi; pCnt(j + 1) = ci
      i += 1
    }
  }

  /** Value at percentile p (0..100]: smallest quantized value whose
    * cumulative count reaches round(p/100 * totalCount), reported as the
    * highest value equivalent to that bucket — the standard HDR rule. */
  def valueAtPercentile(p: Double): Long = {
    if (totalCount == 0) return 0L
    val requested = math.min(p, 100.0)
    val countAt = math.max(1L, (requested / 100.0 * totalCount + 0.5).toLong)
    var cum = 0L
    if (dense) {
      var i = 0
      while (i < counts.length) {
        cum += counts(i)
        if (cum >= countAt) return highestEquivalentValue(valueFromIndex(i))
        i += 1
      }
    } else {
      sortPending()
      var i = 0
      while (i < nPending) {
        cum += pCnt(i)
        if (cum >= countAt) return highestEquivalentValue(valueFromIndex(pIdx(i)))
        i += 1
      }
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
    * logical histogram (indexes ascending) regardless of representation. */
  def serialize(): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    out.write(1) // version
    writeVarLong(out, totalCount)
    writeVarLong(out, if (totalCount == 0) 0L else minValue)
    writeVarLong(out, if (totalCount == 0) 0L else maxValue)
    writeVarLong(out, sum)
    if (dense) {
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
    } else {
      sortPending()
      writeVarLong(out, nPending.toLong)
      var prev = 0
      var i = 0
      while (i < nPending) {
        writeVarLong(out, (pIdx(i) - prev).toLong)
        writeVarLong(out, pCnt(i))
        prev = pIdx(i)
        i += 1
      }
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
  /** Distinct-slot threshold below which a sketch stays sparse. */
  final val SparseSlots = 32

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
    val h = new Hdr()
    if (n <= SparseSlots) {
      if (n > 0) { h.pIdx = new Array[Int](SparseSlots); h.pCnt = new Array[Long](SparseSlots) }
      var idx = 0
      var k = 0
      while (k < n) {
        idx += in.readVarLong().toInt
        h.pIdx(k) = idx
        h.pCnt(k) = in.readVarLong()
        k += 1
      }
      h.nPending = n
    } else {
      // sized once from the (ascending) final index — no re-growth
      var idx = 0
      val idxs = new Array[Int](n)
      val cnts = new Array[Long](n)
      var k = 0
      while (k < n) {
        idx += in.readVarLong().toInt
        idxs(k) = idx
        cnts(k) = in.readVarLong()
        k += 1
      }
      h.counts = new Array[Long](((idx + 1 + 255) >> 8) << 8)
      h.dense = true
      k = 0
      while (k < n) { h.counts(idxs(k)) = cnts(k); k += 1 }
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
