package graft

import graft.sketch.Hdr
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests with a seeded generator (the offline cache has
  * no scalatest↔scalacheck bridge, so sampling is hand-rolled).
  */
class HdrSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  /** Mixed-zone value generator: unit-resolution, multi-bucket, and the
    * full reference range (36_000_000 = 1h in ms). */
  private def genValue(): Long = rnd.nextInt(3) match {
    case 0 => rnd.nextInt(2048).toLong
    case 1 => rnd.nextInt(100000).toLong
    case _ => (rnd.nextDouble() * 36000000L).toLong
  }

  private def genValues(n: Int): Seq[Long] = Seq.fill(n)(genValue())

  /** Brute-force oracle for the sketch's percentile rule. */
  private def expectedPercentile(values: Seq[Long], p: Double): Long = {
    val sorted = values.sorted
    val threshold = math.max(1L, (p / 100.0 * sorted.length + 0.5).toLong)
    Hdr.highestEquivalentValue(sorted((threshold - 1).toInt))
  }

  test("index math round-trips and brackets every value") {
    val probes = Seq(0L, 1L, 2L, 1023L, 1024L, 2047L, 2048L, 2049L, 4095L,
      4096L, 36000000L, (1L << 40) - 1) ++ Seq.fill(5000)(math.abs(rnd.nextLong()) % (1L << 40))
    probes.foreach { v =>
      val idx = Hdr.countsIndex(v)
      val lo = Hdr.lowestEquivalentValue(v)
      val hi = Hdr.highestEquivalentValue(v)
      assert(lo <= v && v <= hi, s"v=$v lo=$lo hi=$hi")
      assert(Hdr.valueFromIndex(idx) == lo, s"v=$v idx=$idx")
      if (v >= 2048)
        assert((hi - lo + 1).toDouble / v <= 1.0 / 1024 + 1e-12, s"v=$v width=${hi - lo + 1}")
      else assert(hi == v && lo == v, s"v=$v")
    }
  }

  test("percentiles match brute force under the cumulative-count rule") {
    (1 to 200).foreach { _ =>
      val values = genValues(1 + rnd.nextInt(500))
      val h = Hdr.empty
      values.foreach(h.record(_))
      for (p <- Seq(0.1, 25.0, 50.0, 80.0, 90.0, 95.0, 99.0, 99.9, 100.0))
        assert(h.valueAtPercentile(p) == expectedPercentile(values, p), s"p=$p n=${values.size}")
      assert(h.min == values.min && h.max == values.max)
      assert(h.totalCount == values.length && h.sum == values.sum)
    }
  }

  test("merge is associative and order-independent (serialized equality)") {
    (1 to 100).foreach { _ =>
      val chunks = Seq.fill(3)(genValues(rnd.nextInt(200)))
      val flat = Hdr.empty
      chunks.flatten.foreach(flat.record(_))
      val parts = chunks.map { c => val h = Hdr.empty; c.foreach(h.record(_)); h }
      val leftFold = Hdr.empty
      parts.foreach(leftFold.add)
      val revFold = Hdr.empty
      parts.reverse.foreach(revFold.add)
      assert(java.util.Arrays.equals(leftFold.serialize(), flat.serialize()))
      assert(java.util.Arrays.equals(revFold.serialize(), flat.serialize()))
    }
  }

  test("serialization round-trips") {
    (1 to 100).foreach { _ =>
      val values = genValues(rnd.nextInt(300))
      val h = Hdr.empty
      values.foreach(h.record(_))
      val back = Hdr.deserialize(h.serialize())
      assert(back.totalCount == h.totalCount && back.sum == h.sum)
      assert(back.min == h.min && back.max == h.max)
      assert(java.util.Arrays.equals(back.serialize(), h.serialize()))
      for (p <- Seq(50.0, 99.0))
        assert(back.valueAtPercentile(p) == h.valueAtPercentile(p))
    }
  }

  test("empty histogram is well-defined") {
    val h = Hdr.empty
    assert(h.totalCount == 0 && h.min == 0 && h.max == 0 && h.meanLong == 0)
    assert(h.valueAtPercentile(99.0) == 0)
    val back = Hdr.deserialize(h.serialize())
    assert(back.totalCount == 0 && back.isEmpty)
  }

  test("sketch of a typical latency distribution stays small") {
    val h = Hdr.empty
    (1 to 100000).foreach(_ => h.record(math.abs(rnd.nextGaussian() * 5000).toLong))
    // ~4000 occupied 0.1%-resolution slots over a 0..25k spread, ~2.5 B
    // per slot varint-encoded — bounded regardless of input row count
    assert(h.serialize().length < 16384)
  }
}
