package graft

import graft.sketch.Hdr
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the engine's core thesis: percentiles are
  * computed by merging histograms, never by averaging percentiles
  * (reference README.md:23) — so sketching a union must equal merging
  * per-part sketches, for ANY split, any value distribution, and
  * across the sparse↔dense representation boundary.
  */
class HdrPropertySpec extends AnyFunSuite {

  /** Deterministic forAll: scalacheck generators driven by fixed seeds
    * (the scalatest-scalacheck bridge isn't on the classpath; explicit
    * seeds also make every failure reproducible by construction). */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 200)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val values: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 200)
    // mixed magnitudes: unit-resolution zone, quantized zone, huge
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(0L, 100L),
      Gen.chooseNum(0L, 5000L),
      Gen.chooseNum(0L, 10000000L)))
  } yield vs

  private def sketchOf(vs: Seq[Long]): Hdr = {
    val h = Hdr.empty
    vs.foreach(h.record(_))
    h
  }

  test("merge of any split equals the sketch of the union (bytes + percentiles)") {
    forAllSeeded(Gen.zip(values, Gen.chooseNum(0, 100))) { case (vs, cut) =>
      val k = if (vs.isEmpty) 0 else cut % (vs.size + 1)
      val (a, b) = vs.splitAt(k)
      val merged = sketchOf(a)
      merged.add(sketchOf(b))
      val direct = sketchOf(vs)
      assert(merged.serialize().toSeq == direct.serialize().toSeq)
      for (p <- Seq(50.0, 80.0, 90.0, 95.0, 99.0, 99.9))
        assert(merged.valueAtPercentile(p) == direct.valueAtPercentile(p))
      assert(merged.totalCount == direct.totalCount)
      assert(merged.min == direct.min && merged.max == direct.max)
      assert(merged.meanLong == direct.meanLong)
    }
  }

  test("serialization round-trips across the sparse/dense boundary") {
    forAllSeeded(values) { vs =>
      val h = sketchOf(vs)
      val back = Hdr.deserialize(h.serialize())
      assert(back.serialize().toSeq == h.serialize().toSeq)
      for (p <- Seq(50.0, 99.0))
        assert(back.valueAtPercentile(p) == h.valueAtPercentile(p))
    }
  }

  test("merge order never matters (commutativity over three parts)") {
    forAllSeeded(Gen.zip(values, values, values)) { case (a, b, c) =>
      val abc = sketchOf(a); abc.add(sketchOf(b)); abc.add(sketchOf(c))
      val cba = sketchOf(c); cba.add(sketchOf(b)); cba.add(sketchOf(a))
      assert(abc.serialize().toSeq == cba.serialize().toSeq)
    }
  }

  test("percentile matches the cumulative-count oracle rule on exact values") {
    // below 2048 the sketch has unit resolution: percentile must equal
    // the oracle's smallest-value-reaching-rank rule exactly
    forAllSeeded(Gen.nonEmptyListOf(Gen.chooseNum(0L, 2047L))) { vs =>
      val h = sketchOf(vs)
      val sorted = vs.sorted
      for (p <- Seq(50.0, 90.0, 99.0)) {
        val rank = math.max(1, (p / 100.0 * vs.size + 0.5).toInt)
        assert(h.valueAtPercentile(p) == sorted(rank - 1))
      }
    }
  }
}
