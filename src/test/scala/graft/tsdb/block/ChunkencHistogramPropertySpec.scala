package graft.tsdb.block

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.tsdb.block.{ChunkencHistogram => CH}

/** Randomized bit-losslessness for the chunkenc histogram codecs
  * (encodings 2/3): random bucket layouts, sample counts and
  * adversarial field values — magnitudes spread across every varbit
  * bucket boundary, NaN / ±0.0 / ±Inf / raw-pattern sums, zero and
  * repeated timestamps deltas — must roundtrip encode→decode
  * bit-exactly. Fixed seeds keep failures reproducible.
  */
class ChunkencHistogramPropertySpec extends AnyFunSuite {

  private def raw(d: Double) = java.lang.Double.doubleToRawLongBits(d)

  // magnitudes that straddle every varbit payload width
  private val longGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-4L, 4L),
    Gen.chooseNum(-40L, 40L),
    Gen.chooseNum(-300L, 300L),
    Gen.chooseNum(-3000L, 3000L),
    Gen.chooseNum(-200000L, 200000L),
    Gen.chooseNum(-20000000L, 20000000L),
    Gen.chooseNum(-(1L << 57), 1L << 57),
    Gen.oneOf(Long.MinValue + 1, Long.MaxValue, 0L))

  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 1e300),
    Gen.long.map(java.lang.Double.longBitsToDouble))

  private val spansGen: Gen[Vector[CH.Span]] =
    Gen.chooseNum(0, 8).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(-25, 45)).map(is =>
        CH.spansFromIndexes(is.distinct.sorted.toArray)))

  private def tsGen(n: Int): Gen[Array[Long]] =
    Gen.listOfN(n,
      Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, 90000L),
        Gen.chooseNum(1L, 1L << 40)))
      .map(_.scanLeft(1704067200000L)(_ + _).tail.toArray)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("integer histogram chunks roundtrip bit-lossless on random content") {
    for (trial <- 0 until 30) {
      val pos = sample(spansGen, 10L + trial)
      val neg = sample(spansGen, 500L + trial)
      val nPos = pos.map(_.length).sum
      val nNeg = neg.map(_.length).sum
      val n = sample(Gen.chooseNum(1, 50), 900L + trial)
      val c = CH.HistChunk(
        flags = sample(Gen.oneOf(CH.UnknownCounterReset, CH.CounterReset,
          CH.NotCounterReset, CH.GaugeType), 20L + trial),
        schema = sample(Gen.chooseNum(-4, 8), 30L + trial),
        zeroThreshold = sample(Gen.oneOf(Gen.const(0.0),
          Gen.chooseNum(-240, 10).map(e => math.scalb(0.5, e + 1)),
          Gen.chooseNum(1e-10, 2.0)), 40L + trial),
        posSpans = pos, negSpans = neg,
        ts = sample(tsGen(n), 50L + trial),
        count = sample(Gen.listOfN(n, longGen.map(_.abs)), 60L + trial).toArray,
        zeroCount = sample(Gen.listOfN(n, longGen.map(_.abs)), 70L + trial).toArray,
        sum = sample(Gen.listOfN(n, doubleGen), 80L + trial).toArray,
        posBuckets = Array.tabulate(n)(i =>
          sample(Gen.listOfN(nPos, longGen), 100L * trial + i).toArray),
        negBuckets = Array.tabulate(n)(i =>
          sample(Gen.listOfN(nNeg, longGen), 7000L * trial + i).toArray))
      val d = CH.decodeHistChunk(CH.encodeHistChunk(c), 0,
        CH.encodeHistChunk(c).length)
      assert(d.flags == c.flags && d.schema == c.schema &&
        raw(d.zeroThreshold) == raw(c.zeroThreshold), s"trial $trial header")
      assert(d.posSpans == c.posSpans && d.negSpans == c.negSpans)
      assert(d.ts.toSeq == c.ts.toSeq, s"trial $trial ts")
      assert(d.count.toSeq == c.count.toSeq, s"trial $trial count")
      assert(d.zeroCount.toSeq == c.zeroCount.toSeq)
      assert(d.sum.map(raw).toSeq == c.sum.map(raw).toSeq, s"trial $trial sum")
      assert(d.posBuckets.map(_.toSeq).toSeq == c.posBuckets.map(_.toSeq).toSeq,
        s"trial $trial posBuckets")
      assert(d.negBuckets.map(_.toSeq).toSeq == c.negBuckets.map(_.toSeq).toSeq)
    }
  }

  test("float histogram chunks roundtrip bit-lossless on random content") {
    for (trial <- 0 until 30) {
      val pos = sample(spansGen, 11L + trial)
      val neg = sample(spansGen, 501L + trial)
      val nPos = pos.map(_.length).sum
      val nNeg = neg.map(_.length).sum
      val n = sample(Gen.chooseNum(1, 40), 901L + trial)
      val c = CH.FloatHistChunk(
        flags = sample(Gen.oneOf(CH.UnknownCounterReset, CH.GaugeType),
          21L + trial),
        schema = sample(Gen.chooseNum(-4, 8), 31L + trial),
        zeroThreshold = sample(Gen.oneOf(Gen.const(0.0),
          Gen.chooseNum(1e-10, 2.0)), 41L + trial),
        posSpans = pos, negSpans = neg,
        ts = sample(tsGen(n), 51L + trial),
        count = sample(Gen.listOfN(n, doubleGen), 61L + trial).toArray,
        zeroCount = sample(Gen.listOfN(n, doubleGen), 71L + trial).toArray,
        sum = sample(Gen.listOfN(n, doubleGen), 81L + trial).toArray,
        posBuckets = Array.tabulate(n)(i =>
          sample(Gen.listOfN(nPos, doubleGen), 101L * trial + i).toArray),
        negBuckets = Array.tabulate(n)(i =>
          sample(Gen.listOfN(nNeg, doubleGen), 7001L * trial + i).toArray))
      val enc = CH.encodeFloatHistChunk(c)
      val d = CH.decodeFloatHistChunk(enc, 0, enc.length)
      assert(d.flags == c.flags && d.schema == c.schema &&
        raw(d.zeroThreshold) == raw(c.zeroThreshold), s"trial $trial header")
      assert(d.posSpans == c.posSpans && d.negSpans == c.negSpans)
      assert(d.ts.toSeq == c.ts.toSeq, s"trial $trial ts")
      assert(d.count.map(raw).toSeq == c.count.map(raw).toSeq)
      assert(d.zeroCount.map(raw).toSeq == c.zeroCount.map(raw).toSeq)
      assert(d.sum.map(raw).toSeq == c.sum.map(raw).toSeq)
      assert(d.posBuckets.map(_.map(raw).toSeq).toSeq ==
        c.posBuckets.map(_.map(raw).toSeq).toSeq, s"trial $trial posBuckets")
      assert(d.negBuckets.map(_.map(raw).toSeq).toSeq ==
        c.negBuckets.map(_.map(raw).toSeq).toSeq)
    }
  }
}
