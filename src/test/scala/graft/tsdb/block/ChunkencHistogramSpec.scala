package graft.tsdb.block

import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.ChunkCodec.{BitReader, BitWriter}
import ChunkencHistogram._

/** Bit-level pins for the chunkenc histogram chunk layout
  * (encodings 2/3) — varbit buckets at every boundary, the
  * zero-threshold byte forms, span↔index duality, and bit-lossless
  * chunk roundtrips including the hostile doubles (NaN payloads,
  * -0.0) and layouts with gaps and negative buckets. */
final class ChunkencHistogramSpec extends AnyFunSuite {

  private def rtInt(v: Long): Long = {
    val w = new BitWriter()
    putVarbitInt(w, v)
    readVarbitInt(new BitReader(w.toBytes, 0, w.toBytes.length))
  }

  private def rtUint(v: Long): Long = {
    val w = new BitWriter()
    putVarbitUint(w, v)
    readVarbitUint(new BitReader(w.toBytes, 0, w.toBytes.length))
  }

  test("varbit int roundtrips across every bucket boundary") {
    val edges = Seq(0L, 1L, -1L, 3L, -3L, 4L, 5L, -4L, 31L, -31L, 32L,
      33L, 255L, -255L, 256L, 257L, 2047L, -2047L, 2048L, 2049L,
      131071L, -131071L, 131072L, 131073L, 16777215L, -16777215L,
      16777216L, 16777217L, (1L << 55) - 1, 1L << 55, -((1L << 55) - 1),
      (1L << 55) + 1, Long.MaxValue, Long.MinValue, -1234567890123L)
    edges.foreach(v => assert(rtInt(v) === v, s"varbit int $v"))
  }

  test("varbit uint roundtrips across every bucket boundary") {
    val edges = Seq(0L, 1L, 7L, 8L, 63L, 64L, 511L, 512L, 4095L, 4096L,
      262143L, 262144L, 33554431L, 33554432L, (1L << 56) - 1, 1L << 56,
      Long.MaxValue, -1L /* 2^64-1 unsigned */)
    edges.foreach(v => assert(rtUint(v) === v, s"varbit uint $v"))
  }

  test("varbit int bucket sizes match the spec's bit budget") {
    // a lone value occupies ceil(bits/8) bytes in the bitstream
    def bytesOf(v: Long): Int = {
      val w = new BitWriter(); putVarbitInt(w, v); w.toBytes.length
    }
    assert(bytesOf(0L) === 1)            // 1 bit
    assert(bytesOf(4L) === 1)            // 2+3 bits
    assert(bytesOf(32L) === 2)           // 3+6 bits
    assert(bytesOf(256L) === 2)          // 4+9 bits
    assert(bytesOf(2048L) === 3)         // 5+12 bits
    assert(bytesOf(131072L) === 3)       // 6+18 bits
    assert(bytesOf(16777216L) === 4)     // 7+25 bits
    assert(bytesOf(1L << 55) === 8)      // 8+56 bits
    assert(bytesOf(Long.MaxValue) === 9) // 8+64 bits
  }

  test("zero threshold byte forms") {
    def rt(t: Double): (Double, Int) = {
      val w = new BitWriter()
      putZeroThreshold(w, t)
      val bytes = w.toBytes
      (readZeroThreshold(new BitReader(bytes, 0, bytes.length)),
        bytes.length)
    }
    assert(rt(0.0) === ((0.0, 1)))
    assert(rt(math.pow(2, -128)) === ((math.pow(2, -128), 1)))
    assert(rt(math.pow(2, -243)) === ((math.pow(2, -243), 1)))
    assert(rt(1024.0) === ((1024.0, 1)))          // 2^10: last 1-byte form
    assert(rt(2048.0) === ((2048.0, 9)))          // 2^11: raw escape
    assert(rt(math.pow(2, -244)) === ((math.pow(2, -244), 9)))
    assert(rt(0.3) === ((0.3, 9)))                // non-dyadic: raw
    assert(rt(1.0) === ((1.0, 1)))
  }

  test("spans expand to indexes and compact back") {
    val spans = Vector(Span(-3, 2), Span(2, 1))
    assert(bucketIndexes(spans).toSeq === Seq(-3, -2, 1))
    assert(spansFromIndexes(Array(-3, -2, 1)) === spans)
    assert(spansFromIndexes(Array(0, 1, 2)) === Vector(Span(0, 3)))
    assert(bucketIndexes(Vector.empty).toSeq === Seq.empty)
    assert(spansFromIndexes(Array.empty[Int]) === Vector.empty)
  }

  private def mkHist(flags: Int = UnknownCounterReset, schema: Int = 0,
      zeroThreshold: Double = 0.0): HistChunk = {
    val posSpans = Vector(Span(-2, 3), Span(2, 2)) // idx -2,-1,0,3,4
    val negSpans = Vector(Span(1, 2))              // idx 1,2
    val ts = Array(1704067200000L, 1704067215000L, 1704067230000L,
      1704067245123L)
    val n = ts.length
    val pos = Array.tabulate(n, 5)((i, j) => (i + 1L) * (j * j + 1L) * 3L)
    val neg = Array.tabulate(n, 2)((i, j) => (i + 1L) * (j + 2L))
    val zero = Array.tabulate(n)(i => 7L * i)
    val count = Array.tabulate(n)(i =>
      zero(i) + pos(i).sum + neg(i).sum)
    val sum = Array(1.5, 2.75, Double.NaN, -0.0)
    HistChunk(flags, schema, zeroThreshold, posSpans, negSpans,
      ts, count, zero, sum, pos, neg)
  }

  private def assertHistEqual(a: HistChunk, b: HistChunk): Unit = {
    assert(b.flags === a.flags)
    assert(b.schema === a.schema)
    assert(b.zeroThreshold === a.zeroThreshold)
    assert(b.posSpans === a.posSpans)
    assert(b.negSpans === a.negSpans)
    assert(b.ts.toSeq === a.ts.toSeq)
    assert(b.count.toSeq === a.count.toSeq)
    assert(b.zeroCount.toSeq === a.zeroCount.toSeq)
    assert(b.sum.map(java.lang.Double.doubleToRawLongBits).toSeq ===
      a.sum.map(java.lang.Double.doubleToRawLongBits).toSeq)
    assert(b.posBuckets.map(_.toSeq).toSeq === a.posBuckets.map(_.toSeq).toSeq)
    assert(b.negBuckets.map(_.toSeq).toSeq === a.negBuckets.map(_.toSeq).toSeq)
  }

  test("integer histogram chunk roundtrips bit-lossless") {
    val c = mkHist(flags = NotCounterReset, schema = 3,
      zeroThreshold = math.pow(2, -128))
    val bytes = encodeHistChunk(c)
    assertHistEqual(c, decodeHistChunk(bytes, 0, bytes.length))
  }

  test("gauge flags and irregular timestamps survive") {
    val c0 = mkHist(flags = GaugeType)
    // gauge: counts may shrink — negate the monotone trend
    val c = c0.copy(
      count = c0.count.map(v => 1000L - v),
      zeroCount = c0.zeroCount.reverse,
      posBuckets = c0.posBuckets.reverse,
      negBuckets = c0.negBuckets.reverse)
    val bytes = encodeHistChunk(c)
    assertHistEqual(c, decodeHistChunk(bytes, 0, bytes.length))
  }

  test("single-sample chunks roundtrip") {
    val c = mkHist()
    val one = c.copy(ts = c.ts.take(1), count = c.count.take(1),
      zeroCount = c.zeroCount.take(1), sum = c.sum.take(1),
      posBuckets = c.posBuckets.take(1), negBuckets = c.negBuckets.take(1))
    val b1 = encodeHistChunk(one)
    assertHistEqual(one, decodeHistChunk(b1, 0, b1.length))
  }

  test("an empty chunk is the bare 2-byte count, like a fresh chunkenc chunk") {
    val c = mkHist()
    val empty = c.copy(ts = Array.empty, count = Array.empty,
      zeroCount = Array.empty, sum = Array.empty,
      posBuckets = Array.empty, negBuckets = Array.empty)
    val b0 = encodeHistChunk(empty)
    assert(b0.toSeq === Seq[Byte](0, 0)) // no flags, no layout
    val d = decodeHistChunk(b0, 0, b0.length)
    assert(d.ts.isEmpty && d.posSpans.isEmpty && d.negSpans.isEmpty)
    val fe = mkFloat()
    val fempty = fe.copy(ts = Array.empty, count = Array.empty,
      zeroCount = Array.empty, sum = Array.empty,
      posBuckets = Array.empty, negBuckets = Array.empty)
    val fb = encodeFloatHistChunk(fempty)
    assert(fb.toSeq === Seq[Byte](0, 0))
    assert(decodeFloatHistChunk(fb, 0, fb.length).ts.isEmpty)
  }

  // ---- NHCB custom-bucket schema (-53) ----

  private def mkNhcb(): HistChunk = {
    val posSpans = Vector(Span(0, 3), Span(1, 2)) // idx 0,1,2,4,5
    val ts = Array(1704067200000L, 1704067215000L, 1704067230000L)
    val n = ts.length
    val pos = Array.tabulate(n, 5)((i, j) => (i + 1L) * (j + 1L))
    val zero = Array.fill(n)(0L)
    val count = Array.tabulate(n)(i => pos(i).sum)
    val sum = Array(1.25, 2.5, 3.75)
    // mixed bound encodings: exact millis (compact varbit), a
    // non-multiple-of-0.001 (raw escape), a huge bound (raw escape)
    val bounds = Array(0.005, 0.1, 1.0 / 3.0, 2.5, 50000.0)
    HistChunk(UnknownCounterReset, CustomBucketsSchema, 0.0, posSpans,
      Vector.empty, ts, count, zero, sum, pos,
      Array.fill(n)(Array.empty[Long]), bounds)
  }

  test("NHCB chunk roundtrips with the bound list, raw escapes included") {
    val c = mkNhcb()
    val bytes = encodeHistChunk(c)
    val d = decodeHistChunk(bytes, 0, bytes.length)
    assertHistEqual(c, d)
    assert(d.customValues.map(java.lang.Double.doubleToRawLongBits).toSeq ===
      c.customValues.map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("NHCB float chunk roundtrips with the bound list") {
    val base = mkFloat()
    val c = base.copy(schema = CustomBucketsSchema, zeroThreshold = 0.0,
      zeroCount = Array.fill(base.ts.length)(0.0),
      customValues = Array(0.25, 0.5, 1.0, 2.5, 10.0))
    val bytes = encodeFloatHistChunk(c)
    val d = decodeFloatHistChunk(bytes, 0, bytes.length)
    assert(d.schema === CustomBucketsSchema)
    assert(d.customValues.toSeq === c.customValues.toSeq)
    def raw(a: Array[Double]) = a.map(java.lang.Double.doubleToRawLongBits).toSeq
    assert(d.posBuckets.map(raw).toSeq === c.posBuckets.map(raw).toSeq)
  }

  test("custom bounds use the compact form only for exact 0.001 multiples") {
    def enc(f: Double): Array[Byte] = {
      val w = new BitWriter(); putCustomBound(w, f); w.toBytes
    }
    def rt(f: Double): Double = {
      val b = enc(f)
      readCustomBound(new BitReader(b, 0, b.length))
    }
    // compact: value·1000 integral and ≤ 33554430 → at most 4 bytes
    for (f <- Seq(0.0, 0.001, 0.005, 0.25, 1.0, 33554.43)) {
      assert(rt(f) === f, s"bound $f")
      assert(enc(f).length <= 4, s"bound $f should take the compact form")
    }
    // raw escape: negative, too large, sub-millisecond precision, NaN
    for (f <- Seq(-1.0, 33554.431, 1.0 / 3.0, 1e300, 0.0001)) {
      assert(java.lang.Double.doubleToRawLongBits(rt(f)) ===
        java.lang.Double.doubleToRawLongBits(f), s"bound $f")
      assert(enc(f).length === 9, s"bound $f should take the raw escape")
    }
    assert(java.lang.Double.isNaN(rt(Double.NaN)))
  }

  test("NHCB structural invariants are enforced loudly") {
    val c = mkNhcb()
    // bounds must be present
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(customValues = Array.empty)))
    // and strictly ascending
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(customValues = Array(1.0, 1.0, 2.0))))
    // no negative buckets
    assertThrows[IllegalArgumentException](encodeHistChunk(c.copy(
      negSpans = Vector(Span(0, 1)),
      negBuckets = Array.fill(c.ts.length)(Array(1L)))))
    // no zero bucket (threshold or counts)
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(zeroThreshold = 0.5)))
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(zeroCount = Array.fill(c.ts.length)(1L))))
    // indexes within [0, num_values] (num_values = +Inf overflow)
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(posSpans = Vector(Span(-1, 5)))))
    assertThrows[IllegalArgumentException](
      encodeHistChunk(c.copy(posSpans = Vector(Span(2, 5)))))
    // exponential schemas must NOT carry a bound list
    assertThrows[IllegalArgumentException](
      encodeHistChunk(mkHist().copy(customValues = Array(1.0))))
  }

  test("the +Inf overflow index (== num_values) is accepted") {
    val c = mkNhcb()
    val inf = c.copy(posSpans = Vector(Span(1, 5))) // idx 1..5, 5 == len
    val bytes = encodeHistChunk(inf)
    val d = decodeHistChunk(bytes, 0, bytes.length)
    assert(d.posSpans === inf.posSpans)
  }

  private def mkFloat(): FloatHistChunk = {
    val posSpans = Vector(Span(0, 3), Span(1, 1)) // idx 0,1,2,4
    val negSpans = Vector.empty[Span]
    val ts = Array(1704067200000L, 1704067215000L, 1704067230000L)
    val n = ts.length
    val pos = Array.tabulate(n, 4)((i, j) => (i + 1) * 0.25 * (j + 1))
    val neg = Array.fill(n)(Array.empty[Double])
    val zero = Array(0.5, 1.25, Double.NaN)
    val count = Array(10.25, 20.5, 30.75)
    val sum = Array(-0.0, 3.5, 1e300)
    FloatHistChunk(GaugeType, -1, 0.001953125 /* 2^-9 */, posSpans,
      negSpans, ts, count, zero, sum, pos, neg)
  }

  test("float histogram chunk roundtrips bit-lossless") {
    val c = mkFloat()
    val bytes = encodeFloatHistChunk(c)
    val d = decodeFloatHistChunk(bytes, 0, bytes.length)
    assert(d.flags === c.flags)
    assert(d.schema === c.schema)
    assert(d.zeroThreshold === c.zeroThreshold)
    assert(d.posSpans === c.posSpans)
    assert(d.negSpans === c.negSpans)
    assert(d.ts.toSeq === c.ts.toSeq)
    def raw(a: Array[Double]) = a.map(java.lang.Double.doubleToRawLongBits).toSeq
    assert(raw(d.count) === raw(c.count))
    assert(raw(d.zeroCount) === raw(c.zeroCount))
    assert(raw(d.sum) === raw(c.sum))
    assert(d.posBuckets.map(raw).toSeq === c.posBuckets.map(raw).toSeq)
  }

  test("layout mismatch between sample and spans is rejected") {
    val c = mkHist()
    val bad = c.copy(posBuckets = c.posBuckets.map(_.take(3)))
    assertThrows[IllegalArgumentException](encodeHistChunk(bad))
  }
}
