package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.tsdb.HistChunkCodec
import graft.tsdb.HistChunkCodec.Samples

/** [[graft.tsdb.HistChunkCodec]] — the native-histogram chunk family
  * (EncHistogram analog): bit-exact roundtrips across layout changes,
  * schemas, NaN sums and empty histograms; frame-header skip; the
  * compression contract (count deltas ≪ absolute re-encode); and the
  * Catalyst expression surface.
  */
class HistChunkCodecSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(a: Samples, b: Samples): Unit = {
    assert(a.ts.toSeq == b.ts.toSeq, "ts")
    assert(a.zero.toSeq == b.zero.toSeq, "zero")
    assert(a.idx.map(_.toSeq).toSeq == b.idx.map(_.toSeq).toSeq, "idx")
    assert(a.cnt.map(_.toSeq).toSeq == b.cnt.map(_.toSeq).toSeq, "cnt")
    if (a.sums == null) assert(b.sums == null, "sums null")
    else assert(a.sums.map(java.lang.Double.doubleToRawLongBits).toSeq ==
      b.sums.map(java.lang.Double.doubleToRawLongBits).toSeq, "sums bits")
  }

  // a counter-ish series: regular µs timestamps, cumulative counts,
  // bucket 3 appears at sample 2 (layout change), sums incl. a NaN
  private def fixture: Samples = Samples(
    ts = Array(1000000L, 16000000L, 31000000L, 46000000L, 61000000L),
    zero = Array(0L, 2L, 5L, 5L, 9L),
    idx = Array(
      Array(-1, 0, 2), Array(-1, 0, 2), Array(-1, 0, 2, 3),
      Array(-1, 0, 2, 3), Array(-1, 0, 2, 3)),
    cnt = Array(
      Array(1L, 4L, 2L), Array(3L, 4L, 7L), Array(3L, 6L, 9L, 1L),
      Array(5L, 6L, 12L, 1L), Array(5L, 8L, 12L, 4L)),
    sums = Array(0.25, 7.75, 19.5, Double.NaN, 42.0))

  test("chunk roundtrip is bit-exact across layout changes, NaN sums, schema") {
    val enc = HistChunkCodec.encodeChunk(fixture.ts, fixture.zero,
      fixture.idx, fixture.cnt, fixture.sums, schema = 2)
    val (dec, schema) = HistChunkCodec.decodeChunk(enc, 0, enc.length)
    assert(schema == 2)
    assertSame(fixture, dec)
  }

  test("sum-less series and empty histograms roundtrip") {
    val s = Samples(
      ts = Array(10L, 20L, 30L),
      zero = Array(0L, 0L, 4L),
      idx = Array(Array.empty[Int], Array(1), Array.empty[Int]),
      cnt = Array(Array.empty[Long], Array(9L), Array.empty[Long]),
      sums = null)
    val enc = HistChunkCodec.encodeChunk(s.ts, s.zero, s.idx, s.cnt,
      null, schema = -3)
    val (dec, schema) = HistChunkCodec.decodeChunk(enc, 0, enc.length)
    assert(schema == -3)
    assertSame(s, dec)
  }

  test("blob framing cuts chunks and the header filter skips unparsed bodies") {
    val f = fixture
    // 2 samples per chunk → 3 chunks: [0,1], [2,3], [4]
    val blob = HistChunkCodec.encodeBlob(f, schema = 0, samplesPerChunk = 2)
    val (all, _) = HistChunkCodec.decodeBlob(blob, 0L, Long.MaxValue)
    assertSame(f, all)
    // range covering only the middle chunk
    val (mid, _) = HistChunkCodec.decodeBlob(blob, 31000000L, 46000000L)
    assert(mid.ts.toSeq == Seq(31000000L, 46000000L))
    // corrupt the LAST chunk's body; a query that excludes it must
    // still decode the first two chunks intact (body never parsed)
    val fs = HistChunkCodec.frames(blob)
    assert(fs.length == 3 && fs.forall(_._1 == HistChunkCodec.EncHistogram))
    assert(fs.map(f => (f._2, f._3)) ==
      Seq((1000000L, 16000000L), (31000000L, 46000000L),
        (61000000L, 61000000L)))
    val corrupted = blob.clone()
    java.util.Arrays.fill(corrupted, fs.last._4, corrupted.length, 0x5a.toByte)
    val (kept, _) = HistChunkCodec.decodeBlob(corrupted, 0L, 46000000L)
    assert(kept.ts.toSeq == f.ts.take(4).toSeq)
    val touched = try {
      val (g, _) = HistChunkCodec.decodeBlob(corrupted, 0L, Long.MaxValue)
      g.zero.toSeq != f.zero.toSeq || g.cnt.map(_.toSeq).toSeq != f.cnt.map(_.toSeq).toSeq
    } catch { case _: Throwable => true }
    assert(touched, "corruption must be observable when the range covers it")
  }

  test("codec density: layout reuse + count deltas beat absolute re-encode") {
    // one day at 15 s scrape, 8-bucket cumulative counter growing by
    // small increments — the Prometheus-dense histogram shape
    val n = 5760
    val rnd = new scala.util.Random(7)
    val ts = (0 until n).map(i => 1700000000000000L + i.toLong * 15000000L).toArray
    val idx = Array.fill(n)(Array(-2, -1, 0, 1, 2, 3, 4, 5))
    val cnt = new Array[Array[Long]](n)
    val zero = new Array[Long](n)
    var running = Array.fill(8)(0L)
    var z = 0L
    for (i <- 0 until n) {
      running = running.zipWithIndex.map { case (v, j) => v + rnd.nextInt(3) }
      z += rnd.nextInt(2)
      cnt(i) = running.clone()
      zero(i) = z
    }
    val blob = HistChunkCodec.encodeBlob(
      Samples(ts, zero, idx, cnt, null), 0, 120)
    val bps = blob.length.toDouble / n
    info(f"8-bucket incrementing counter, regular ts: $bps%.2f B/sample")
    // row model: 8 longs + zero + ts ≈ 80+ B/sample; deltas ≈ 1 B per
    // touched bucket → well under 16
    assert(bps < 16.0)
    val (dec, _) = HistChunkCodec.decodeBlob(blob, 0L, Long.MaxValue)
    assert(dec.cnt(n - 1).toSeq == cnt(n - 1).toSeq)
  }

  test("Catalyst expressions: encode → decode roundtrip through a DataFrame") {
    val df = Seq(
      ("a", 1000L, 0L, Seq(1, 2), Seq(3L, 5L), Some(1.25)),
      ("a", 2000L, 1L, Seq(1, 2), Seq(4L, 9L), Some(4.5)),
      ("a", 3000L, 1L, Seq(1, 2, 4), Seq(4L, 11L, 2L), Some(8.0)),
      ("b", 1500L, 2L, Seq(0), Seq(7L), Some(0.5))
    ).toDF("series", "ts", "zero", "idx", "cnt", "sum")
    val sample = struct(col("ts"), col("zero"), col("idx"), col("cnt"), col("sum"))
    val enc = ColumnBridge.column(graft.functions.HistChunkEncode(
      ColumnBridge.expression(sort_array(collect_list(sample))),
      histSchema = 1, samplesPerChunk = 2))
    val dec = ColumnBridge.column(graft.functions.HistChunkDecode(
      ColumnBridge.expression(col("blob")),
      ColumnBridge.expression(lit(0L)),
      ColumnBridge.expression(lit(Long.MaxValue))))
    val out = df.groupBy("series").agg(enc.as("blob"))
      .select(col("series"), explode(dec).as("s"))
      .select(col("series"), col("s.ts"), col("s.zero"),
        col("s.idx"), col("s.cnt"), col("s.sum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3), r.getSeq[Long](4), r.getDouble(5)))
      .toSet
    assert(out == Set(
      ("a", 1000L, 0L, Seq(1, 2), Seq(3L, 5L), 1.25),
      ("a", 2000L, 1L, Seq(1, 2), Seq(4L, 9L), 4.5),
      ("a", 3000L, 1L, Seq(1, 2, 4), Seq(4L, 11L, 2L), 8.0),
      ("b", 1500L, 2L, Seq(0), Seq(7L), 0.5)))
  }

  test("HistChunkStore: write → select roundtrip and mergeBlocks LWW") {
    import graft.tsdb.{HistChunkStore, Matcher}
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val blockA = Seq(
      ("api", ts(1), 1L, Seq(1), Seq(10L), 2.5),
      ("api", ts(2), 2L, Seq(1), Seq(20L), 5.0),
      ("web", ts(1), 0L, Seq(2), Seq(7L), 1.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")
    // block B overlaps A on (api, Jan 2) with a REVISED histogram
    val blockB = Seq(
      ("api", ts(2), 3L, Seq(1, 2), Seq(21L, 4L), 9.0),
      ("api", ts(3), 4L, Seq(1, 2), Seq(25L, 6L), 12.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")
    val dirA = "/tmp/graft_test_histblk_a"
    val dirB = "/tmp/graft_test_histblk_b"
    val out = "/tmp/graft_test_histblk_m"
    HistChunkStore.write(blockA, dirA, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"))
    HistChunkStore.write(blockB, dirB, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"))
    // select with matcher + range: only (api, Jan 1..2)
    val sel = HistChunkStore.select(spark, dirA,
        "2024-01-01", "2024-01-03", Seq(Matcher.Eq("job", "api")),
        Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2), r.getSeq[Int](3), r.getSeq[Long](4), r.getDouble(5)))
      .toSet
    assert(sel == Set(
      ("api", ts(1), 1L, Seq(1), Seq(10L), 2.5),
      ("api", ts(2), 2L, Seq(1), Seq(20L), 5.0)))
    // merge: B (later dir) wins on the overlapping sample
    HistChunkStore.mergeBlocks(spark, Seq(dirA, dirB), out, Seq("job"), "ts")
    val merged = HistChunkStore.select(spark, out,
        "2024-01-01", "2024-02-01", Nil, Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2), r.getSeq[Long](4).sum, r.getDouble(5))).toSet
    assert(merged == Set(
      ("api", ts(1), 1L, 10L, 2.5),
      ("api", ts(2), 3L, 25L, 9.0), // block B's revision
      ("api", ts(3), 4L, 31L, 12.0),
      ("web", ts(1), 0L, 7L, 1.0)))
  }

  test("HistChunkStore signed: even/odd interleave roundtrips both sides and merges") {
    import graft.tsdb.HistChunkStore
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // negative indexes on BOTH sides (pos -1 → k=-2, neg -1 → k=-1)
    // pin the parity split's behavior on negative ints
    val signedDf = Seq(
      ("api", ts(1), 1L, Seq(-1, 1), Seq(10L, 3L), Seq(-1, 0), Seq(4L, 6L), 2.5),
      ("api", ts(2), 2L, Seq(-1, 1, 2), Seq(11L, 5L, 1L), Seq(0), Seq(9L), 5.0),
      ("web", ts(1), 0L, Seq(2), Seq(7L), Seq(-2, 3), Seq(1L, 2L), 1.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts",
      "neg_idx", "neg_counts", "hsum")
    val dirS = "/tmp/graft_test_histblk_s"
    val dirU = "/tmp/graft_test_histblk_u"
    val outS = "/tmp/graft_test_histblk_sm"
    HistChunkStore.write(signedDf, dirS, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"),
      negIdxCol = Some("neg_idx"), negCountsCol = Some("neg_counts"))
    val back = HistChunkStore.select(spark, dirS,
        "2024-01-01", "2024-02-01", Nil, Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2), r.getSeq[Int](3), r.getSeq[Long](4),
        r.getDouble(5), r.getSeq[Int](7), r.getSeq[Long](8)))
      .toSet
    assert(back == Set(
      ("api", ts(1), 1L, Seq(-1, 1), Seq(10L, 3L), 2.5, Seq(-1, 0), Seq(4L, 6L)),
      ("api", ts(2), 2L, Seq(-1, 1, 2), Seq(11L, 5L, 1L), 5.0, Seq(0), Seq(9L)),
      ("web", ts(1), 0L, Seq(2), Seq(7L), 1.0, Seq(-2, 3), Seq(1L, 2L))))
    // an UNSIGNED block merges with a signed one: merged block is
    // signed, unsigned rows read back with empty neg arrays
    val unsignedDf = Seq(
      ("api", ts(3), 4L, Seq(1), Seq(25L), 12.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")
    HistChunkStore.write(unsignedDf, dirU, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"))
    HistChunkStore.mergeBlocks(spark, Seq(dirS, dirU), outS, Seq("job"), "ts")
    val merged = HistChunkStore.select(spark, outS,
        "2024-01-01", "2024-02-01", Nil, Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getSeq[Int](3), r.getSeq[Int](7), r.getSeq[Long](8))).toSet
    assert(merged == Set(
      ("api", ts(1), Seq(-1, 1), Seq(-1, 0), Seq(4L, 6L)),
      ("api", ts(2), Seq(-1, 1, 2), Seq(0), Seq(9L)),
      ("api", ts(3), Seq(1), Seq(), Seq()),
      ("web", ts(1), Seq(2), Seq(-2, 3), Seq(1L, 2L))))
  }

  test("SQL registration: graft_hist_chunk_encode/decode work from SQL") {
    graft.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_hist_chunk_decode(
        |  graft_hist_chunk_encode(
        |    array(named_struct('ts', 5L, 'zero', 1L,
        |      'idx', array(2), 'cnt', array(4L),
        |      'sum', CAST(NULL AS DOUBLE))),
        |    0, 120), 0L, 100L) AS s""".stripMargin)
      .selectExpr("s[0].ts", "s[0].zero", "s[0].idx", "s[0].cnt", "s[0].sum")
      .collect().head
    assert(row.getLong(0) == 5L && row.getLong(1) == 1L)
    assert(row.getSeq[Int](2) == Seq(2) && row.getSeq[Long](3) == Seq(4L))
    assert(row.isNullAt(4))
  }

  // ----- FLOAT-histogram family (EncFloatHistogram) -----

  import graft.tsdb.HistChunkCodec.FloatSamples

  private def assertSameF(a: FloatSamples, b: FloatSamples): Unit = {
    def bits(x: Array[Double]) =
      x.map(java.lang.Double.doubleToRawLongBits).toSeq
    assert(a.ts.toSeq == b.ts.toSeq, "ts")
    assert(bits(a.zero) == bits(b.zero), "zero bits")
    assert(a.idx.map(_.toSeq).toSeq == b.idx.map(_.toSeq).toSeq, "idx")
    assert(a.cnt.map(bits).toSeq == b.cnt.map(bits).toSeq, "cnt bits")
    if (a.sums == null) assert(b.sums == null, "sums null")
    else assert(bits(a.sums) == bits(b.sums), "sums bits")
  }

  // float counter with NON-dyadic deltas (0.1 steps — every value
  // carries a full mantissa), a NaN bucket count and a NaN sum, a
  // signed zero, and a layout change at sample 2
  private def floatFixture: FloatSamples = FloatSamples(
    ts = Array(1000000L, 16000000L, 31000000L, 46000000L, 61000000L),
    zero = Array(0.0, 0.3, 0.6, -0.0, 2.5),
    idx = Array(
      Array(-1, 0, 2), Array(-1, 0, 2), Array(-1, 0, 2, 3),
      Array(-1, 0, 2, 3), Array(-1, 0, 2, 3)),
    cnt = Array(
      Array(0.1, 4.2, 2.0), Array(0.2, 4.3, 7.7), Array(0.3, 6.1, 9.9, 1.5),
      Array(0.4, Double.NaN, 12.0, 1.5), Array(0.5, 8.8, 12.1, 4.0)),
    sums = Array(0.25, 7.85, 19.5, Double.NaN, 42.1))

  test("float chunk roundtrip is bit-exact: non-dyadic deltas, NaN, -0.0, layout change") {
    val f = floatFixture
    val enc = HistChunkCodec.encodeFloatChunk(f.ts, f.zero, f.idx, f.cnt,
      f.sums, schema = 1)
    val (dec, schema) = HistChunkCodec.decodeFloatChunk(enc, 0, enc.length)
    assert(schema == 1)
    assertSameF(f, dec)
  }

  test("float sum-less series and empty histograms roundtrip") {
    val s = FloatSamples(
      ts = Array(10L, 20L, 30L),
      zero = Array(0.0, 0.0, 4.25),
      idx = Array(Array.empty[Int], Array(1), Array.empty[Int]),
      cnt = Array(Array.empty[Double], Array(9.5), Array.empty[Double]),
      sums = null)
    val enc = HistChunkCodec.encodeFloatChunk(s.ts, s.zero, s.idx, s.cnt,
      null, schema = -3)
    val (dec, schema) = HistChunkCodec.decodeFloatChunk(enc, 0, enc.length)
    assert(schema == -3)
    assertSameF(s, dec)
  }

  test("float blob framing: ordinal 3, header skip leaves corrupted bodies unparsed") {
    val f = floatFixture
    val blob = HistChunkCodec.encodeFloatBlob(f, schema = 0,
      samplesPerChunk = 2)
    val (all, _) = HistChunkCodec.decodeFloatBlob(blob, 0L, Long.MaxValue)
    assertSameF(f, all)
    val fs = HistChunkCodec.frames(blob)
    assert(fs.length == 3 &&
      fs.forall(_._1 == HistChunkCodec.EncFloatHistogram))
    val (mid, _) = HistChunkCodec.decodeFloatBlob(blob, 31000000L, 46000000L)
    assert(mid.ts.toSeq == Seq(31000000L, 46000000L))
    val corrupted = blob.clone()
    java.util.Arrays.fill(corrupted, fs.last._4, corrupted.length, 0x5a.toByte)
    val (kept, _) = HistChunkCodec.decodeFloatBlob(corrupted, 0L, 46000000L)
    assert(kept.ts.toSeq == f.ts.take(4).toSeq)
  }

  test("float codec density: XOR windows beat the 88 B/sample row model") {
    val n = 5760
    val rnd = new scala.util.Random(11)
    val ts = (0 until n).map(i => 1700000000000000L + i.toLong * 15000000L).toArray
    val idx = Array.fill(n)(Array(-2, -1, 0, 1, 2, 3, 4, 5))
    val cnt = new Array[Array[Double]](n)
    val zero = new Array[Double](n)
    var running = Array.fill(8)(100.0)
    var z = 100.0
    for (i <- 0 until n) {
      running = running.map(v => v + rnd.nextInt(3) * 0.1)
      z += rnd.nextInt(2) * 0.1
      cnt(i) = running.clone()
      zero(i) = z
    }
    val blob = HistChunkCodec.encodeFloatBlob(
      FloatSamples(ts, zero, idx, cnt, null), 0, 120)
    val bps = blob.length.toDouble / n
    info(f"8-bucket float counter, 0.1 steps: $bps%.2f B/sample")
    // raw row model: 8 doubles + zero + ts = 88 B/sample; XOR'd
    // same-exponent neighbors cost ~5 B each
    assert(bps < 60.0)
    val (dec, _) = HistChunkCodec.decodeFloatBlob(blob, 0L, Long.MaxValue)
    assert(dec.cnt(n - 1).map(java.lang.Double.doubleToRawLongBits).toSeq ==
      cnt(n - 1).map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("SQL registration: graft_float_hist_chunk_encode/decode work from SQL") {
    graft.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_float_hist_chunk_decode(
        |  graft_float_hist_chunk_encode(
        |    array(named_struct('ts', 5L, 'zero', CAST(0.5 AS DOUBLE),
        |      'idx', array(2), 'cnt', array(CAST(4.1 AS DOUBLE)),
        |      'sum', CAST(2.25 AS DOUBLE))),
        |    0, 120), 0L, 100L) AS s""".stripMargin)
      .selectExpr("s[0].ts", "s[0].zero", "s[0].idx", "s[0].cnt", "s[0].sum")
      .collect().head
    assert(row.getLong(0) == 5L && row.getDouble(1) == 0.5)
    assert(row.getSeq[Int](2) == Seq(2) && row.getSeq[Double](3) == Seq(4.1))
    assert(row.getDouble(4) == 2.25)
  }

  test("HistChunkStore float path: writeFloat -> selectFloat roundtrip and LWW merge") {
    import graft.tsdb.{HistChunkStore, Matcher}
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val blockA = Seq(
      ("api", ts(1), 0.5, Seq(1), Seq(10.25), 2.5),
      ("api", ts(2), 1.1, Seq(1), Seq(20.75), 5.0),
      ("web", ts(1), 0.0, Seq(2), Seq(Double.NaN), 1.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")
    val blockB = Seq(
      ("api", ts(2), 1.3, Seq(1, 2), Seq(21.0, 4.5), 9.0),
      ("api", ts(3), 2.0, Seq(1, 2), Seq(25.5, 6.0), 12.0)
    ).toDF("job", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")
    val dirA = "/tmp/graft_test_fhistblk_a"
    val dirB = "/tmp/graft_test_fhistblk_b"
    val out = "/tmp/graft_test_fhistblk_m"
    HistChunkStore.writeFloat(blockA, dirA, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"))
    HistChunkStore.writeFloat(blockB, dirB, Seq("job"), "ts",
      "zero_count", "pos_idx", "pos_counts", Some("hsum"))
    val sel = HistChunkStore.selectFloat(spark, dirA,
        "2024-01-01", "2024-01-03", Seq(Matcher.Eq("job", "api")),
        Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getDouble(2), r.getSeq[Int](3), r.getSeq[Double](4),
        r.getDouble(5)))
      .toSet
    assert(sel == Set(
      ("api", ts(1), 0.5, Seq(1), Seq(10.25), 2.5),
      ("api", ts(2), 1.1, Seq(1), Seq(20.75), 5.0)))
    // NaN bucket counts survive the store bit-exactly
    val nan = HistChunkStore.selectFloat(spark, dirA,
        "2024-01-01", "2024-02-01", Seq(Matcher.Eq("job", "web")),
        Seq("job"), "ts")
      .collect().map(_.getSeq[Double](4)).head
    assert(nan.length == 1 && nan.head.isNaN)
    HistChunkStore.mergeFloatBlocks(spark, Seq(dirA, dirB), out,
      Seq("job"), "ts")
    val merged = HistChunkStore.selectFloat(spark, out,
        "2024-01-01", "2024-02-01", Nil, Seq("job"), "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getDouble(2), r.getSeq[Double](4).sum, r.getDouble(5)))
      .filter(!_._4.isNaN).toSet
    assert(merged == Set(
      ("api", ts(1), 0.5, 10.25, 2.5),
      ("api", ts(2), 1.3, 25.5, 9.0), // block B's revision
      ("api", ts(3), 2.0, 31.5, 12.0)))
  }

  test("property: random series roundtrip bit-exactly through both codec families") {
    val rnd = new scala.util.Random(987654L)
    def randDouble(): Double = rnd.nextInt(8) match {
      case 0 => Double.NaN
      case 1 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any payload: infs, subnormals, NaN variants
      case 2 => -0.0
      case 3 => rnd.nextInt(1000) * 0.1
      case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(10) - 5)
    }
    def randLayout(): Array[Int] = {
      val nb = rnd.nextInt(6)
      var cur = rnd.nextInt(9) - 4
      Array.fill(nb) { val v = cur; cur += 1 + rnd.nextInt(3); v }
    }
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(40)
      var t = rnd.nextInt(1000000).toLong
      val ts = Array.fill(n) { val v = t; t += rnd.nextInt(1 << 20); v }
      val layouts = new Array[Array[Int]](n)
      for (i <- 0 until n)
        layouts(i) = if (i > 0 && rnd.nextInt(3) > 0) layouts(i - 1)
          else randLayout()
      val spc = 1 + rnd.nextInt(7)
      val schema = rnd.nextInt(9) - 4
      val hasSum = rnd.nextBoolean()
      // integer family
      val iz = Array.fill(n)(rnd.nextInt(1 << 20).toLong)
      val ic = layouts.map(l => l.map(_ => rnd.nextInt(1 << 24).toLong))
      val isums = if (hasSum) Array.fill(n)(randDouble()) else null
      val is = Samples(ts, iz, layouts, ic, isums)
      val iblob = HistChunkCodec.encodeBlob(is, schema, spc)
      val (idec, isch) = HistChunkCodec.decodeBlob(iblob, 0L, Long.MaxValue)
      assert(isch == schema, s"trial $trial int schema")
      assertSame(is, idec)
      // float family
      val fz = Array.fill(n)(randDouble())
      val fc = layouts.map(l => l.map(_ => randDouble()))
      val fsums = if (hasSum) Array.fill(n)(randDouble()) else null
      val fs = FloatSamples(ts, fz, layouts, fc, fsums)
      val fblob = HistChunkCodec.encodeFloatBlob(fs, schema, spc)
      val (fdec, fsch) = HistChunkCodec.decodeFloatBlob(fblob, 0L, Long.MaxValue)
      assert(fsch == schema, s"trial $trial float schema")
      assertSameF(fs, fdec)
    }
  }
}
