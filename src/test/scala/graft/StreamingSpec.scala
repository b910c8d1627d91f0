package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{EventsStream, SeriesEvent}

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg aggregates a micro-batch stream with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val agg = EventsStream.windowedAgg(events, "10 minutes", "1 minute")
    val query = agg.writeStream
      .format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      mem.addData(
        (ts("2024-01-01 00:01:00"), "click", 1L, 10.0),
        (ts("2024-01-01 00:05:00"), "click", 2L, 20.0),
        (ts("2024-01-01 00:11:00"), "view", 1L, 5.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT event_type, n_events, avg_value FROM win_agg ORDER BY event_type")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "click" && rows(0).getLong(1) == 2L
        && rows(0).getDouble(2) == 15.0)
      assert(rows(1).getString(0) == "view" && rows(1).getLong(1) == 1L)
    } finally query.stop()
  }

  test("runningLastPoint keeps per-series state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[SeriesEvent]
    val out = EventsStream.runningLastPoint(mem.toDS())
    val query = out.writeStream
      .format("memory").queryName("last_state")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(
        SeriesEvent(ts("2024-01-01 00:00:00"), "click", 1L, 10.0),
        SeriesEvent(ts("2024-01-01 00:01:00"), "click", 1L, 20.0))
      query.processAllAvailable()
      // second batch: newer sample for the same series, plus a new series
      mem.addData(
        SeriesEvent(ts("2024-01-01 00:05:00"), "click", 1L, 30.0),
        SeriesEvent(ts("2024-01-01 00:02:00"), "view", 2L, 7.0))
      query.processAllAvailable()
      // the memory sink keeps every update; the latest state per
      // series is the row with the highest n_samples
      val rows = s.sql(
        """SELECT event_type, user_id,
          |  max_by(last_value, n_samples) AS last_value,
          |  max(n_samples) AS n_samples
          |FROM last_state GROUP BY event_type, user_id
          |ORDER BY event_type""".stripMargin).collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "click" && rows(0).getDouble(2) == 30.0
        && rows(0).getLong(3) == 3L)
      assert(rows(1).getString(0) == "view" && rows(1).getDouble(2) == 7.0
        && rows(1).getLong(3) == 1L)
    } finally query.stop()
  }

  test("windowedIncrease seals windows on watermark with late data in order") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[SeriesEvent]
    val out = EventsStream.windowedIncrease(mem.toDS(),
      windowLenMs = 60000L, watermarkDelay = "30 seconds")
    val query = out.writeStream
      .format("memory").queryName("win_inc")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // window [00:00, 00:01): 1 -> 3 (+2) ... 2 (reset, +2)
      mem.addData(
        SeriesEvent(ts("2024-01-01 00:00:10"), "req", 1L, 1.0),
        SeriesEvent(ts("2024-01-01 00:00:30"), "req", 1L, 3.0),
        SeriesEvent(ts("2024-01-01 00:00:50"), "req", 1L, 2.0))
      query.processAllAvailable()
      // watermark = 00:00:50 - 30s = 00:00:20 < window end → nothing
      // sealed yet; a LATE sample (ts 00:00:40, above watermark)
      // must land between the 00:00:30 and 00:00:50 samples
      mem.addData(SeriesEvent(ts("2024-01-01 00:00:40"), "req", 1L, 3.5))
      query.processAllAvailable()
      assert(s.sql("SELECT count(*) FROM win_inc").head.getLong(0) == 0L)
      // advance the watermark past the window end → seal + emit once
      mem.addData(SeriesEvent(ts("2024-01-01 00:02:00"), "req", 1L, 10.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT event_type, user_id, n_samples, increase, rate FROM win_inc")
        .collect()
      assert(rows.length == 1)
      // ordered chain 1 -> 3 -> 3.5 -> 2: (+2) (+0.5) (reset +2) = 4.5
      assert(rows.head.getLong(2) == 4L)
      assert(rows.head.getDouble(3) == 4.5)
      assert(rows.head.getDouble(4) == 4.5 / 60.0)
    } finally query.stop()
  }

  test("toBucketedParquet writes the converter's bucketed layout from a stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val query = EventsStream.toBucketedParquet(
      events, s"$root/data", s"$root/ckpt").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
        (ts("2024-01-02 10:00:00"), "click", 1L, 2.0))
      query.processAllAvailable()
      val back = s.read.parquet(s"$root/data")
      assert(back.count() == 2)
      // one partition directory per day bucket — the same layout
      // TsdbConverter.convert writes, so the batch queryable can
      // read the streamed table with identical pruning
      assert(back.select("bucket").distinct().count() == 2)
      assert(new java.io.File(s"$root/data").listFiles()
        .count(_.getName.startsWith("bucket=")) == 2)
    } finally query.stop()
  }

  test("toChunkedBlocks: per-batch mini blocks + compaction ≡ one batch block") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_chunk").toString
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val series = Seq("event_type", "user_id")
    val query = EventsStream.toChunkedBlocks(
      events, s"$root/blocks", s"$root/ckpt", series).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
        (ts("2024-01-01 11:00:00"), "click", 1L, 2.0))
      query.processAllAvailable()
      mem.addData(
        (ts("2024-01-01 11:00:00"), "click", 1L, 99.0), // revision: later batch wins
        (ts("2024-01-02 10:00:00"), "view", 2L, 3.0))
      query.processAllAvailable()
    } finally query.stop()
    val dirs = new java.io.File(s"$root/blocks").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.toString).sorted.toSeq
    assert(dirs.size == 2)
    graft.tsdb.ChunkStore.mergeBlocks(s, dirs, s"$root/compacted",
      series, "ts", "value")
    val out = graft.tsdb.ChunkStore.select(s, s"$root/compacted",
        "2024-01-01 00:00:00", "2024-02-01 00:00:00", Nil,
        series, "ts", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3.getTime))
    assert(out.length == 3)
    assert(out(1)._4 == 99.0) // batch 1's revision of the 11:00 sample won
    assert(out(2)._1 == "view")
  }

  test("toTsdbBlocks: micro-batches become spec-shaped TSDB blocks; redelivery idempotent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_tsdb").toString
    val mem = MemoryStream[(Long, String, String, Double)]
    val samples = mem.toDF().toDF("ts", "job", "instance", "value")
    val query = EventsStream.toTsdbBlocks(
      samples, s"$root/blocks", s"$root/ckpt", Seq("job", "instance")).start()
    try {
      mem.addData(
        (1000L, "api", "a", 1.0),
        (2000L, "api", "a", 2.0),
        (7200001L, "api", "a", 3.0)) // second 2h window
      query.processAllAvailable()
      mem.addData((3000L, "db", "b", 4.0))
      query.processAllAvailable()
    } finally query.stop()
    val blockDirs = new java.io.File(s"$root/blocks").listFiles()
      .filter(d => d.isDirectory && new java.io.File(d, "meta.json").isFile)
    assert(blockDirs.length == 3) // 2 windows from batch 0 + 1 from batch 1
    val back = graft.tsdb.block.TsdbBlockStore.read(s, s"$root/blocks")
      .collect().map(x => (x.labels("job"), x.labels("instance"), x.ts, x.value))
    assert(back.toSet == Set(
      ("api", "a", 1000L, 1.0), ("api", "a", 2000L, 2.0),
      ("api", "a", 7200001L, 3.0), ("db", "b", 3000L, 4.0)))
    // identical content re-written (redelivery) lands on the same
    // ULIDs and is skipped — no duplicate blocks
    graft.tsdb.block.TsdbBlockStore.write(
      Seq((1000L, "api", "a", 1.0), (2000L, "api", "a", 2.0))
        .toDF("ts", "job", "instance", "value"),
      s"$root/blocks", Seq("job", "instance"), "ts", "value")
    val after = new java.io.File(s"$root/blocks").listFiles()
      .filter(d => d.isDirectory && new java.io.File(d, "meta.json").isFile)
    assert(after.length == 3)
  }

  test("toHistChunkedBlocks: streaming hist ingest + compaction with LWW") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_hchunk").toString
    val mem = MemoryStream[(Timestamp, String, Long, Seq[Int], Seq[Long], Double)]
    val samples = mem.toDF().toDF(
      "ts", "job", "zero_count", "pos_idx", "pos_counts", "hist_sum")
    val series = Seq("job")
    val query = EventsStream.toHistChunkedBlocks(
      samples, s"$root/blocks", s"$root/ckpt", series).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "api", 1L, Seq(1), Seq(5L), 2.0),
        (ts("2024-01-01 11:00:00"), "api", 2L, Seq(1), Seq(9L), 4.5))
      query.processAllAvailable()
      mem.addData(
        // revision of the 11:00 histogram: later batch must win
        (ts("2024-01-01 11:00:00"), "api", 3L, Seq(1, 2), Seq(10L, 2L), 6.0),
        (ts("2024-01-02 10:00:00"), "web", 0L, Seq(0), Seq(1L), 0.5))
      query.processAllAvailable()
    } finally query.stop()
    val dirs = new java.io.File(s"$root/blocks").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.toString).sorted.toSeq
    assert(dirs.size == 2)
    graft.tsdb.HistChunkStore.mergeBlocks(s, dirs, s"$root/compacted",
      series, "ts")
    val out = graft.tsdb.HistChunkStore.select(s, s"$root/compacted",
        "2024-01-01 00:00:00", "2024-02-01 00:00:00", Nil, series, "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getSeq[Int](3), r.getSeq[Long](4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2.getTime))
    assert(out.length == 3)
    assert(out(1) == ("api", ts("2024-01-01 11:00:00"), 3L,
      Seq(1, 2), Seq(10L, 2L), 6.0)) // batch 1's revision won
    assert(out(2)._1 == "web")
  }

  test("toFloatHistChunkedBlocks: streaming FLOAT-hist ingest + compaction with LWW") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_fhchunk").toString
    val mem = MemoryStream[(Timestamp, String, Double, Seq[Int], Seq[Double], Double)]
    val samples = mem.toDF().toDF(
      "ts", "job", "zero_count", "pos_idx", "pos_counts", "hist_sum")
    val series = Seq("job")
    val query = EventsStream.toFloatHistChunkedBlocks(
      samples, s"$root/blocks", s"$root/ckpt", series).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "api", 0.5, Seq(1), Seq(5.25), 2.0),
        (ts("2024-01-01 11:00:00"), "api", 1.0, Seq(1), Seq(9.75), 4.5))
      query.processAllAvailable()
      mem.addData(
        // revision of the 11:00 histogram: later batch must win
        (ts("2024-01-01 11:00:00"), "api", 1.5, Seq(1, 2), Seq(10.5, 2.1), 6.0))
      query.processAllAvailable()
    } finally query.stop()
    val dirs = new java.io.File(s"$root/blocks").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.toString).sorted.toSeq
    assert(dirs.size == 2)
    graft.tsdb.HistChunkStore.mergeFloatBlocks(s, dirs, s"$root/compacted",
      series, "ts")
    val out = graft.tsdb.HistChunkStore.selectFloat(s, s"$root/compacted",
        "2024-01-01 00:00:00", "2024-02-01 00:00:00", Nil, series, "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getSeq[Int](3), r.getSeq[Double](4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2.getTime))
    assert(out.toSeq == Seq(
      ("api", ts("2024-01-01 10:00:00"), 0.5, Seq(1), Seq(5.25), 2.0),
      ("api", ts("2024-01-01 11:00:00"), 1.5, Seq(1, 2), Seq(10.5, 2.1), 6.0)))
  }

  test("runningIncrease accumulates counter deltas across batches with reset") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[SeriesEvent]
    val out = EventsStream.runningIncrease(mem.toDS())
    val query = out.writeStream
      .format("memory").queryName("inc_state")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // counter: 10 -> 25 (+15)
      mem.addData(
        SeriesEvent(ts("2024-01-01 00:00:00"), "req", 1L, 10.0),
        SeriesEvent(ts("2024-01-01 00:01:00"), "req", 1L, 25.0))
      query.processAllAvailable()
      // reset to 3 (+3), then 8 (+5) => cumulative 23
      mem.addData(
        SeriesEvent(ts("2024-01-01 00:02:00"), "req", 1L, 3.0),
        SeriesEvent(ts("2024-01-01 00:03:00"), "req", 1L, 8.0))
      query.processAllAvailable()
      val cum = s.sql(
        "SELECT max_by(cum_increase, last_ts) FROM inc_state").head.getDouble(0)
      assert(cum == 23.0)
    } finally query.stop()
  }

  test("toHistRollupLayer: streamed NH layer ≡ the batch HistRollupStore layer") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = s.sqlContext
    import EventsStream.HistEvent
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_nh_rollup").toString
    def ev(tSec: Long, z: Double, i: Seq[Int], c: Seq[Double],
        hint: String = "unknown"): HistEvent =
      HistEvent(new Timestamp(tSec * 1000L), "a", z, i, c,
        Seq(-1), Seq(c.head / 2), hint)
    val fixture = Seq(
      // window 0 (100s): 2→5 with a LATE t=40 sample (3.0) that must
      // reorder INTO the chain; window 1 opens with a hint-forced
      // reset (values grew — only the header knows)
      ev(10L, 1.0, Seq(0), Seq(2.0)),
      ev(80L, 1.0, Seq(0), Seq(5.0)),
      ev(40L, 1.0, Seq(0), Seq(3.0)),
      ev(110L, 1.0, Seq(0), Seq(9.0), hint = "counter_reset"),
      ev(160L, 2.0, Seq(0, 2), Seq(10.0, 3.0)))
    val mem = MemoryStream[HistEvent]
    val query = EventsStream.toHistRollupLayer(mem.toDS(),
      s"$root/layer", s"$root/ckpt",
      windowLenSec = 100L, watermarkDelay = "30 seconds").start()
    try {
      mem.addData(fixture: _*)
      query.processAllAvailable()
      // advance the watermark far past every window end → all sealed
      mem.addData(ev(10000L, 0.0, Seq(0), Seq(0.0)))
      query.processAllAvailable()
    } finally query.stop()
    // batch layer over the SAME samples
    val batchDf = fixture.toDF()
      .withColumn("t_sec", (col("ts").cast("long")))
    graft.tsdb.HistRollupStore.write(batchDf, s"$root/batch",
      Seq("series"), "t_sec", "zero_count", "pos_idx", "pos_counts",
      "neg_idx", "neg_counts", 100L, hintCol = Some("hint"))
    def canon(path: String) = s.read.parquet(path)
      .filter(col("window_sec") < 1000L) // drop the advancer window
      .drop("ts", "bucket")
      .collect().map(_.toSeq).toSet
    val streamed = canon(s"$root/layer")
    assert(streamed == canon(s"$root/batch"))
    assert(streamed.size == 2)
    // the streamed layer serves the standard stitched read path, and
    // the hinted reset survives: 2→3→5 (+3) | seam 5→9 RESET by
    // header (adds 9) | 9→10 (+1) + bucket-2 appears (+3) — pos idx 0
    // totals 13
    val inc = graft.tsdb.HistRollupStore.stitchedIncrease(s,
        s"$root/layer", Seq("series"), 0L, 1000L)
      .select(col("pos_idx"), col("pos_inc")).as[(Seq[Int], Seq[Double])]
      .head()
    assert(inc == ((Seq(0, 2), Seq(13.0, 3.0))))
  }

  test("NH streaming → cascade composition: stream-sealed fine NH layer " +
      "cascaded to 200s ≡ batch-direct 200s") {
    // the NH twin of the scalar composed-lifecycle pin: the stream
    // seals 100s fine NH windows (hint-forced seam reset included),
    // the batch cascade builds the 200s layer FROM the streamed fine
    // layer, and the result is bitwise the direct batch build
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = s.sqlContext
    import EventsStream.HistEvent
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_nh_cascade").toString
    def ev(tSec: Long, z: Double, i: Seq[Int], c: Seq[Double],
        hint: String = "unknown"): HistEvent =
      HistEvent(new Timestamp(tSec * 1000L), "a", z, i, c,
        Seq(-1), Seq(c.head / 2), hint)
    val fixture = Seq(
      ev(10L, 1.0, Seq(0), Seq(2.0)),
      ev(80L, 1.0, Seq(0), Seq(5.0)),
      ev(110L, 1.0, Seq(0), Seq(9.0), hint = "counter_reset"),
      ev(160L, 2.0, Seq(0, 2), Seq(10.0, 3.0)),
      ev(210L, 0.0, Seq(0), Seq(1.0)), // value-visible reset on a seam
      ev(310L, 0.0, Seq(0), Seq(4.0)))
    val mem = MemoryStream[HistEvent]
    val query = EventsStream.toHistRollupLayer(mem.toDS(),
      s"$root/fine", s"$root/ckpt",
      windowLenSec = 100L, watermarkDelay = "30 seconds").start()
    try {
      mem.addData(fixture: _*)
      query.processAllAvailable()
      mem.addData(ev(10000L, 0.0, Seq(0), Seq(0.0)))
      query.processAllAvailable()
    } finally query.stop()
    graft.tsdb.HistRollupStore.writeFrom(s, s"$root/fine", s"$root/coarse",
      Seq("series"), fineResolutionSec = 100L, resolutionSec = 200L)
    val batchDf = fixture.toDF()
      .withColumn("t_sec", (col("ts").cast("long")))
    graft.tsdb.HistRollupStore.write(batchDf, s"$root/direct",
      Seq("series"), "t_sec", "zero_count", "pos_idx", "pos_counts",
      "neg_idx", "neg_counts", 200L, hintCol = Some("hint"))
    def canon(path: String) = s.read.parquet(path)
      .filter(col("window_sec") < 1000L)
      .drop("ts", "bucket")
      .collect().map(_.toSeq).toSet
    val cascaded = canon(s"$root/coarse")
    assert(cascaded == canon(s"$root/direct"))
    assert(cascaded.size == 2)
    // and the cascaded layer serves the stitched read path with the
    // hinted reset intact: 2→5 (+3) | 5→9 HINTED reset (+9) | 9→10
    // (+1) + bucket-2 (+3) | seam 10→1 value reset (+1) | 1→4 (+3)
    // — idx-0 total 17
    val inc = graft.tsdb.HistRollupStore.stitchedIncrease(s,
        s"$root/coarse", Seq("series"), 0L, 1000L)
      .select(col("pos_idx"), col("pos_inc")).as[(Seq[Int], Seq[Double])]
      .head()
    assert(inc == ((Seq(0, 2), Seq(17.0, 3.0))))
  }

  test("toRollupLayer: streamed layer ≡ the batch RollupStore layer") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_rollup").toString
    val fixture = Seq(
      // hour 10: 1 → NaN → 3 → 4; hour 11: reset 2 → 9 (+7);
      // a LATE 10:40 sample (3.0) reorders INTO the chain, and the
      // 10:20 NaN (a Prometheus staleness marker is NaN) pins the
      // non-finite path: under Spark's ordering NaN sits ABOVE every
      // double, so 1→NaN is a skipped-null delta (not a crash),
      // NaN→3 reads as a counter reset contributing +3, min skips
      // NaN, and max RETURNS NaN — the batch writer does all of this
      // via decimal-cast nulls and its double ordering, and the
      // streamed window must match it bitwise
      SeriesEvent(ts("2024-01-01 10:10:00"), "req", 1L, 1.0),
      SeriesEvent(ts("2024-01-01 10:50:00"), "req", 1L, 4.0),
      SeriesEvent(ts("2024-01-01 10:40:00"), "req", 1L, 3.0),
      SeriesEvent(ts("2024-01-01 10:20:00"), "req", 1L, Double.NaN),
      SeriesEvent(ts("2024-01-01 11:05:00"), "req", 1L, 2.0),
      SeriesEvent(ts("2024-01-01 11:45:00"), "req", 1L, 9.0),
      SeriesEvent(ts("2024-01-01 11:30:00"), "view", 2L, 5.0))
    val mem = MemoryStream[SeriesEvent]
    val query = EventsStream.toRollupLayer(mem.toDS(),
      s"$root/layer", s"$root/ckpt",
      windowLenMs = 3600000L, watermarkDelay = "10 minutes").start()
    try {
      mem.addData(fixture: _*)
      query.processAllAvailable()
      // advance the watermark far past every window end → all sealed
      mem.addData(SeriesEvent(ts("2024-01-02 00:00:00"), "req", 1L, 0.0))
      query.processAllAvailable()
    } finally query.stop()
    // batch layer over the SAME rows
    graft.tsdb.RollupStore.write(fixture.toDS().toDF(),
      s"$root/batch", Seq("event_type", "user_id"), "ts", "value", 3600000L)
    val cols = Seq("event_type", "user_id", "window_ms", "n", "vsum",
      "vmin", "vmax", "first_ts_ms", "first_v", "last_ts_ms", "last_v",
      "prev_ts_ms", "prev_v", "vmin_ts_ms", "vmax_nn", "vmax_ts_ms",
      "increase", "resets", "changes", "vsq", "sx", "sxx", "sxy")
    def canon(path: String) = s.read.parquet(path)
      // the 2024-01-02 watermark-advancer window only exists streamed
      .filter(col("window_ms") < 1704153600000L)
      .select(cols.head, cols.tail: _*)
      .withColumn("vsum", col("vsum").cast("decimal(30,8)"))
      .withColumn("increase", col("increase").cast("decimal(30,8)"))
      .withColumn("vsq", col("vsq").cast("decimal(31,16)"))
      .withColumn("sx", col("sx").cast("decimal(20,0)"))
      .withColumn("sxx", col("sxx").cast("decimal(30,0)"))
      .withColumn("sxy", col("sxy").cast("decimal(33,8)"))
      // Scala `==` on boxed doubles unboxes to primitive equality,
      // where NaN != NaN — canonicalize so the bitwise-equal NaN
      // cells (vmax of the NaN-bearing window) compare equal
      .collect().map(_.toSeq.map {
        case d: Double if d.isNaN => "NaN"
        case x => x
      }).toSet
    val streamed = canon(s"$root/layer")
    assert(streamed == canon(s"$root/batch"))
    assert(streamed.size == 3)
    // and the streamed layer serves the standard read path
    val inc = graft.tsdb.RollupStore.stitchedIncrease(s, s"$root/layer",
        Seq("event_type", "user_id"), 1704096000000L, 1704153600000L)
      .filter(col("event_type") === "req")
      .select(col("increase")).as[Double].head()
    // 1→NaN (skipped null) →3 (reset, +3) →4 (+1) | boundary 4→2
    // reset (+2) | 2→9 (+7) = 13
    assert(inc == 13.0)
  }

  test("streaming → cascade composition: stream-sealed fine layer " +
      "cascaded to 1d ≡ batch-direct 1d, and serves routed reads") {
    // the composed production lifecycle: the STREAM seals the FINE
    // (1h) layer continuously; the batch cascade builds the coarse
    // (1d) layer FROM the streamed fine layer (writeFrom — coarser
    // layers never rescan raw); routed queries read the result. The
    // pin: streamed-then-cascaded is BITWISE the layer a direct
    // batch build from raw produces — so the two maintenance paths
    // are interchangeable at any point in the lifecycle.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_cascade").toString
    val fixture = Seq(
      // day 1: NaN staleness marker mid-chain, then growth to 6
      SeriesEvent(ts("2024-01-01 10:10:00"), "req", 1L, 1.0),
      SeriesEvent(ts("2024-01-01 10:40:00"), "req", 1L, Double.NaN),
      SeriesEvent(ts("2024-01-01 11:20:00"), "req", 1L, 4.0),
      SeriesEvent(ts("2024-01-01 23:50:00"), "req", 1L, 6.0),
      // day 2: cross-day reset, then growth
      SeriesEvent(ts("2024-01-02 00:30:00"), "req", 1L, 2.0),
      SeriesEvent(ts("2024-01-02 07:45:00"), "req", 1L, 9.0),
      SeriesEvent(ts("2024-01-02 07:50:00"), "view", 2L, 5.0))
    val mem = MemoryStream[SeriesEvent]
    val query = EventsStream.toRollupLayer(mem.toDS(),
      s"$root/fine", s"$root/ckpt",
      windowLenMs = 3600000L, watermarkDelay = "10 minutes").start()
    try {
      mem.addData(fixture: _*)
      query.processAllAvailable()
      mem.addData(SeriesEvent(ts("2024-01-05 00:00:00"), "req", 1L, 0.0))
      query.processAllAvailable()
    } finally query.stop()
    // batch cascade FROM THE STREAMED fine layer
    graft.tsdb.RollupStore.writeFrom(s, s"$root/fine", s"$root/coarse",
      Seq("event_type", "user_id"), "ts",
      fineResolutionMs = 3600000L, resolutionMs = 86400000L)
    // batch-direct 1d over the same raw samples
    graft.tsdb.RollupStore.write(fixture.toDS().toDF(), s"$root/direct",
      Seq("event_type", "user_id"), "ts", "value", 86400000L)
    val cols = Seq("event_type", "user_id", "window_ms", "n", "vsum",
      "vmin", "vmax", "first_ts_ms", "first_v", "last_ts_ms", "last_v",
      "prev_ts_ms", "prev_v", "vmin_ts_ms", "vmax_nn", "vmax_ts_ms",
      "increase", "resets", "changes", "vsq", "sx", "sxx", "sxy")
    def canon(path: String) = s.read.parquet(path)
      .filter(col("window_ms") < 1704412800000L) // drop the advancer day
      .select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq.map {
        case d: Double if d.isNaN => "NaN"
        case x => x
      }).toSet
    val cascaded = canon(s"$root/coarse")
    assert(cascaded == canon(s"$root/direct"))
    assert(cascaded.size == 3) // req day1, req day2, view day2
    // the routed read path serves the streamed-then-cascaded layer:
    // day1 1→NaN(skip)→4(reset,+4)→6(+2) = 6 | seam 6→2 reset (+2)
    // | day2 2→9 (+7) = 15
    val inc = graft.tsdb.RollupStore.stitchedIncrease(s, s"$root/coarse",
        Seq("event_type", "user_id"), 1704067200000L, 1704240000000L)
      .filter(col("event_type") === "req")
      .select(col("increase")).as[Double].head()
    assert(inc == 15.0)
  }
}
