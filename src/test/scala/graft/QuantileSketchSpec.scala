package graft

import java.sql.Timestamp
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch
import graft.tsdb.QuantileSketchStore

/** The GK quantile-sketch layer ([[graft.functions.QuantileSketch]] +
  * [[graft.tsdb.QuantileSketchStore]]): codec fidelity, the
  * deterministic ±ε·n rank guarantee through the aggregate AND
  * through merged per-window layer sketches, and the non-finite-skip
  * convention. The `ts_quantile_sketch` gate pins the same rank
  * contract against the driver's events table.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("codec roundtrip preserves the summary (count + queries)") {
    var qs = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 0.01, Array.empty, 0L, false)
    (1 to 1000).foreach(i => qs = qs.insert(i.toDouble))
    val back = QuantileSketch.fromBytes(QuantileSketch.toBytes(qs))
    assert(back.count == 1000L)
    assert(back.relativeError == 0.01)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      assert(back.query(q) == qs.compress().query(q), s"q=$q diverged")
  }

  test("sketchAgg: distributed build obeys the rank bound") {
    // values 1..n → value IS its rank, so the GK guarantee reads
    // directly as |answer − q·n| ≤ ε·n (+1 for rank/value offset)
    val n = 10000
    val df = (1 to n).map(i => ("a", i.toDouble)).toDF("s", "v")
      .repartition(8) // partial buffers must merge across partitions
    val sk = df.groupBy("s")
      .agg(QuantileSketch.sketchAgg(col("v"), 0.01).as("sk"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val v = sk.select(QuantileSketch.query(col("sk"), lit(q)))
        .as[Double].head()
      assert(math.abs(v - q * n) <= 0.02 * n + 1,
        s"q=$q answered $v, want within ${0.02 * n + 1} of ${q * n}")
    }
  }

  test("layer: merged per-window sketches hold the 2ε rank contract; " +
      "NaN skipped; empty range empty") {
    def ts(s: String) = Timestamp.valueOf(s)
    val base = 1704067200000L // 2024-01-01T00:00Z
    val day = 86400000L
    // three day-windows, values interleaved so no window is a
    // contiguous value range; one NaN staleness marker
    val rows = (0 until 900).map { i =>
      val d = i % 3
      ("a", new Timestamp(base + d * day + (i / 3) * 60000L),
        ((i * 37) % 900 + 1).toDouble)
    } :+ (("a", ts("2024-01-02 10:00:00"), Double.NaN))
    val df = rows.toDF("s", "ts", "v")
    val p = "/tmp/graft_qsketch_spec"
    QuantileSketchStore.write(df, p, Seq("s"), "ts", "v", day,
      relativeError = 0.01)
    // NaN skipped: total sketched count is 900, not 901
    val counts = QuantileSketchStore.read(spark, p)
      .select(col("qsketch")).collect()
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]](0)).count)
    assert(counts.sum == 900L)
    // merged 3-day quantile: rank of the answer among the 900 raw
    // values within ±2ε·n of q·n (values are a permutation of
    // 1..900, so rank == value)
    for (q <- Seq(0.5, 0.9)) {
      val v = QuantileSketchStore.quantileOverTime(spark, p, Seq("s"), q,
        base, base + 3 * day).select("value").as[Double].head()
      assert(math.abs(v - q * 900) <= 0.02 * 900 + 1,
        s"q=$q answered $v")
    }
    // an aligned range past the data: no series rows at all
    assert(QuantileSketchStore.quantileOverTime(spark, p, Seq("s"), 0.5,
      base + 10 * day, base + 11 * day).count() == 0)
  }

  test("persisted blob version: toBytes leads with FormatVersion; an " +
      "unknown version rejects loudly instead of misparsing") {
    var qs = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 0.01, Array.empty, 0L, false)
    qs = qs.insert(1.0)
    val bytes = QuantileSketch.toBytes(qs)
    assert(bytes(0) == QuantileSketch.FormatVersion)
    val future = bytes.clone()
    future(0) = (QuantileSketch.FormatVersion + 1).toByte
    val e = intercept[IllegalArgumentException] {
      QuantileSketch.fromBytes(future)
    }
    assert(e.getMessage.contains("version"))
  }

  test("pre-epoch range: bucket bounds round toward -inf (floorDiv), so " +
      "a bucket straddling a negative range bound still serves") {
    val day = 86400000L
    val hour = 3600000L
    // one sample two hours into the day starting at -2d; hour windows,
    // day buckets → bucket index -2
    val rows = Seq(("a", new Timestamp(-2 * day + 2 * hour), 42.0))
      .toDF("s", "ts", "v")
    val p = "/tmp/graft_qsketch_preepoch"
    QuantileSketchStore.write(rows, p, Seq("s"), "ts", "v", hour)
    // the range opens mid-bucket at -2d+1h: truncating division would
    // compute lower bound -1 and silently exclude bucket -2
    val v = QuantileSketchStore.quantileOverTime(spark, p, Seq("s"), 1.0,
      -2 * day + hour, -day).select("value").as[Double].head()
    assert(v == 42.0)
  }

  test("all-NaN series: window rows with empty sketches answer NaN — " +
      "store and PromQL paths agree with each other and with raw on " +
      "series presence") {
    import graft.tsdb.promql.{PromQL, PromQLContext}
    val base = 1704067200000L
    val hour = 3600000L
    val rows = ((0 until 60).map(i =>
      ("nan_only", new Timestamp(base + i * 60000L), Double.NaN)) ++
      (0 until 60).map(i =>
        ("real", new Timestamp(base + i * 60000L), (i + 1).toDouble)))
      .toDF("s", "ts", "value")
    val p = "/tmp/graft_qsketch_allnan"
    QuantileSketchStore.write(rows, p, Seq("s"), "ts", "value", hour)
    // store path: both series present, NaN for the all-NaN one
    val store = QuantileSketchStore.quantileOverTime(spark, p, Seq("s"),
      0.5, base, base + hour).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(store.keySet == Set("nan_only", "real"))
    assert(store("nan_only").isNaN)
    // PromQL routed path: same presence and NaN as the raw exact path
    def ctx(optIn: Boolean) = PromQLContext(
      metrics = Map("m" -> rows), labelCols = Seq("s"),
      evalMs = base + hour,
      quantileSketches = if (optIn) Map("m" -> Seq(
        graft.tsdb.RollupStore.RollupLayer(p, hour))) else Map.empty)
    def res(optIn: Boolean) =
      PromQL.compile("quantile_over_time(0.5, m[1h])", ctx(optIn))
        .collect().map(r =>
          r.getAs[String]("s") -> r.getAs[Double]("value")).toMap
    val routed = res(true)
    val raw = res(false)
    assert(routed.keySet == raw.keySet && routed.keySet.contains("nan_only"))
    assert(routed("nan_only").isNaN && raw("nan_only").isNaN)
  }

  test("PromQL opt-in: quantile_over_time routes to registered sketch " +
      "layers on aligned ranges, falls back to the exact raw path " +
      "otherwise") {
    import graft.tsdb.promql.{PromQL, PromQLContext}
    val base = 1704067200000L
    val hour = 3600000L
    val rows = (0 until 300).map(i =>
      ("a", new Timestamp(base + i * 60000L),
        ((i * 77) % 300 + 1).toDouble)).toDF("s", "ts", "value")
    val p = "/tmp/graft_qsketch_promql_spec"
    QuantileSketchStore.write(rows, p, Seq("s"), "ts", "value", hour)
    def ctx(optIn: Boolean, evalMs: Long) = PromQLContext(
      metrics = Map("m" -> rows), labelCols = Seq("s"), evalMs = evalMs,
      quantileSketches = if (optIn) Map("m" -> Seq(
        graft.tsdb.RollupStore.RollupLayer(p, hour))) else Map.empty)
    def plan(optIn: Boolean, evalMs: Long) =
      PromQL.compile("quantile_over_time(0.9, m[5h])", ctx(optIn, evalMs))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    def value(optIn: Boolean, evalMs: Long) =
      PromQL.compile("quantile_over_time(0.9, m[5h])", ctx(optIn, evalMs))
        .select("value").as[Double].head()
    val aligned = base + 5 * hour
    // opted in + aligned: the plan reads the sketch layer, and the
    // answer (an actual retained sample) holds the rank contract
    // over the 300 in-range values (a permutation of 1..300, so
    // rank == value)
    assert(plan(true, aligned).contains("graft_qsketch_promql_spec"))
    val v = value(true, aligned)
    assert(math.abs(v - 0.9 * 300) <= 0.02 * 300 + 1, s"answered $v")
    // misaligned instant: silent fallback to the raw interpolated
    // path — bitwise the no-opt-in answer
    assert(!plan(true, aligned + 1).contains("graft_qsketch_promql_spec"))
    assert(value(true, aligned + 1) == value(false, aligned + 1))
    // no opt-in: raw even when aligned
    assert(!plan(false, aligned).contains("graft_qsketch_promql_spec"))
  }

  test("cascade writeFrom: counts compose exactly, answers hold the " +
      "rank contract") {
    def ts(ms: Long) = new Timestamp(ms)
    val base = 1704067200000L
    val hour = 3600000L
    val rows = (0 until 600).map(i =>
      ("a", ts(base + i * 120000L), ((i * 41) % 600 + 1).toDouble))
      .toDF("s", "ts", "v")
    val fine = "/tmp/graft_qsketch_casc_fine"
    val coarse = "/tmp/graft_qsketch_casc_day"
    QuantileSketchStore.write(rows, fine, Seq("s"), "ts", "v", hour)
    QuantileSketchStore.writeFrom(spark, fine, coarse, Seq("s"), "ts",
      fineResolutionMs = hour, resolutionMs = 86400000L)
    // n is order-independent: the cascaded day window holds all 600
    val n = QuantileSketchStore.read(spark, coarse)
      .select(col("qsketch")).collect()
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]](0)).count)
    assert(n.toSeq == Seq(600L))
    // and the cascaded answer obeys the same contract (values are a
    // permutation of 1..600 → rank == value)
    val v = QuantileSketchStore.quantileOverTime(spark, coarse, Seq("s"),
      0.9, base, base + 86400000L).select("value").as[Double].head()
    assert(math.abs(v - 0.9 * 600) <= 0.02 * 600 + 1, s"answered $v")
    // misaligned cascade rejects loudly, like the rollup cascade
    intercept[IllegalArgumentException] {
      QuantileSketchStore.writeFrom(spark, fine, "/tmp/never", Seq("s"),
        "ts", fineResolutionMs = hour, resolutionMs = 90 * 60000L)
    }
  }

  test("streamed sketch layer: sealed counts ≡ batch; small-n answers " +
      "exact and equal through the standard read path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_qsketch_stream").toString
    def t(s: String) = Timestamp.valueOf(s)
    val fixture = Seq(
      graft.streaming.SeriesEvent(t("2024-01-01 10:05:00"), "req", 1L, 3.0),
      graft.streaming.SeriesEvent(t("2024-01-01 10:25:00"), "req", 1L, 9.0),
      graft.streaming.SeriesEvent(t("2024-01-01 10:45:00"), "req", 1L, 1.0),
      graft.streaming.SeriesEvent(t("2024-01-01 11:15:00"), "req", 1L, 7.0),
      graft.streaming.SeriesEvent(t("2024-01-01 11:35:00"), "view", 2L, 5.0))
    val mem = MemoryStream[graft.streaming.SeriesEvent]
    val query = graft.streaming.EventsStream.toQuantileSketchLayer(
      mem.toDF(), s"$root/sk", s"$root/ckpt",
      windowLenMs = 3600000L, watermarkDelay = "10 minutes").start()
    try {
      mem.addData(fixture: _*)
      query.processAllAvailable()
      mem.addData(graft.streaming.SeriesEvent(
        t("2024-01-02 00:00:00"), "req", 1L, 0.0)) // watermark advancer
      query.processAllAvailable()
    } finally query.stop()
    graft.tsdb.QuantileSketchStore.write(
      fixture.toDF(), s"$root/batch",
      Seq("event_type", "user_id"), "ts", "value", 3600000L)
    def summary(path: String) = spark.read.parquet(path)
      .filter(col("window_ms") < 1704153600000L) // drop the advancer
      .select(col("event_type"), col("user_id"), col("window_ms"),
        col("qsketch"))
      .collect().map { r =>
        val qs = QuantileSketch.fromBytes(r.getAs[Array[Byte]](3))
        // below the compress threshold GK retains every sample, so
        // the query is the EXACT order statistic — deterministic
        // under any insertion order
        ((r.getString(0), r.getLong(1), r.getLong(2)),
          (qs.count, qs.query(0.5), qs.query(1.0)))
      }.toMap
    assert(summary(s"$root/sk") == summary(s"$root/batch"))
    assert(summary(s"$root/sk").size == 3)
    // and the streamed layer serves the standard read path
    val v = graft.tsdb.QuantileSketchStore.quantileOverTime(spark,
        s"$root/sk", Seq("event_type", "user_id"), 1.0,
        1704103200000L, 1704110400000L) // [10:00, 12:00) UTC
      .filter(col("event_type") === "req")
      .select("value").as[Double].head()
    assert(v == 9.0)
  }
}
