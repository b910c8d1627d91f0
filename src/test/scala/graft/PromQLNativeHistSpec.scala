package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.promql.{HistTable, PromQL, PromQLCompileException, PromQLContext}

/** Native-histogram metrics through the PromQL FRONT-END (the
  * histMetrics sub-grammar): selectors, rate/increase, bucket-wise
  * sum, and the float-producing histogram_* consumers — pinned
  * against hand-computed values on a tiny corpus. The per-function
  * numeric walks themselves are pinned in NativeHistogramSpec; these
  * specs pin the COMPILER plumbing (lookback windows, grid steps,
  * grouping, error paths).
  */
class PromQLNativeHistSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // epoch ms of 2024-01-01 01:00 UTC (the evaluation instant)
  private val T1 = 1704067200000L + 3600000L

  // schema-0 histograms: buckets (1,2](idx 1), (2,4](idx 2);
  // two series of a latency metric, two samples each (counter-style
  // cumulative counts so rate() has a meaningful delta)
  //   (api,i1): @00:00 zero=1 b1=2 b2=4  sum=10.0
  //             @00:50 zero=3 b1=6 b2=10 sum=34.0
  //   (web,i1): @00:10 zero=0 b1=1 b2=0  sum=1.5
  //             @00:40 zero=0 b1=3 b2=8  sum=30.5   (b2 appears late)
  private lazy val hist = Seq(
    ("api", "i1", ts("2024-01-01 00:00:00"), 1L, Seq(1, 2), Seq(2L, 4L), 10.0),
    ("api", "i1", ts("2024-01-01 00:50:00"), 3L, Seq(1, 2), Seq(6L, 10L), 34.0),
    ("web", "i1", ts("2024-01-01 00:10:00"), 0L, Seq(1), Seq(1L), 1.5),
    ("web", "i1", ts("2024-01-01 00:40:00"), 0L, Seq(1, 2), Seq(3L, 8L), 30.5)
  ).toDF("job", "instance", "ts", "zero_count", "pos_idx", "pos_counts", "hsum")

  private lazy val ctx = PromQLContext(
    metrics = Map.empty,
    labelCols = Seq("job", "instance"),
    evalMs = T1,
    lookbackMs = 3600000L, // 1h — covers both samples of each series
    histMetrics = Map("latency" -> HistTable(hist, sumCol = Some("hsum"))))

  private def rows(q: String): Set[Seq[Any]] =
    PromQL.compile(q, ctx).collect().map(_.toSeq).toSet

  // ===== instant selector + consumers =====

  test("histogram_count over an instant hist selector (latest sample per series)") {
    // latest: (api,i1)@00:50 → 3+6+10 = 19; (web,i1)@00:40 → 0+3+8 = 11
    assert(rows("histogram_count(latency)") ==
      Set(Seq("api", "i1", 19.0), Seq("web", "i1", 11.0)))
  }

  test("histogram_sum / histogram_avg read the tracked sum") {
    assert(rows("histogram_sum(latency)") ==
      Set(Seq("api", "i1", 34.0), Seq("web", "i1", 30.5)))
    assert(rows("histogram_avg(latency)") ==
      Set(Seq("api", "i1", 34.0 / 19.0), Seq("web", "i1", 30.5 / 11.0)))
  }

  test("matchers and offset apply to hist selectors") {
    assert(rows("""histogram_count(latency{job="web"})""") ==
      Set(Seq("web", "i1", 11.0)))
    // offset 30m → window [23:30, 00:30): latest is the FIRST sample
    assert(rows("histogram_count(latency offset 30m)") ==
      Set(Seq("api", "i1", 7.0), Seq("web", "i1", 1.0)))
  }

  test("histogram_quantile over a native-hist selector walks the buckets") {
    // (api,i1) latest: zero=3, b1=6 over (1,2], b2=10 over (2,4];
    // total 19, rank 0.5*19 = 9.5; cum after zero+b1 = 9 < 9.5 →
    // lands in b2: 2 + 2*((9.5-9)/10) = 2.1
    val r = PromQL.compile("histogram_quantile(0.5, latency)", ctx)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(r.contains(("api", "i1", 2.1)))
  }

  test("histogram_fraction interpolates bucket overlap") {
    // (web,i1) latest: b1=3 over (1,2], b2=8 over (2,4]; [1,2] covers
    // b1 fully, b2 not at all → 3/11
    assert(rows("""histogram_fraction(1, 2, latency{job="web"})""") ==
      Set(Seq("web", "i1", 3.0 / 11.0)))
  }

  test("histogram_stddev/stdvar fold bucket midpoints") {
    // (web,i1): count 11, mean 30.5/11; mids: b1 → 1.5, b2 → 3
    val mean = 30.5 / 11.0
    val expect = (3.0 * (1.5 - mean) * (1.5 - mean) +
      8.0 * (3.0 - mean) * (3.0 - mean)) / 11.0
    val r = rows("""histogram_stdvar(latency{job="web"})""")
    assert(r == Set(Seq("web", "i1", expect)))
    assert(rows("""histogram_stddev(latency{job="web"})""") ==
      Set(Seq("web", "i1", math.sqrt(expect))))
  }

  // ===== rate / increase =====

  private def byJob(q: String): Map[String, Double] =
    PromQL.compile(q, ctx).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("rate over a hist range selector is the bucket-wise counter rate") {
    // (api,i1): dt=3000s, deltas zero=2 b1=4 b2=6; (web,i1): dt=1800s,
    // deltas zero=0 b1=2 b2=8 → histogram_count(rate) = Σdeltas/dt
    val r = byJob("histogram_count(rate(latency[1h]))")
    assert(close(r("api"), 12.0 / 3000.0) && close(r("web"), 10.0 / 1800.0))
  }

  test("increase is the clamped bucket delta over the sampled span") {
    val r = byJob("histogram_count(increase(latency[1h]))")
    assert(close(r("api"), 12.0) && close(r("web"), 10.0))
  }

  test("missing-first buckets read as 0 in rate (late-appearing b2)") {
    // (web,i1): b2 absent at 00:10, 8 at 00:40 → populated in the
    // rate vector; q=1 → upper bound of the last populated bucket
    val r = byJob("histogram_quantile(1, rate(latency[1h]))")
    assert(close(r("web"), 4.0))
  }

  // ===== bucket-wise sum =====

  test("sum by aggregates bucket-wise and composes with quantile") {
    // sum by (instance): (api,i1)+(web,i1) latest samples →
    // zero=3, b1=9, b2=18; count = 30
    assert(rows("histogram_count(sum by (instance) (latency))") ==
      Set(Seq("i1", 30.0)))
    // tracked sums add: 34.0 + 30.5
    assert(rows("histogram_sum(sum by (instance) (latency))") ==
      Set(Seq("i1", 64.5)))
    // quantile over the summed histogram: total 30, rank 15;
    // cum zero+b1 = 12 < 15 → b2: 2 + 2*((15-12)/18)
    val r = PromQL.compile(
      "histogram_quantile(0.5, sum by (instance) (latency))", ctx)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(r == Set(("i1", 2.0 + 2.0 * (3.0 / 18.0))))
  }

  test("global sum (no grouping) still works and stays empty on empty vectors") {
    assert(rows("histogram_count(sum(latency))") == Set(Seq(30.0)))
    assert(rows("""histogram_count(sum(latency{job="nope"}))""") == Set.empty)
  }

  test("sum of rate composes (the production alerting shape)") {
    // rates: api (2+4+6)/3000, web (0+2+8)/1800
    val out = PromQL.compile(
        "histogram_count(sum by (instance) (rate(latency[1h])))", ctx)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out.map(_._1) == Seq("i1"))
    assert(close(out.head._2, 12.0 / 3000.0 + 10.0 / 1800.0))
  }

  // ===== NHCB (custom-bucket) metrics =====

  private lazy val nhcbCtx = {
    // bounds (1.0, 2.0, 4.0]; one series, one sample: b0=2 b1=6 b2=2
    val df = Seq(
      ("api", "i1", ts("2024-01-01 00:50:00"), 0L, Seq(0, 1, 2),
        Seq(2L, 6L, 2L), 14.0)
    ).toDF("job", "instance", "ts", "zero_count", "pos_idx",
      "pos_counts", "hsum")
    ctx.copy(histMetrics = Map("lat_nhcb" -> HistTable(df,
      sumCol = Some("hsum"), schema = -53,
      customValues = Seq(1.0, 2.0, 4.0))))
  }

  test("NHCB metrics run the classic-bucket walk from the string") {
    // total 10, rank 5; cum after b0 = 2 < 5 → b1: 1 + 1*((5-2)/6)
    val q = PromQL.compile("histogram_quantile(0.5, lat_nhcb)", nhcbCtx)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(q == Set(("api", 1.0 + 3.0 / 6.0)))
    // bound-agnostic folds work unchanged
    assert(PromQL.compile("histogram_count(lat_nhcb)", nhcbCtx)
      .collect().head.getDouble(2) == 10.0)
    assert(PromQL.compile("histogram_avg(lat_nhcb)", nhcbCtx)
      .collect().head.getDouble(2) == 1.4)
  }

  test("NHCB: midpoint-based consumers fail loudly (schema -53)") {
    val e1 = intercept[PromQLCompileException](
      PromQL.compile("histogram_stdvar(lat_nhcb)", nhcbCtx).collect())
    assert(e1.getMessage.contains("custom-bucket"))
    val e2 = intercept[PromQLCompileException](
      PromQL.compile("histogram_fraction(1, 2, lat_nhcb)", nhcbCtx)
        .collect())
    assert(e2.getMessage.contains("custom-bucket"))
  }

  // ===== counter resets =====

  test("rate/increase add the post-reset histogram across a counter reset") {
    // (api,i1) gains a third RESETTING sample: every bucket drops at
    // 00:55 → reset; increase = (pre-reset deltas) + (post-reset
    // histogram whole). zero: (3-1) + 1 = 3; b1: (6-2) + 1 = 5;
    // b2: (10-4) + 2 = 8 → count(increase) = 16 over dt=3300s
    val withReset = hist.union(Seq(
      ("api", "i1", ts("2024-01-01 00:55:00"), 1L, Seq(1, 2), Seq(1L, 2L), 2.0)
    ).toDF("job", "instance", "ts", "zero_count", "pos_idx", "pos_counts",
      "hsum"))
    val rctx = ctx.copy(histMetrics =
      Map("latency" -> HistTable(withReset, sumCol = Some("hsum"))))
    val inc = PromQL.compile("histogram_count(increase(latency[1h]))", rctx)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(close(inc("api"), 16.0))
    assert(close(inc("web"), 10.0)) // unchanged, reset-free
    val rate = PromQL.compile("histogram_count(rate(latency[1h]))", rctx)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(close(rate("api"), 16.0 / 3300.0))
  }

  test("resets() over a native-histogram range counts restarts") {
    val withReset = hist.union(Seq(
      ("api", "i1", ts("2024-01-01 00:55:00"), 1L, Seq(1, 2), Seq(1L, 2L), 2.0)
    ).toDF("job", "instance", "ts", "zero_count", "pos_idx", "pos_counts",
      "hsum"))
    val rctx = ctx.copy(histMetrics =
      Map("latency" -> HistTable(withReset, sumCol = Some("hsum"))))
    assert(byJobQ("resets(latency[1h])", rctx) ==
      Map("api" -> 1.0, "web" -> 0.0))
  }

  private def byJobQ(q: String, c: PromQLContext): Map[String, Double] =
    PromQL.compile(q, c).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap

  // ===== range (grid) mode =====

  test("range mode: bucket-wise sum aggregates per step (HistSumAgg grid keys)") {
    // steps 00:30 / 01:00: at 00:30 the latest samples are
    // (api)@00:00 count 7 and (web)@00:10 count 1 → summed 8; at
    // 01:00 counts 19 + 11 → 30
    val out = PromQL.compileRange(
        "histogram_count(sum by (instance) (latency))", ctx,
        startMs = T1 - 1800000L, endMs = T1, stepMs = 1800000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("i1", T1 - 1800000L, 8.0), ("i1", T1, 30.0)))
  }

  test("range mode evaluates hist consumers per step") {
    // steps 00:30 and 01:00, lookback 1h: at 00:30 the latest
    // samples are (api)@00:00 count 7, (web)@00:10 count 1; at
    // 01:00 counts 19 / 11
    val out = PromQL.compileRange("histogram_count(latency)", ctx,
        startMs = T1 - 1800000L, endMs = T1, stepMs = 1800000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("api", T1 - 1800000L, 7.0), ("web", T1 - 1800000L, 1.0),
      ("api", T1, 19.0), ("web", T1, 11.0)))
  }

  // ===== error paths =====

  test("a hist metric in float context fails with a pointed message") {
    val e = intercept[PromQLCompileException](rows("latency * 2"))
    assert(e.getMessage.contains("native-histogram metric"))
  }

  test("histogram_sum over a rate vector fails (no tracked sum)") {
    val e = intercept[PromQLCompileException](
      rows("histogram_sum(rate(latency[1h]))"))
    assert(e.getMessage.contains("tracked observation sum"))
  }

  test("histogram functions on a float vector fail loudly") {
    val floatCtx = ctx.copy(metrics = Map("reqs" ->
      Seq(("api", "i1", ts("2024-01-01 00:59:00"), 1.0))
        .toDF("job", "instance", "ts", "value")))
    val e = intercept[PromQLCompileException](
      PromQL.compile("histogram_count(reqs)", floatCtx).collect())
    assert(e.getMessage.contains("native-histogram vector"))
  }

  // ===== FLOAT histograms (double zero/bucket counts) =====

  test("float-count hist vectors run the same compiled paths") {
    // the same shape with DOUBLE counts (recording-rule output):
    // every fold accumulates in double, so the identical queries
    // compile and the values scale linearly with the counts
    val fhist = Seq(
      ("api", "i1", ts("2024-01-01 00:00:00"), 0.5, Seq(1, 2),
        Seq(1.0, 2.0), 10.0),
      ("api", "i1", ts("2024-01-01 00:50:00"), 1.5, Seq(1, 2),
        Seq(3.0, 5.0), 34.0),
      ("web", "i1", ts("2024-01-01 00:40:00"), 0.0, Seq(1), Seq(5.5), 30.5)
    ).toDF("job", "instance", "ts", "zero_count", "pos_idx",
      "pos_counts", "hsum")
    val fctx = ctx.copy(histMetrics =
      Map("latency" -> HistTable(fhist, sumCol = Some("hsum"))))
    def frows(q: String): Set[Seq[Any]] =
      PromQL.compile(q, fctx).collect().map(_.toSeq).toSet
    assert(frows("histogram_count(latency)") ==
      Set(Seq("api", "i1", 9.5), Seq("web", "i1", 5.5)))
    assert(frows("histogram_sum(latency)") ==
      Set(Seq("api", "i1", 34.0), Seq("web", "i1", 30.5)))
    // quantile: (api,i1) latest zero=1.5, b1=3 (1,2], b2=5 (2,4];
    // total 9.5, rank 0.5*9.5=4.75; cum zero+b1=4.5 < 4.75 → b2:
    // 2 + 2*((4.75-4.5)/5) = 2.1
    val q = PromQL.compile("histogram_quantile(0.5, latency)", fctx)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2))).toSet
    assert(q.contains(("api", "i1", 2.1)))
    // bucket-wise sum-by then quantile (HistSumAgg path, double cnt)
    val sq = PromQL.compile(
        "histogram_quantile(0.5, sum by (instance) (latency))", fctx)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    // i1 summed: zero=1.5, b1=3+5.5=8.5, b2=5; total 15, rank 7.5;
    // cum zero+b1 = 10 >= 7.5 → lands in b1: 1 + 1*((7.5-1.5)/8.5)
    assert(sq == Set(("i1", 1.0 + (7.5 - 1.5) / 8.5)))
  }
}
