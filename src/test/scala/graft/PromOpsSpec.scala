package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.tsdb.PromOps

class PromOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // one series "a": counter 0 → 10 → 4 (reset) → 9; one series "b"
  private def df = Seq(
    ("a", ts("2024-01-01 00:00:00"), 0.0),
    ("a", ts("2024-01-01 00:01:00"), 10.0),
    ("a", ts("2024-01-01 00:02:00"), 4.0),
    ("a", ts("2024-01-01 00:03:00"), 9.0),
    ("b", ts("2024-01-01 00:00:30"), 5.0)
  ).toDF("series", "ts", "value")

  test("increase applies counter-reset semantics") {
    val out = PromOps.increase(df, Seq("series"), "ts", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: +10, reset→+4, +5 = 19; b: single sample → 0
    assert(out("a") == 19.0)
    assert(out("b") == 0.0)
  }

  test("rate divides increase by the range seconds") {
    val out = PromOps.rate(df, Seq("series"), "ts", "value", rangeSeconds = 180.0)
      .select("series", "rate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 19.0 / 180.0) < 1e-12)
  }

  test("lastPoint picks the latest sample per series") {
    val out = PromOps.lastPoint(df, Seq("series"), "ts")
      .select("series", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 9.0, "b" -> 5.0))
  }

  test("lastPoint breaks timestamp ties deterministically") {
    val dup = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0, 1L),
      ("a", ts("2024-01-01 00:00:00"), 2.0, 2L)
    ).toDF("series", "ts", "value", "seq")
    val out = PromOps.lastPoint(dup, Seq("series"), "ts", tieBreak = Seq("seq"))
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(2.0)) // highest seq wins (desc ordering)
  }

  test("resets counts strict decreases only") {
    val out = PromOps.resets(df, Seq("series"), "ts", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 1L) // 10 -> 4 is the only reset
    assert(out("b") == 0L)
  }

  test("delta is last minus first, sign preserved") {
    val out = PromOps.delta(df, Seq("series"), "ts", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 9.0)  // 9 - 0
    assert(out("b") == 0.0)
  }

  test("aggregateBy collapses series sharing the by-labels") {
    val out = PromOps.aggregateBy(df, Seq.empty, "ts", "value", "hour")
      .select("sum_value", "n_series_samples").collect()
    assert(out.length == 1)
    assert(out.head.getDouble(0) == 28.0 && out.head.getLong(1) == 5L)
  }

  test("alignToSteps materializes the instant vector per step with lookback") {
    // step = 1h, lookback = 2h over 2024-01-01 .. 2024-01-02
    val data = Seq(
      ("a", ts("2024-01-01 00:30:00"), 1.0), // serves 01:00 and 02:00 steps
      ("a", ts("2024-01-01 01:30:00"), 2.0)  // shadows at 02:00, serves 03:00
    ).toDF("series", "ts", "value")
    val out = PromOps.alignToSteps(data, Seq("series"), "ts", "value",
        "2024-01-01", "2024-01-02", stepMs = 3600000L, lookbackMs = 7200000L)
      .orderBy("step_ms")
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    val hour = 3600000L
    val base = 1704067200000L // 2024-01-01T00:00Z
    assert(out.toSeq == Seq(
      (base + 1 * hour, 1.0), // latest at 01:00 is the 00:30 sample
      (base + 2 * hour, 2.0), // 01:30 shadows 00:30
      (base + 3 * hour, 2.0)  // still within 2h lookback
    ))
  }

  test("downsample buckets per series per window") {
    val out = PromOps.downsample(df, Seq("series"), "ts", "value", "minute")
      .filter(col("series") === "a")
      .collect()
    assert(out.length == 4) // four distinct minutes for series a
  }

  test("topKSeries ranks series by range-sum within each group") {
    import spark.implicits._
    val data = Seq(
      ("api", 1L, 10.0), ("api", 1L, 5.0), // sum 15
      ("api", 2L, 20.0),                   // sum 20
      ("api", 3L, 1.0),                    // sum 1
      ("web", 7L, 2.0)
    ).toDF("job", "instance", "value")
    val out = PromOps.topKSeries(data, Seq("job"), Seq("instance"), "value", 2)
      .orderBy("job", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(("api", 2L, 1L), ("api", 1L, 2L), ("web", 7L, 1L)))
  }

  test("GLOBAL topKSeries (empty groupCols) uses TakeOrderedAndProject, same ranks and ties") {
    import spark.implicits._
    val data = Seq(
      ("api", 1L, 10.0), ("api", 1L, 5.0), // (api,1) sum 15
      ("api", 2L, 20.0),                   // (api,2) sum 20
      ("web", 2L, 15.0),                   // (web,2) sum 15: ties (api,1)
      ("web", 7L, 2.0),
      ("api", 3L, 1.0)
    ).toDF("job", "instance", "value")
    val df = PromOps.topKSeries(data, Nil, Seq("job", "instance"), "value", 3)
    // the global path must not plan ANY window (the old shape was a
    // single-partition WindowExec); the k-row selection is
    // TakeOrderedAndProject
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
    val out = df.orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    // value desc, then (job, instance) asc on the 15.0 tie
    assert(out.toSeq == Seq(
      ("api", 2L, 20.0, 1L), ("api", 1L, 15.0, 2L), ("web", 2L, 15.0, 3L)))
    val bot = PromOps.bottomKSeries(data, Nil, Seq("job", "instance"),
        "value", 2)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(bot.toSeq == Seq(("api", 3L, 1L), ("web", 7L, 2L)))
  }

  test("quantileOverTime interpolates between order statistics") {
    import spark.implicits._
    val data = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0)
    ).toDF("series", "value")
    val q9 = PromOps.quantileOverTime(data, Seq("series"), "value", 0.9)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // idx = 0.9 * (5-1) = 3.6 → 4 + 0.6 * (5-4) = 4.6
    assert(math.abs(q9("a")._1 - 4.6) < 1e-12 && q9("a")._2 == 5L)
    assert(q9("b")._1 == 10.0) // single sample: all quantiles = it
    val med = PromOps.quantileOverTime(data, Seq("series"), "value", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med("a") == 3.0)
  }

  test("binaryOp matches one-to-one on labels and drops unmatched") {
    import spark.implicits._
    val clicks = Seq((1L, 10.0), (2L, 6.0), (3L, 4.0)).toDF("user_id", "value")
    val views = Seq((1L, 5.0), (2L, 3.0), (9L, 7.0)).toDF("user_id", "value")
    val out = PromOps.binaryOp(clicks, views, Seq("user_id"), "value",
        (l, r) => l / r, outCol = "ratio")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // users 3 and 9 are unmatched → dropped, PromQL vector matching
    assert(out == Map(1L -> 2.0, 2L -> 2.0))
  }

  // cumulative le-buckets: 2 obs ≤0.1, 6 ≤0.5, 10 ≤1.0, 12 total
  private def buckets = Seq(
    ("s1", 0.1, 2.0), ("s1", 0.5, 6.0), ("s1", 1.0, 10.0),
    ("s1", Double.PositiveInfinity, 12.0)
  ).toDF("series", "le", "cnt")

  private def hq(df: org.apache.spark.sql.DataFrame, q: Double): Map[String, Double] =
    PromOps.histogramQuantile(df, Seq("series"), q)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("histogramQuantile interpolates inside the covering bucket") {
    // rank = 0.5·12 = 6 → bucket (0.1, 0.5] exactly at its cumulative
    // count → upper bound; rank 0.25·12 = 3 → 0.1 + 0.4·(3−2)/(6−2)
    assert(math.abs(hq(buckets, 0.5)("s1") - 0.5) < 1e-12)
    assert(math.abs(hq(buckets, 0.25)("s1") - 0.2) < 1e-12)
  }

  test("histogramQuantile q=1 answers from the highest finite bound") {
    // rank = 12 lands in the +Inf bucket → Prometheus returns the
    // highest finite upper bound, never Inf
    assert(hq(buckets, 1.0) == Map("s1" -> 1.0))
  }

  test("histogramQuantile q=0 answers the lower edge of the first bucket") {
    // rank = 0 → first bucket, zero offset → its implicit 0 lower edge
    assert(hq(buckets, 0.0) == Map("s1" -> 0.0))
    // a first bucket with le ≤ 0 has no interpolatable lower edge —
    // Prometheus answers its own bound (promql bucketQuantile)
    val neg = Seq(("n", -1.0, 3.0), ("n", Double.PositiveInfinity, 3.0))
      .toDF("series", "le", "cnt")
    assert(hq(neg, 0.4) == Map("n" -> -1.0))
  }

  test("histogramQuantile yields NaN for a zero-observation group") {
    // total = 0 → rank 0, interpolation divides 0/0 → NaN, matching
    // Prometheus's NaN for histograms with no observations
    val empty = Seq(("z", 0.1, 0.0), ("z", Double.PositiveInfinity, 0.0))
      .toDF("series", "le", "cnt")
    val out = PromOps.histogramQuantile(empty, Seq("series"), 0.9).collect()
    assert(out.length == 1 && out(0).getDouble(1).isNaN)
  }

  test("histogram_quantile over rate: the composed Prometheus idiom") {
    // two-bucket counter series at three day-scrapes:
    //   le=1.0:  0 → 30 → 60   (increase 60)
    //   le=+Inf: 0 → 40 → 100  (increase 100)
    val counters = Seq(
      ("x", ts("2024-01-01 00:00:00"), 1.0, 0.0),
      ("x", ts("2024-01-02 00:00:00"), 1.0, 30.0),
      ("x", ts("2024-01-03 00:00:00"), 1.0, 60.0),
      ("x", ts("2024-01-01 00:00:00"), Double.PositiveInfinity, 0.0),
      ("x", ts("2024-01-02 00:00:00"), Double.PositiveInfinity, 40.0),
      ("x", ts("2024-01-03 00:00:00"), Double.PositiveInfinity, 100.0)
    ).toDF("series", "ts", "le", "cnt")
    val rated = PromOps.rate(counters, Seq("series", "le"), "ts", "cnt",
      rangeSeconds = 172800.0)
    // rate of a cumulative histogram is itself cumulative in le
    val r = rated.select("le", "rate").collect()
      .map(row => row.getDouble(0) -> row.getDouble(1)).toMap
    assert(r(1.0) <= r(Double.PositiveInfinity))
    // total rate = 100/172800; rank = 0.5·total = 50/172800 lands in
    // the le=1.0 bucket (60/172800): 0 + 1.0·(50−0)/(60−0) = 5/6
    val out = PromOps.histogramQuantile(rated, Seq("series"), 0.5,
      cntCol = "rate").collect()
    assert(out.length == 1 && math.abs(out(0).getDouble(1) - 5.0 / 6.0) < 1e-12)
  }

  test("histogramQuantile rejects q outside [0,1]") {
    intercept[IllegalArgumentException] { PromOps.histogramQuantile(buckets, Seq("series"), 1.5) }
    intercept[IllegalArgumentException] { PromOps.histogramQuantile(buckets, Seq("series"), -0.1) }
  }

  test("changes counts value transitions, not resets") {
    // a: 0→10→4→9 = 3 changes; b: single sample = 0
    val out = PromOps.changes(df, Seq("series"), "ts", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 0L))
    // constant series: no changes even with many samples
    val const = Seq(("c", ts("2024-01-01 00:00:00"), 7.0),
      ("c", ts("2024-01-01 00:01:00"), 7.0),
      ("c", ts("2024-01-01 00:02:00"), 7.0)).toDF("series", "ts", "value")
    assert(PromOps.changes(const, Seq("series"), "ts", "value")
      .collect().head.getLong(1) == 0L)
  }

  test("irate uses only the last two samples, with counter resets") {
    // a: last two are 4 → 9 over 60 s → 5/60
    val out = PromOps.irate(df, Seq("series"), "ts", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 5.0 / 60.0) < 1e-12)
    // b has a single sample → no row, as in Prometheus
    assert(!out.contains("b"))
    // reset at the tail: 10 → 4 over 60 s → irate = 4/60 (restart)
    val reset = Seq(("r", ts("2024-01-01 00:00:00"), 10.0),
      ("r", ts("2024-01-01 00:01:00"), 4.0)).toDF("series", "ts", "value")
    val rr = PromOps.irate(reset, Seq("series"), "ts", "value")
      .collect().head.getDouble(1)
    assert(math.abs(rr - 4.0 / 60.0) < 1e-12)
  }

  test("deriv recovers an exact linear slope; short series drop") {
    // value = 2·seconds + 5 → slope exactly 2.0/s (decimal closed
    // form: no accumulation error to tolerate)
    val lin = Seq(
      ("l", ts("2024-01-01 00:00:00"), 5.0),
      ("l", ts("2024-01-01 00:00:10"), 25.0),
      ("l", ts("2024-01-01 00:00:25"), 55.0),
      ("s", ts("2024-01-01 00:00:00"), 1.0) // single sample
    ).toDF("series", "ts", "value")
    val out = PromOps.deriv(lin, Seq("series"), "ts", "value",
        originMs = ts("2024-01-01 00:00:00").getTime)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("l" -> 2.0))
  }

  test("deriv drops series whose samples share one timestamp") {
    val flat = Seq(("z", ts("2024-01-01 00:00:00"), 1.0),
      ("z", ts("2024-01-01 00:00:00"), 2.0)).toDF("series", "ts", "value")
    assert(PromOps.deriv(flat, Seq("series"), "ts", "value",
      originMs = ts("2024-01-01 00:00:00").getTime).count() == 0)
  }

  test("predictLinear extrapolates the least-squares line") {
    val lin = Seq(
      ("l", ts("2024-01-01 00:00:00"), 5.0),
      ("l", ts("2024-01-01 00:00:10"), 25.0)
    ).toDF("series", "ts", "value")
    val origin = ts("2024-01-01 00:00:00").getTime
    // predict at eval=+20 s, horizon=+10 s → x=30 s → 2·30+5 = 65
    val out = PromOps.predictLinear(lin, Seq("series"), "ts", "value",
        evalMs = origin + 20000L, horizonMs = 10000L, originMs = origin)
      .collect().head.getDouble(1)
    assert(math.abs(out - 65.0) < 1e-9)
  }

  test("stdvarOverTime computes exact population variance") {
    // values 2, 4, 6: mean 4, var_pop = 8/3
    val v = Seq(("s", 2.0), ("s", 4.0), ("s", 6.0)).toDF("series", "value")
    val row = PromOps.stdvarOverTime(v, Seq("series"), "value").collect().head
    assert(math.abs(row.getDouble(1) - 8.0 / 3.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(row.getLong(3) == 3L)
    // single sample → variance 0, not NaN
    val one = Seq(("o", 5.0)).toDF("series", "value")
    assert(PromOps.stdvarOverTime(one, Seq("series"), "value")
      .collect().head.getDouble(1) == 0.0)
  }

  test("bottomKSeries ranks ascending with deterministic ties") {
    val v = Seq(("g", "s1", 5.0), ("g", "s2", 1.0), ("g", "s3", 3.0),
      ("g", "s4", 1.0)).toDF("grp", "series", "value")
    val out = PromOps.bottomKSeries(v, Seq("grp"), Seq("series"), "value", 2)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(out == Seq("s2", "s4")) // 1.0 tie broken by series name asc
  }

  test("labelReplace anchors the regex and keeps non-matches untouched") {
    val v = Seq(("u42", "x"), ("nope!", "y")).toDF("src", "other")
    val out = PromOps.labelReplace(v, "dst", "src", "u(\\d+)")
      .select("src", "dst").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("u42") == Some("42"))
    assert(out("nope!") == None) // no dst column before → stays null
    // partial match must NOT fire: anchored semantics
    val partial = Seq(("u42-suffix", "x")).toDF("src", "other")
    assert(PromOps.labelReplace(partial, "dst", "src", "u(\\d+)")
      .select("dst").collect().head.isNullAt(0))
  }

  test("labelJoin joins absent labels as empty strings, not skipped") {
    val v = Seq(("click", Some("us")), ("view", None))
      .toDF("event_type", "region")
    val out = PromOps.labelJoin(v, "key", "/", Seq("event_type", "region"))
      .select("key").collect().map(_.getString(0)).toSet
    // concat_ws would yield "view" (null skipped); PromQL keeps the
    // separator with an empty value
    assert(out == Set("click/us", "view/"))
  }

  test("absent yields one row only for an empty selection") {
    assert(PromOps.absent(df.filter(col("series") === "missing"))
      .collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    assert(PromOps.absent(df).count() == 0)
  }

  test("clamp bounds values on both sides") {
    val v = Seq(1.0, 50.0, 99.0).toDF("value")
      .select(PromOps.clamp(col("value"), 20.0, 80.0).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(v == Seq(20.0, 50.0, 80.0))
  }

  test("aggregateDistBy computes exact quantile, mean, population stddev") {
    val d = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      ("a", ts(s"2024-01-01 00:0$i:00"), v)
    }.toDF("series", "ts", "value")
    val r = PromOps.aggregateDistBy(d, Seq("series"), "ts", "value",
      "day", q = 0.5).collect().head
    assert(r.getAs[Double]("quantile") == 2.5)    // interpolated median
    assert(r.getAs[Double]("avg_value") == 2.5)
    // population variance of 1..4 = 1.25
    assert(math.abs(r.getAs[Double]("stddev_value") - math.sqrt(1.25)) < 1e-12)
    assert(r.getAs[Long]("n_samples") == 4L)
  }

  test("doubleExponentialSmoothing runs Holt's recurrence per series") {
    // y=[10,12,13], sf=0.5, tf=0.25: b0=2, s1=12;
    // b1=0.25·2+0.75·2=2, s2=0.5·13+0.5·14=13.5
    val d = Seq(
      ("a", new Timestamp(1000L), 10.0),
      ("a", new Timestamp(2000L), 12.0),
      ("a", new Timestamp(3000L), 13.0),
      ("two", new Timestamp(1000L), 5.0),   // 2 samples → the init level
      ("two", new Timestamp(2000L), 9.0),
      ("one", new Timestamp(1000L), 7.0)    // 1 sample → dropped
    ).toDF("series", "ts", "value")
    val out = PromOps.doubleExponentialSmoothing(d, Seq("series"), "ts",
        "value", sf = 0.5, tf = 0.25)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("smoothed")).toMap
    assert(out == Map("a" -> 13.5, "two" -> 9.0))
  }

  test("binaryOpGroupLeft carries right labels onto every left series") {
    val left = Seq(("click", 1L, 10.0), ("view", 1L, 30.0), ("click", 2L, 8.0))
      .toDF("event_type", "user_id", "value")
    val right = Seq((1L, "gold", 40.0), (2L, "free", 8.0))
      .toDF("user_id", "plan", "value")
    val out = PromOps.binaryOpGroupLeft(left, right, Seq("user_id"),
        Seq("plan"), "value", (l, r) => l / r, outCol = "share")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("user_id"), r.getAs[String]("plan"),
        r.getAs[Double]("share"))).toSet
    assert(out == Set(("click", 1L, "gold", 0.25),
      ("view", 1L, "gold", 0.75), ("click", 2L, "free", 1.0)))
  }

  test("binaryOpGroupLeft fails loudly on a non-unique right vector") {
    val left = Seq(("click", 1L, 10.0)).toDF("event_type", "user_id", "value")
    val dup = Seq((1L, "a", 1.0), (1L, "b", 2.0))
      .toDF("user_id", "plan", "value")
    val ex = intercept[Exception] {
      PromOps.binaryOpGroupLeft(left, dup, Seq("user_id"), Seq("plan"),
        "value", (l, r) => l / r).collect()
    }
    assert(ex.getMessage.contains("group_left") ||
      Option(ex.getCause).exists(_.getMessage.contains("group_left")))
  }

  test("extrapolatedRate extends to near boundaries, halves far ones") {
    // range [0, 100s); samples at 10s/40s/70s, values 5→8→11:
    // sampled=60s, inc=6, avg spacing 30s, threshold 33s.
    // start gap 10s < threshold → extend fully; end gap 30s < threshold
    // → extend fully; zero-guard 60s·(5/6)=50s doesn't bind.
    // increase = 6 · (100s/60s) = 10, rate = 10/100s
    val d = Seq(
      ("a", new Timestamp(10000L), 5.0),
      ("a", new Timestamp(40000L), 8.0),
      ("a", new Timestamp(70000L), 11.0)
    ).toDF("series", "ts", "value")
    val r = PromOps.extrapolatedRate(d, Seq("series"), "ts", "value",
      startMs = 0L, endMs = 100000L).collect().head
    assert(math.abs(r.getAs[Double]("increase") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("rate") - 0.1) < 1e-12)
  }

  test("extrapolatedRate caps the start extension at the zero crossing") {
    // samples 50s/60s values 1→1.5: inc=0.5, sampled=10s, avg=10s,
    // threshold 11s. durationToZero = 10s·(1/0.5)=20s < start gap 50s,
    // 20s ≥ threshold → start extends by avg/2=5s; end gap 40s ≥
    // threshold → 5s. extended=20s, factor=2 → increase 1.0
    val d = Seq(
      ("c", new Timestamp(50000L), 1.0),
      ("c", new Timestamp(60000L), 1.5)
    ).toDF("series", "ts", "value")
    val r = PromOps.extrapolatedRate(d, Seq("series"), "ts", "value",
      startMs = 0L, endMs = 100000L).collect().head
    assert(math.abs(r.getAs[Double]("increase") - 1.0) < 1e-9)
  }

  test("extrapolatedRate drops sub-2-sample series and handles resets") {
    val d = Seq(
      ("one", new Timestamp(10000L), 7.0),              // 1 sample → drop
      ("r", new Timestamp(10000L), 10.0),               // reset series:
      ("r", new Timestamp(50000L), 2.0),                // 10 → 2 (reset)
      ("r", new Timestamp(90000L), 4.0)                 // → 4: inc = 4
    ).toDF("series", "ts", "value")
    val out = PromOps.extrapolatedRate(d, Seq("series"), "ts", "value",
      startMs = 0L, endMs = 100000L)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("r"))
    // inc=4 (0 + reset→2 + 2), sampled=80s, avg=40s, threshold 44s,
    // zero-guard 80s·(10/4)=200s doesn't bind; gaps 10s both sides <
    // threshold → extended=100s, factor=1.25 → increase 5
    assert(math.abs(rows.head.getAs[Double]("increase") - 5.0) < 1e-9)
  }

  test("set operators: and/unless membership, or is left-biased union") {
    val left = Seq(("u1", 1.0), ("u2", 2.0), ("u3", 3.0))
      .toDF("user", "value")
    // u2 appears TWICE on the right — semi/anti must not fan out
    val right = Seq(("u2", 20.0), ("u2", 21.0), ("u4", 40.0))
      .toDF("user", "value")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq.sorted
    assert(pairs(PromOps.vectorAnd(left, right, Seq("user"))) ==
      Seq("u2" -> 2.0))
    assert(pairs(PromOps.vectorUnless(left, right, Seq("user"))) ==
      Seq("u1" -> 1.0, "u3" -> 3.0))
    // or: all of left (u2 keeps ITS value — left bias) + unmatched right
    val or = PromOps.vectorOr(left,
      right.groupBy("user").agg(min("value").as("value")), Seq("user"))
    assert(pairs(or) ==
      Seq("u1" -> 1.0, "u2" -> 2.0, "u3" -> 3.0, "u4" -> 40.0))
  }

  test("absentOverTime flags windowless steps; boundaries are (t-w, t]") {
    // grid: steps 100, 160, 220 (start 100, end 220, step 60), w=60
    val d = Seq(
      ("s", new Timestamp(100000L), 1.0), // x=100 → covers step 100 only
      ("s", new Timestamp(161000L), 1.0)  // x=161 → covers step 220? no:
                                          // 161+60=221 > 220 ≥ 161 → yes
    ).toDF("series", "ts", "value")
    val out = PromOps.absentOverTime(d, "ts", 100L, 220L, 60L, 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // x=100: (40,100] ∋ 100 ✓; (100,160] ∌ 100 (exclusive-left boundary)
    // x=161: (100,160] ∌ 161; (160,220] ∋ 161 ✓
    assert(out.toSeq == Seq(
      (100L, 1L, 0.0), (160L, 0L, 1.0), (220L, 1L, 0.0)))
  }

  test("absentOverTime: sub-step window straddling no step contributes " +
    "nothing (descending-sequence guard)") {
    val d = Seq(("s", new Timestamp(101000L), 1.0)) // covers [101,111)
      .toDF("series", "ts", "value")
    val out = PromOps.absentOverTime(d, "ts", 100L, 200L, 100L, 10L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((100L, 1.0), (200L, 1.0)))
  }
}
