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
}
