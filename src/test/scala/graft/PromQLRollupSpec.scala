package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tsdb.RollupStore
import graft.tsdb.RollupStore.RollupLayer
import graft.tsdb.promql.{PromQL, PromQLContext}

/** PromQL rollup routing ([[PromQLContext.rollups]]): a routed query
  * must return BITWISE the raw-path answer (the exact-rollup
  * invariant), route only under exact alignment + the res*5 ≤ range
  * rule, and fall back to raw silently otherwise. The gate pair
  * (ts_promql_rollup_*) pins routed-vs-DuckDB on driver data;
  * these specs pin routed-vs-RAW equality per function and the
  * fallback edges on a reset-bearing fixture.
  */
class PromQLRollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val base = 1704067200000L // 2024-01-01T00:00Z
  private val HOUR = 3600000L

  // two counter series over 12h, hourly-ish samples, one reset each
  private lazy val m: DataFrame = {
    val rows = for {
      (series, phase) <- Seq(("a", 0), ("b", 17))
      i <- 0 until 24
    } yield {
      val t = new Timestamp(base + i * 1800000L + phase * 60000L)
      // resets at i==13: drop back near zero
      val v = if (i < 13) 3.0 * i + phase else 2.5 * (i - 13) + 1
      (series, t, v)
    }
    rows.toDF("series", "ts", "value")
  }

  private val layerPath = "/tmp/graft_promql_rollup_spec_1h"
  private lazy val layers: Seq[RollupLayer] = {
    RollupStore.write(m, layerPath, Seq("series"), "ts", "value", HOUR)
    Seq(RollupLayer(layerPath, HOUR))
  }

  private def ctxAt(evalMs: Long, routed: Boolean) = PromQLContext(
    metrics = Map("m" -> m),
    labelCols = Seq("series"),
    evalMs = evalMs,
    lookbackMs = 300000L,
    rollups = if (routed) Map("m" -> layers) else Map.empty)

  private def collectBoth(q: String, evalMs: Long): (Seq[Row2], Seq[Row2]) = {
    def get(routed: Boolean) =
      PromQL.compile(q, ctxAt(evalMs, routed))
        .select("series", "value").as[(String, Double)]
        .collect.toSeq.sortBy(_._1)
    (get(true), get(false))
  }
  private type Row2 = (String, Double)

  private val alignedEval = base + 12 * HOUR

  test("routed rate/increase/resets/changes are bitwise the raw answers") {
    layers
    for (fn <- Seq("rate", "increase", "resets", "changes", "delta",
        "irate", "idelta")) {
      val (routed, raw) = collectBoth(s"$fn(m[6h])", alignedEval)
      assert(routed == raw, s"$fn diverged")
      assert(routed.nonEmpty)
    }
  }

  test("routed irate/idelta reconstruct the last two samples across " +
      "window seams (single-sample last window)") {
    // a series whose LAST aligned window holds exactly ONE sample, so
    // the routed pair must stitch (previous window's last, last
    // window's last) — the prevOf fallback branch — and one whose
    // last window holds ≥2 (the stored-penultimate branch, with a
    // counter reset between exactly those two samples for irate)
    val rows = Seq(
      ("one", ts("2024-01-01 02:10:00"), 5.0),
      ("one", ts("2024-01-01 02:40:00"), 9.0),
      ("one", ts("2024-01-01 03:20:00"), 11.0), // lone sample in [03:00)
      ("two", ts("2024-01-01 02:30:00"), 4.0),
      ("two", ts("2024-01-01 03:10:00"), 8.0),
      ("two", ts("2024-01-01 03:40:00"), 2.0), // reset in the last pair
      // a NaN staleness marker as the LAST sample: both paths run the
      // identical `v >= pv` test (false on NaN) and division — the
      // answers are NaN on both, never a crash or a dropped row
      ("nan", ts("2024-01-01 02:20:00"), 5.0),
      ("nan", ts("2024-01-01 03:30:00"), Double.NaN)
    ).toDF("series", "ts", "value")
    val p = "/tmp/graft_promql_rollup_spec_seam_1h"
    RollupStore.write(rows, p, Seq("series"), "ts", "value", HOUR)
    def ctx(routed: Boolean) = PromQLContext(
      metrics = Map("m" -> rows), labelCols = Seq("series"),
      evalMs = base + 9 * HOUR, lookbackMs = 300000L,
      rollups = if (routed) Map("m" -> Seq(RollupLayer(p, HOUR)))
        else Map.empty)
    for (fn <- Seq("irate", "idelta")) {
      def get(routed: Boolean) =
        PromQL.compile(s"$fn(m[9h])", ctx(routed))
          .select("series", "value").as[(String, Double)]
          .collect.toSeq.sortBy(_._1)
          .map { case (s, v) => (s, if (v.isNaN) "NaN" else v) }
      assert(get(true) == get(false), s"$fn diverged")
      assert(get(true).size == 3)
      assert(get(true).find(_._1 == "nan").get._2 == "NaN")
    }
    // the routed plan reads the layer only
    val plan = PromQL.compile("irate(m[9h])", ctx(routed = true))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft_promql_rollup_spec_seam"))
    // @-pinned instant: an aligned anchor routes too, same answers
    val atSec = (base + 9 * HOUR) / 1000
    def getAt(routed: Boolean) =
      PromQL.compile(s"irate(m[9h] @ $atSec)",
          ctx(routed).copy(evalMs = base + 11 * HOUR + 1))
        .select("series", "value").as[(String, Double)]
        .collect.toSeq.sortBy(_._1)
        .map { case (s, v) => (s, if (v.isNaN) "NaN" else v) }
    assert(getAt(true) == getAt(false))
    assert(getAt(true).size == 3)
  }

  test("routed *_over_time family is bitwise the raw answers") {
    layers
    for (fn <- Seq("sum_over_time", "avg_over_time", "count_over_time",
        "min_over_time", "max_over_time", "first_over_time",
        "last_over_time", "ts_of_first_over_time", "ts_of_last_over_time",
        "stddev_over_time", "stdvar_over_time",
        "ts_of_min_over_time", "ts_of_max_over_time",
        "present_over_time")) {
      val (routed, raw) = collectBoth(s"$fn(m[6h])", alignedEval)
      assert(routed == raw, s"$fn diverged")
      assert(routed.nonEmpty)
    }
  }

  test("routed deriv/predict_linear are bitwise the raw answers") {
    layers
    for (q <- Seq("deriv(m[6h])", "predict_linear(m[6h], 1800)",
        "predict_linear(m[6h], -3600)")) {
      val (routed, raw) = collectBoth(q, alignedEval)
      assert(routed == raw, s"$q diverged")
      assert(routed.nonEmpty)
    }
    // and on a step grid, where each step shifts against the shared
    // regression origin
    def grid(routed: Boolean) =
      PromQL.compileRange("predict_linear(m[6h], 3600)",
          ctxAt(alignedEval, routed), base + 6 * HOUR, base + 12 * HOUR, HOUR)
        .select("series", "step_ms", "value").as[(String, Long, Double)]
        .collect.toSeq.sortBy(r => (r._1, r._2))
    assert(grid(true) == grid(false))
    assert(grid(true).nonEmpty)
  }

  test("routed absent_over_time: emptiness from window rows, both ways") {
    layers
    def absentCount(routed: Boolean, evalMs: Long) =
      PromQL.compile("absent_over_time(m[6h])", ctxAt(evalMs, routed))
        .count()
    // data covers the window → no row, routed and raw alike
    assert(absentCount(routed = true, alignedEval) == 0)
    assert(absentCount(routed = false, alignedEval) == 0)
    // an ALIGNED empty window far past the data → exactly one 1.0
    // row on both paths (presence is exact in the layer)
    val future = base + 48 * HOUR
    assert(absentCount(routed = true, future) == 1)
    assert(absentCount(routed = false, future) == 1)
    // the routed presence test reads the layer
    val plan = PromQL.compile("present_over_time(m[6h])",
        ctxAt(alignedEval, routed = true))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft_promql_rollup_spec_1h"))
  }

  test("routing requires alignment and eligibility; fallback is silent") {
    layers
    def plansRollup(q: String, evalMs: Long): Boolean =
      PromQL.compile(q, ctxAt(evalMs, routed = true))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        .contains("graft_promql_rollup_spec")
    // aligned + eligible (1h*5 <= 6h): routed
    assert(plansRollup("rate(m[6h])", alignedEval))
    // misaligned eval instant: raw
    assert(!plansRollup("rate(m[6h])", alignedEval + 1))
    // too-short range (1h*5 > 4h): raw
    assert(!plansRollup("rate(m[4h])", alignedEval))
    // misaligned range: raw
    assert(!plansRollup("rate(m[90m])", alignedEval))
    // and the fallbacks still answer
    assert(PromQL.compile("rate(m[4h])", ctxAt(alignedEval, routed = true))
      .count() > 0)
    // the moment-sum columns route the whole remaining family when
    // aligned — and still fall back on a misaligned instant
    assert(plansRollup("stddev_over_time(m[6h])", alignedEval))
    assert(plansRollup("deriv(m[6h])", alignedEval))
    assert(!plansRollup("deriv(m[6h])", alignedEval + 1))
    assert(plansRollup("delta(m[6h])", alignedEval))
    assert(!plansRollup("delta(m[6h])", alignedEval + 1))
  }

  test("subquery bodies route through layers: the inner grid is aligned") {
    layers
    // max_over_time((rate(m[6h]))[6h:1h]): the subquery compiles its
    // body on an inner 1h-step grid — every inner step is a 1h
    // multiple, the range is layer-aligned, so the INNER rate must
    // route to the layer while the outer fold consumes synthetic
    // samples; answers stay bitwise the raw compilation's
    val q = "max_over_time((rate(m[6h]))[6h:1h])"
    def run(routed: Boolean) =
      PromQL.compile(q, ctxAt(alignedEval, routed))
        .select("series", "value").as[(String, Double)]
        .collect.toSeq.sortBy(_._1)
    assert(run(true) == run(false))
    assert(run(true).nonEmpty)
    val plan = PromQL.compile(q, ctxAt(alignedEval, routed = true))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft_promql_rollup_spec"),
      "inner subquery rate must read the layer")
  }

  test("grid mode: routed query_range matches raw step for step") {
    layers
    def grid(q: String)(routed: Boolean) =
      PromQL.compileRange(q,
          ctxAt(alignedEval, routed), base + 6 * HOUR, base + 12 * HOUR, HOUR)
        .select("series", "step_ms", "value").as[(String, Long, Double)]
        .collect.toSeq.sortBy(r => (r._1, r._2))
    for (q <- Seq("sum by (series) (rate(m[6h]))", "delta(m[6h])",
        "irate(m[6h])", "idelta(m[6h])")) {
      assert(grid(q)(true) == grid(q)(false), s"$q diverged on the grid")
      assert(grid(q)(true).nonEmpty)
    }
  }
}
