package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.PromOps
import graft.tsdb.promql.{PromQL, PromQLCompileException, PromQLContext}

/** End-to-end PromQL string → DataFrame semantics, pinned against
  * hand-composed PromOps plans and hand-computed values on a small
  * two-label corpus. The gate queries cross-check a subset against
  * DuckDB; these specs cover the full surface.
  */
class PromQLCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // epoch ms of 2024-01-01 00:00 / 01:00 UTC
  private val T0 = 1704067200000L
  private val T1 = T0 + 3600000L

  // counters over [00:00, 01:00): series keyed (job, instance)
  //   (api,i1): 0 @00:00, 60 @00:30, 118 @00:59
  //   (api,i2): 5 @00:10, 45 @00:50
  //   (web,i1): 100 @00:20, 90 @00:40   (a reset)
  private lazy val requests = Seq(
    ("api", "i1", ts("2024-01-01 00:00:00"), 0.0, 1L),
    ("api", "i1", ts("2024-01-01 00:30:00"), 60.0, 2L),
    ("api", "i1", ts("2024-01-01 00:59:00"), 118.0, 3L),
    ("api", "i2", ts("2024-01-01 00:10:00"), 5.0, 4L),
    ("api", "i2", ts("2024-01-01 00:50:00"), 45.0, 5L),
    ("web", "i1", ts("2024-01-01 00:20:00"), 100.0, 6L),
    ("web", "i1", ts("2024-01-01 00:40:00"), 90.0, 7L)
  ).toDF("job", "instance", "ts", "value", "seq")

  // an info metric: one row per instance
  private lazy val nodeInfo = Seq(
    ("meta", "i1", ts("2024-01-01 00:55:00"), 1.0, 10L)
  ).toDF("job", "instance", "ts", "value", "seq")

  private lazy val ctx = PromQLContext(
    metrics = Map("http_requests_total" -> requests, "node_info" -> nodeInfo),
    labelCols = Seq("job", "instance"),
    evalMs = T1,
    lookbackMs = 600000L, // 10m
    tieBreak = Seq("seq"))

  private def run(q: String): DataFrame = PromQL.compile(q, ctx)

  private def rows(q: String): Set[Seq[Any]] =
    run(q).collect().map(_.toSeq).toSet

  // ===== selectors =====

  test("instant selector picks the latest sample per series within lookback") {
    // lookback window [00:50, 01:00): (api,i1)@00:59=118, (api,i2)@00:50=45
    assert(rows("http_requests_total") ==
      Set(Seq("api", "i1", 118.0), Seq("api", "i2", 45.0)))
  }

  test("matchers filter series (compiled through Matcher, incl. regex)") {
    assert(rows("""http_requests_total{instance="i2"}""") ==
      Set(Seq("api", "i2", 45.0)))
    assert(rows("""http_requests_total{instance=~"i1|i3"}""") ==
      Set(Seq("api", "i1", 118.0)))
  }

  test("offset shifts the evaluation window") {
    // offset 30m → window [00:20, 00:30): only (web,i1)@00:20=100
    assert(rows("http_requests_total offset 30m") ==
      Set(Seq("web", "i1", 100.0)))
  }

  test("timestamp() exposes the sample timestamp in seconds") {
    assert(rows("""timestamp(http_requests_total{instance="i1"})""") ==
      Set(Seq("api", "i1", (T0 + 3540000L) / 1000.0)))
  }

  // ===== range functions =====

  test("rate compiles to PromOps.extrapolatedRate") {
    val compiled = run("rate(http_requests_total[1h])")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val direct = PromOps.extrapolatedRate(
        requests.filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp")),
        Seq("job", "instance"), "ts", "value", T0, T1, tieBreak = Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("rate")).toMap
    assert(compiled == direct)
    assert(compiled.keySet ==
      Set(("api", "i1"), ("api", "i2"), ("web", "i1")))
  }

  test("sum_over_time + sum by") {
    assert(rows("sum by (job) (sum_over_time(http_requests_total[1h]))") ==
      Set(Seq("api", 228.0), Seq("web", 190.0)))
  }

  test("avg_over_time and without-grouping") {
    // per-series averages: (api,i1)=178/3, (api,i2)=25, (web,i1)=95;
    // the outer avg accumulates in decimal(30,8) (the house order-
    // independence convention), so 59.333333333… quantizes to
    // 59.33333333 before the cross-series mean
    val out = rows("avg without (instance) (avg_over_time(http_requests_total[1h]))")
    assert(out == Set(
      Seq("api", (59.33333333 + 25.0) / 2),
      Seq("web", 95.0)))
  }

  test("count/min/max/last_over_time") {
    assert(rows("count_over_time(http_requests_total[30m])") ==
      Set(Seq("api", "i1", 2.0), Seq("api", "i2", 1.0), Seq("web", "i1", 1.0)))
    assert(rows("""max_over_time(http_requests_total{job="api"}[1h])""") ==
      Set(Seq("api", "i1", 118.0), Seq("api", "i2", 45.0)))
    assert(rows("""last_over_time(http_requests_total{job="web"}[1h])""") ==
      Set(Seq("web", "i1", 90.0)))
  }

  test("first_over_time / ts_of_first_over_time: the earliest sample") {
    // (api,i1) first in [00:00,01:00) is 0 @00:00; (api,i2) 5 @00:10
    assert(rows("""first_over_time(http_requests_total{job="api"}[1h])""") ==
      Set(Seq("api", "i1", 0.0), Seq("api", "i2", 5.0)))
    assert(rows("""ts_of_first_over_time(http_requests_total{job="api"}[1h])""") ==
      Set(Seq("api", "i1", T0 / 1000.0),
        Seq("api", "i2", (T0 + 600000L) / 1000.0)))
    // a 30m range excludes (api,i1)'s 00:00 sample → first is 60 @00:30
    assert(rows("""first_over_time(http_requests_total{instance="i1"}[30m])""") ==
      Set(Seq("api", "i1", 60.0), Seq("web", "i1", 90.0)))
  }

  test("ts_of_min/max/last_over_time return epoch seconds of the extreme") {
    assert(rows("""ts_of_last_over_time(http_requests_total{job="api"}[1h])""") ==
      Set(Seq("api", "i1", (T0 + 3540000L) / 1000.0),
        Seq("api", "i2", (T0 + 3000000L) / 1000.0)))
    assert(rows("""ts_of_max_over_time(http_requests_total{job="web"}[1h])""") ==
      Set(Seq("web", "i1", (T0 + 1200000L) / 1000.0)))
    assert(rows("""ts_of_min_over_time(http_requests_total{instance="i1"}[1h])""") ==
      Set(Seq("api", "i1", T0 / 1000.0),
        Seq("web", "i1", (T0 + 2400000L) / 1000.0)))
  }

  test("ts_of_min/max_over_time ties resolve to the latest sample") {
    // values 5,7,5,7 at 00:00/:10/:20/:30 — both extremes occur
    // twice; upstream's non-strict (<=/>=) walk keeps the LAST
    val tied = Seq(
      ("a", "x", ts("2024-01-01 00:00:00"), 5.0, 1L),
      ("a", "x", ts("2024-01-01 00:10:00"), 7.0, 2L),
      ("a", "x", ts("2024-01-01 00:20:00"), 5.0, 3L),
      ("a", "x", ts("2024-01-01 00:30:00"), 7.0, 4L)
    ).toDF("job", "instance", "ts", "value", "seq")
    val tctx = ctx.copy(metrics = Map("m" -> tied))
    assert(PromQL.compile("ts_of_min_over_time(m[1h])", tctx)
      .collect().map(_.toSeq).toSet ==
      Set(Seq("a", "x", (T0 + 1200000L) / 1000.0)))
    assert(PromQL.compile("ts_of_max_over_time(m[1h])", tctx)
      .collect().map(_.toSeq).toSet ==
      Set(Seq("a", "x", (T0 + 1800000L) / 1000.0)))
  }

  test("ts_of_max_over_time: NaN never displaces a real maximum") {
    // upstream walk (f.F >= maxVal || IsNaN(maxVal)): a held NaN is
    // replaced by ANY sample, a real max never by NaN; all-NaN
    // windows keep the LAST sample's ts
    val mixed = Seq(
      ("a", "x", ts("2024-01-01 00:00:00"), 7.0, 1L),
      ("a", "x", ts("2024-01-01 00:10:00"), Double.NaN, 2L),
      ("a", "x", ts("2024-01-01 00:20:00"), 5.0, 3L),
      ("b", "x", ts("2024-01-01 00:05:00"), Double.NaN, 4L),
      ("b", "x", ts("2024-01-01 00:15:00"), Double.NaN, 5L)
    ).toDF("job", "instance", "ts", "value", "seq")
    val tctx = ctx.copy(metrics = Map("m" -> mixed))
    assert(PromQL.compile("ts_of_max_over_time(m[1h])", tctx)
      .collect().map(_.toSeq).toSet ==
      Set(Seq("a", "x", T0 / 1000.0),                 // the real 7.0, not the NaN
        Seq("b", "x", (T0 + 900000L) / 1000.0)))      // all-NaN → last ts
  }

  test("resets and changes") {
    assert(rows("resets(http_requests_total[1h])") ==
      Set(Seq("api", "i1", 0.0), Seq("api", "i2", 0.0), Seq("web", "i1", 1.0)))
    assert(rows("changes(http_requests_total[1h])") ==
      Set(Seq("api", "i1", 2.0), Seq("api", "i2", 1.0), Seq("web", "i1", 1.0)))
  }

  test("delta and idelta") {
    assert(rows("""delta(http_requests_total{job="web"}[1h])""") ==
      Set(Seq("web", "i1", -10.0)))
    assert(rows("""idelta(http_requests_total{job="api"}[1h])""") ==
      Set(Seq("api", "i1", 58.0), Seq("api", "i2", 40.0)))
  }

  test("quantile_over_time") {
    assert(rows("""quantile_over_time(0.5, http_requests_total{instance="i1"}[1h])""") ==
      Set(Seq("api", "i1", 60.0), Seq("web", "i1", 95.0)))
  }

  // ===== aggregation operators =====

  test("global aggregation over an empty vector is empty") {
    assert(rows("""sum(http_requests_total{job="nope"})""").isEmpty)
    assert(rows("""count(http_requests_total{job="nope"})""").isEmpty)
  }

  test("count / group / quantile aggregators") {
    assert(rows("count by (job) (http_requests_total)") ==
      Set(Seq("api", 2.0)))
    assert(rows("group(http_requests_total)") == Set(Seq(1.0)))
    assert(rows("quantile(0.5, http_requests_total)") ==
      Set(Seq((118.0 + 45.0) / 2)))
  }

  test("stddev/stdvar aggregators use the population closed form") {
    // values 118, 45: mean 81.5, var = ((118-81.5)^2 + (45-81.5)^2)/2
    val varExp = (36.5 * 36.5 * 2) / 2
    val got = rows("stdvar(http_requests_total)").head.head.asInstanceOf[Double]
    assert(math.abs(got - varExp) < 1e-9)
    val sd = rows("stddev(http_requests_total)").head.head.asInstanceOf[Double]
    assert(math.abs(sd - math.sqrt(varExp)) < 1e-9)
  }

  test("topk keeps full labels and breaks ties on them") {
    assert(rows("topk(1, http_requests_total)") ==
      Set(Seq("api", "i1", 118.0)))
    assert(rows("bottomk(1, http_requests_total)") ==
      Set(Seq("api", "i2", 45.0)))
    // tie: two series at the same value — label order (i1 < i2) decides
    assert(rows("topk(1, http_requests_total ^ 0)") ==
      Set(Seq("api", "i1", 1.0)))
  }

  test("count_values groups by exact value") {
    assert(rows("""count_values("v", http_requests_total ^ 0)""") ==
      Set(Seq("1.0", 2.0)))
  }

  // ===== scalar functions =====

  test("clamp family and round") {
    assert(rows("clamp(http_requests_total, 50, 100)") ==
      Set(Seq("api", "i1", 100.0), Seq("api", "i2", 50.0)))
    assert(rows("clamp_min(http_requests_total, 50)") ==
      Set(Seq("api", "i1", 118.0), Seq("api", "i2", 50.0)))
    assert(rows("clamp_max(http_requests_total, 50)") ==
      Set(Seq("api", "i1", 50.0), Seq("api", "i2", 45.0)))
    // round to nearest 0.5 of v/7: 118/7=16.857→17.0, 45/7=6.428→6.5
    assert(rows("round(http_requests_total / 7, 0.5)") ==
      Set(Seq("api", "i1", 17.0), Seq("api", "i2", 6.5)))
  }

  test("abs/sqrt/sgn compose") {
    assert(rows("sgn(http_requests_total - 100)") ==
      Set(Seq("api", "i1", 1.0), Seq("api", "i2", -1.0)))
    assert(rows("sqrt(abs(http_requests_total * -1))") ==
      Set(Seq("api", "i1", math.sqrt(118.0)), Seq("api", "i2", math.sqrt(45.0))))
  }

  test("inverse hyperbolic functions match Go math semantics") {
    // asinh is defined everywhere; acosh(x<1) and atanh(|x|>1) are
    // NaN in Go's math package, and must stay NaN here (ANSI mode
    // would otherwise throw on the internal sqrt/log domain)
    def f(expr: String): Map[String, Double] =
      rows(expr).map(r => (r(1).toString, r(2).asInstanceOf[Double])).toMap
    val a = f("asinh(http_requests_total / 118)")
    assert(math.abs(a("i1") - 0.8813735870195429) < 1e-12) // asinh(1)
    val c = f("acosh(http_requests_total / 118)")
    assert(c("i1") == 0.0) // acosh(1) = 0
    assert(c("i2").isNaN) // 45/118 < 1
    val t = f("atanh(http_requests_total / 118)")
    assert(t("i1").isInfinite || t("i1").isNaN) // atanh(1) = +Inf in Go
    assert(math.abs(t("i2") - 0.5 * math.log((1 + 45.0 / 118) / (1 - 45.0 / 118))) < 1e-12)
  }

  // ===== binary operators =====

  test("vector-scalar arithmetic and comparison filter") {
    assert(rows("http_requests_total * 2") ==
      Set(Seq("api", "i1", 236.0), Seq("api", "i2", 90.0)))
    assert(rows("http_requests_total > 100") ==
      Set(Seq("api", "i1", 118.0)))
    assert(rows("http_requests_total > bool 100") ==
      Set(Seq("api", "i1", 1.0), Seq("api", "i2", 0.0)))
    // scalar on the left
    assert(rows("100 < http_requests_total") ==
      Set(Seq("api", "i1", 118.0)))
  }

  test("scalar expressions fold at compile time") {
    assert(rows("vector(2 + 3 * 4)") == Set(Seq(14.0)))
    assert(rows("vector(2 ^ 3 ^ 2)") == Set(Seq(512.0)))
    assert(rows("vector(7 == bool 7)") == Set(Seq(1.0)))
  }

  test("one-to-one vector matching with on()") {
    val q = """sum by (instance) (sum_over_time(http_requests_total{job="api"}[1h]))
              | / on(instance)
              |sum by (instance) (sum_over_time(http_requests_total{job="web"}[1h]))"""
      .stripMargin
    assert(rows(q) == Set(Seq("i1", 178.0 / 190.0)))
  }

  test("one-to-one matching rejects a non-unique side") {
    // left is NOT unique on job (api appears for i1 and i2); the
    // right side matches job=api, so the guard must fire
    val ex = intercept[Exception](
      run("""sum by (job,instance)(http_requests_total)
            | / on(job) sum by (job)(http_requests_total{instance="i1"})"""
        .stripMargin).collect())
    assert(ex.getMessage.contains("not unique") ||
      Option(ex.getCause).exists(_.getMessage.contains("not unique")))
  }

  test("ignoring() matches on the residual labels") {
    // left (job,instance) ignoring job → (instance); right at (instance)
    val q = """http_requests_total{job="api"} / ignoring(job) sum by (instance) (node_info)"""
    assert(rows(q) == Set(Seq("i1", 118.0)))
  }

  test("group_left carries labels from the one side") {
    val q = """http_requests_total * on(instance) group_left(role)
              |label_replace(sum by (instance) (node_info), "role", "$1", "instance", "(.*)")"""
      .stripMargin
    assert(rows(q) == Set(Seq("api", "i1", "i1", 118.0)))
    assert(run(q).columns.toSeq == Seq("job", "instance", "role", "value"))
  }

  test("group_right mirrors group_left") {
    val q = """label_replace(sum by (instance) (node_info), "role", "$1", "instance", "(.*)")
              | * on(instance) group_right(role) http_requests_total"""
      .stripMargin
    assert(rows(q) == Set(Seq("api", "i1", "i1", 118.0)))
  }

  test("set operators and/unless/or") {
    assert(rows("http_requests_total and on(instance) node_info") ==
      Set(Seq("api", "i1", 118.0)))
    assert(rows("http_requests_total unless on(instance) node_info") ==
      Set(Seq("api", "i2", 45.0)))
    // or: left-biased union; make labels agree via sum by
    val q = """sum by (instance) (http_requests_total)
              | or sum by (instance) (node_info offset 30m)"""
      .stripMargin
    // left has i1, i2; right (offset window [00:20,00:30)) has nothing
    assert(rows(q) == Set(Seq("i1", 118.0), Seq("i2", 45.0)))
  }

  // ===== histogram_quantile / absent =====

  test("histogram_quantile over an le-labelled vector") {
    val buckets = Seq(
      ("api", "10", ts("2024-01-01 00:59:00"), 5.0),
      ("api", "50", ts("2024-01-01 00:59:00"), 9.0),
      ("api", "+Inf", ts("2024-01-01 00:59:00"), 10.0)
    ).toDF("job", "le", "ts", "value")
    val hctx = PromQLContext(
      metrics = Map("req_bucket" -> buckets),
      labelCols = Seq("job", "le"), evalMs = T1, lookbackMs = 3600000L)
    val out = PromQL.compile("histogram_quantile(0.7, req_bucket)", hctx)
      .collect().map(_.toSeq).toSet
    // rank 7 lands in the (10,50] bucket: 10 + 40*(7-5)/(9-5) = 30
    assert(out == Set(Seq("api", 30.0)))
  }

  test("absent() emits one row only for an empty selection") {
    assert(rows("""absent(http_requests_total{job="nope"})""") == Set(Seq(1.0)))
    assert(rows("absent(http_requests_total)").isEmpty)
  }

  test("bucket pruning over a converted layout changes the plan, not the result") {
    val path = java.nio.file.Files.createTempDirectory("pq_conv").toString
    graft.tsdb.TsdbConverter.convert(requests, path, "ts",
      graft.tsdb.ConvertOptions(sortBy = Seq("job", "instance"),
        colDuration = "1 hour"))
    val conv = spark.read.parquet(path)
    def cctx(bucket: Option[String]) = ctx.copy(
      metrics = Map("m" -> conv), bucketCol = bucket,
      bucketDuration = "1 hour")
    val q = "sum by (job) (sum_over_time(m[45m] offset 10m))"
    val pruned = PromQL.compile(q, cctx(Some("bucket")))
    val full = PromQL.compile(q, cctx(None))
    assert(pruned.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(bucket"))
  }

  // ===== compile errors =====

  // ===== info() (experimental) =====

  private lazy val infoCtx = {
    val reqs = requests.withColumn("tier", lit(null).cast("string"))
    val tinfo = Seq(
      ("api", "i1", "gold", ts("2024-01-01 00:55:00"), 1.0, 20L),
      ("api", "i2", "bronze", ts("2024-01-01 00:55:00"), 1.0, 21L)
    ).toDF("job", "instance", "tier", "ts", "value", "seq")
    ctx.copy(
      metrics = Map("http_requests_total" -> reqs, "target_info" -> tinfo),
      labelCols = Seq("job", "instance", "tier"))
  }

  test("info() attaches data labels from target_info on the identifying labels") {
    val out = PromQL.compile(
        "info(sum by (job, instance) (http_requests_total))", infoCtx)
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("api", "i1", "gold", 118.0),
      Seq("api", "i2", "bronze", 45.0)))
  }

  test("info() selector filters info series; unmatched elements keep absent-as-empty") {
    val out = PromQL.compile(
        """info(sum by (job, instance) (http_requests_total), {tier=~"g.*"})""",
        infoCtx)
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("api", "i1", "gold", 118.0),
      Seq("api", "i2", "", 45.0)))
  }

  test("info() raises on conflicting info series and fails fast on misuse") {
    import org.apache.spark.sql.Row
    val dup = infoCtx.metrics("target_info").union(
      Seq(("api", "i1", "silver", ts("2024-01-01 00:56:00"), 1.0, 22L))
        .toDF("job", "instance", "tier", "ts", "value", "seq"))
    val e = intercept[Exception] {
      PromQL.compile("info(sum by (job, instance) (http_requests_total))",
        infoCtx.copy(metrics = infoCtx.metrics + ("target_info" -> dup)))
        .collect()
    }
    assert(e.getMessage.contains("conflicting info series") ||
      Option(e.getCause).exists(_.getMessage.contains("conflicting info series")))
    // vector without any identifying label
    val e2 = intercept[PromQLCompileException](PromQL.compile(
      "info(sum(http_requests_total))", infoCtx))
    assert(e2.getMessage.contains("identifying"))
    // data label already on the vector
    val e3 = intercept[PromQLCompileException](PromQL.compile(
      "info(http_requests_total)", infoCtx))
    assert(e3.getMessage.contains("already present"))
    // unregistered info metric
    val e4 = intercept[PromQLCompileException](PromQL.compile(
      "info(sum by (job, instance) (http_requests_total), other_info{})",
      infoCtx))
    assert(e4.getMessage.contains("not registered"))
  }

  test("compile errors are loud and specific") {
    intercept[PromQLCompileException](run("unknown_metric"))
    intercept[PromQLCompileException](run("rate(http_requests_total)")) // needs range
    intercept[PromQLCompileException](run("sum by (bogus) (http_requests_total)"))
    intercept[PromQLCompileException](run("no_such_function(http_requests_total)"))
    intercept[PromQLCompileException](run("1 + 2")) // scalar result
    intercept[PromQLCompileException](run("1 > 2")) // scalar comparison needs bool
    intercept[PromQLCompileException](
      run("http_requests_total / on(instance) node_info / on(nope) node_info"))
    intercept[PromQLCompileException](run("scalar(http_requests_total)"))
    intercept[PromQLCompileException](run("histogram_quantile(0.9, http_requests_total)"))
  }

  // ===== range queries (query_range) =====

  private def rowsRange(q: String, startMs: Long, endMs: Long,
      stepMs: Long): Set[Seq[Any]] =
    PromQL.compileRange(q, ctx, startMs, endMs, stepMs)
      .collect().map(_.toSeq).toSet

  private val HALF = 1800000L // 30m

  test("range query: info() joins per step (the STEP-keyed path)") {
    // target_info@00:55 is visible at the 01:00 step (lookback 10m)
    // but NOT at 00:30 — the early step's elements keep tier=""
    val out = PromQL.compileRange(
        "info(sum by (job, instance) (http_requests_total), {tier=~\".+\"})",
        infoCtx, T0 + HALF, T1, HALF)
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("web", "i1", "", T0 + HALF, 100.0),
      Seq("api", "i1", "gold", T1, 118.0),
      Seq("api", "i2", "bronze", T1, 45.0)))
  }

  test("range query: instant selector per step with lookback") {
    // steps 00:30 and 01:00, lookback 10m
    assert(rowsRange("http_requests_total", T0 + HALF, T1, HALF) == Set(
      Seq("web", "i1", T0 + HALF, 100.0),  // [00:20,00:30) → web@00:20
      Seq("api", "i1", T1, 118.0),         // [00:50,01:00) → api,i1@00:59
      Seq("api", "i2", T1, 45.0)))         //               → api,i2@00:50
  }

  test("range query: windowed aggregation per step") {
    assert(rowsRange("sum by (job) (sum_over_time(http_requests_total[30m]))",
      T0 + HALF, T1, HALF) == Set(
      Seq("api", T0 + HALF, 5.0),    // [00:00,00:30): 0 + 5
      Seq("web", T0 + HALF, 100.0),
      Seq("api", T1, 223.0),         // [00:30,01:00): 60 + 118 + 45
      Seq("web", T1, 90.0)))
  }

  test("range query: overlapping windows (range > step) explode boundedly") {
    assert(rowsRange("count_over_time(http_requests_total[1h])",
      T0 + HALF, T1, HALF) == Set(
      Seq("api", "i1", T0 + HALF, 1.0), // [23:30,00:30): one sample
      Seq("api", "i2", T0 + HALF, 1.0),
      Seq("web", "i1", T0 + HALF, 1.0),
      Seq("api", "i1", T1, 3.0),        // [00:00,01:00): all
      Seq("api", "i2", T1, 2.0),
      Seq("web", "i1", T1, 2.0)))
  }

  test("range query: single-step grid matches the instant query") {
    val instant = rows("rate(http_requests_total[1h])")
    val ranged = rowsRange("rate(http_requests_total[1h])", T1, T1, 60000L)
    assert(ranged == instant.map(r => r.take(2) ++ Seq(T1) ++ r.drop(2)))
  }

  test("range query: vector matching joins within each step only") {
    val q = """sum by (instance) (sum_over_time(http_requests_total[30m]))
              | / on(instance)
              |sum by (instance) (count_over_time(http_requests_total[30m]))"""
      .stripMargin
    assert(rowsRange(q, T0 + HALF, T1, HALF) == Set(
      Seq("i1", T0 + HALF, 50.0),      // (0 + 100) / 2
      Seq("i2", T0 + HALF, 5.0),
      Seq("i1", T1, 268.0 / 3.0),      // (60 + 118 + 90) / 3
      Seq("i2", T1, 45.0)))
  }

  test("range query: topk ranks per step") {
    assert(rowsRange("topk(1, http_requests_total)", T0 + HALF, T1, HALF) ==
      Set(Seq("web", "i1", T0 + HALF, 100.0), Seq("api", "i1", T1, 118.0)))
  }

  test("range query: absent() per step, scalar query per step") {
    // step 00:00 has no sample in [23:50,00:00); step 00:30 does
    assert(rowsRange("""absent(http_requests_total)""", T0, T0 + HALF, HALF) ==
      Set(Seq(T0, 1.0)))
    assert(rowsRange("""absent(http_requests_total{job="nope"})""",
      T0, T0 + HALF, HALF) == Set(Seq(T0, 1.0), Seq(T0 + HALF, 1.0)))
    assert(rowsRange("1 + 1", T0, T0 + HALF, HALF) ==
      Set(Seq(T0, 2.0), Seq(T0 + HALF, 2.0)))
  }

  // ===== subqueries =====

  test("subquery: range function over an inner selector grid") {
    // inner steps = multiples of 10m in [00:00, 01:00): instant
    // selector at each → (api,i1): 0@00:10-step, 60@00:40-step;
    // (api,i2): 5@00:20; (web,i1): 100@00:30, 90@00:50
    assert(rows("max_over_time(http_requests_total[1h:10m])") == Set(
      Seq("api", "i1", 60.0), Seq("api", "i2", 5.0), Seq("web", "i1", 100.0)))
  }

  test("subquery: inner expression changes the label set") {
    // inner steps {00:00, 00:30}; inner@00:00 window empty, inner@00:30
    // → api=5, web=100; the outer max sees one sample per job
    assert(rows(
      "max_over_time(sum by (job) (sum_over_time(http_requests_total[30m]))[1h:30m])") ==
      Set(Seq("api", 5.0), Seq("web", 100.0)))
  }

  test("subquery inside a range query") {
    val q = "max_over_time(sum by (job) (sum_over_time(http_requests_total[30m]))[30m:30m])"
    // outer step s sees the single inner step s-30m: outer 00:30 ←
    // inner 00:00 (empty window), outer 01:00 ← inner 00:30
    assert(rowsRange(q, T0 + HALF, T1, HALF) ==
      Set(Seq("api", T1, 5.0), Seq("web", T1, 100.0)))
  }

  test("subquery: empty step uses the context default") {
    val c10 = ctx.copy(subqueryStepMs = 600000L)
    val out = PromQL.compile("max_over_time(http_requests_total[1h:])", c10)
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("api", "i1", 60.0), Seq("api", "i2", 5.0), Seq("web", "i1", 100.0)))
  }

  test("subquery parse shapes and errors") {
    import graft.tsdb.promql.{Expr, PromQLParser}
    PromQL.parse("rate(m[5m])[30m:5m]") match {
      case Expr.Subquery(Expr.Call("rate", _), r, s, 0L, None) =>
        assert(r == 1800000L && s == 300000L)
      case other => fail(s"unexpected AST: $other")
    }
    PromQL.parse("m[30m:] offset 5m") match {
      case Expr.Subquery(_: Expr.Selector, r, 0L, off, None) =>
        assert(r == 1800000L && off == 300000L)
      case other => fail(s"unexpected AST: $other")
    }
    PromQL.parse("m[30m:5m] @ end()") match {
      case Expr.Subquery(_, _, _, _, Some(Expr.AtEnd)) => ()
      case other => fail(s"unexpected AST: $other")
    }
    PromQL.parse("m @ 1704067200.5") match {
      case Expr.Selector(_, _, _, Some(Expr.AtMs(ms))) =>
        assert(ms == 1704067200500L)
      case other => fail(s"unexpected AST: $other")
    }
    intercept[graft.tsdb.promql.PromQLParseException](
      PromQL.parse("m[5m][30m]")) // range of a range
    intercept[PromQLCompileException](
      run("http_requests_total[30m:10m]")) // subquery is not an instant vector
  }

  // ===== @ modifier, time functions, absent/present_over_time =====

  test("@ modifier pins a selector's evaluation instant") {
    // @ 00:30 (epoch secs), lookback 10m → window [00:20,00:30)
    assert(rows(s"http_requests_total @ ${(T0 + HALF) / 1000}") ==
      Set(Seq("web", "i1", 100.0)))
    // pinned selector is step-invariant in a range query
    assert(rowsRange(s"http_requests_total @ ${(T0 + HALF) / 1000}",
      T0 + HALF, T1, HALF) == Set(
      Seq("web", "i1", T0 + HALF, 100.0), Seq("web", "i1", T1, 100.0)))
    // @ start() resolves to the grid start
    assert(rowsRange("http_requests_total @ start()", T0 + HALF, T1, HALF) ==
      Set(Seq("web", "i1", T0 + HALF, 100.0), Seq("web", "i1", T1, 100.0)))
    // @-pinned range function: same rate at every step
    val instantRate = rows("rate(http_requests_total[1h])")
    val pinned = rowsRange(s"rate(http_requests_total[1h] @ ${T1 / 1000})",
      T0 + HALF, T1, HALF)
    assert(pinned == instantRate.flatMap(r =>
      Seq(r.take(2) ++ Seq(T0 + HALF) ++ r.drop(2),
        r.take(2) ++ Seq(T1) ++ r.drop(2))))
  }

  test("time() is the eval instant — per step in a range query") {
    assert(rows("vector(time())") == Set(Seq(T1 / 1000.0)))
    assert(rowsRange("vector(time())", T0 + HALF, T1, HALF) == Set(
      Seq(T0 + HALF, (T0 + HALF) / 1000.0), Seq(T1, T1 / 1000.0)))
    // scalar arithmetic over time() stays a column expression
    assert(rowsRange("vector(time() * 2)", T0 + HALF, T1, HALF) == Set(
      Seq(T0 + HALF, (T0 + HALF) / 500.0), Seq(T1, T1 / 500.0)))
  }

  test("time-component functions (UTC, Prometheus conventions)") {
    // 2024-01-01T01:00Z: hour 1, Monday (day_of_week 1), 31-day month
    assert(rows("hour()") == Set(Seq(1.0)))
    assert(rows("minute()") == Set(Seq(0.0)))
    assert(rows("day_of_week()") == Set(Seq(1.0)))
    assert(rows("day_of_month()") == Set(Seq(1.0)))
    assert(rows("days_in_month()") == Set(Seq(31.0)))
    assert(rows("month()") == Set(Seq(1.0)))
    assert(rows("year()") == Set(Seq(2024.0)))
    // vector-argument form: component of the element VALUE (epoch s)
    assert(rows(s"hour(vector(${T0 / 1000 + 7200}))") == Set(Seq(2.0)))
  }

  test("time-gated filtering in a range query (the alerting idiom)") {
    // steps 00:30 (hour 0) and 01:00 (hour 1): keep hour >= 1 only
    val q = """sum by (job) (sum_over_time(http_requests_total[30m]))
              | and on() (hour() >= 1)""".stripMargin
    assert(rowsRange(q, T0 + HALF, T1, HALF) ==
      Set(Seq("api", T1, 223.0), Seq("web", T1, 90.0)))
  }

  test("absent_over_time / present_over_time") {
    assert(rows("""absent_over_time(http_requests_total{job="nope"}[1h])""") ==
      Set(Seq(1.0)))
    assert(rows("absent_over_time(http_requests_total[1h])").isEmpty)
    assert(rows("present_over_time(http_requests_total[30m])") == Set(
      Seq("api", "i1", 1.0), Seq("api", "i2", 1.0), Seq("web", "i1", 1.0)))
    // per step: 00:00's window [23:50,00:00) is empty, 00:30's is not
    assert(rowsRange("absent_over_time(http_requests_total[10m])",
      T0, T0 + HALF, HALF) == Set(Seq(T0, 1.0)))
  }

  test("trig, pi(), deg/rad, sort pass-through") {
    assert(rows("vector(pi())") == Set(Seq(math.Pi)))
    assert(rows("sin(vector(0))") == Set(Seq(0.0)))
    assert(rows("cos(vector(0))") == Set(Seq(1.0)))
    assert(rows("deg(vector(pi()))") == Set(Seq(180.0)))
    assert(rows("rad(vector(180))") == Set(Seq(math.Pi)))
    assert(rows("sort_desc(http_requests_total)") ==
      Set(Seq("api", "i1", 118.0), Seq("api", "i2", 45.0)))
  }

  // ===== scalar(), limitk / limit_ratio, sort_by_label =====

  test("scalar() of a one-element vector broadcasts its value") {
    // instant vector sums to 163; share-of-total per element
    assert(rows("http_requests_total / scalar(sum(http_requests_total))") ==
      Set(Seq("api", "i1", 118.0 / 163.0), Seq("api", "i2", 45.0 / 163.0)))
    assert(rows("vector(scalar(sum(http_requests_total)) + 1)") ==
      Set(Seq(164.0)))
    // two vector-derived scalars combine (carriers join): 163 - 2
    assert(rows("""vector(scalar(sum(http_requests_total))
                  | - scalar(count(http_requests_total)))""".stripMargin) ==
      Set(Seq(161.0)))
  }

  test("scalar() is NaN for 0- or many-element vectors, per step in range mode") {
    val multi = run("vector(scalar(http_requests_total))").collect()
    assert(multi.length == 1 && multi.head.getDouble(0).isNaN)
    val empty = run("""vector(scalar(http_requests_total{job="nope"}))""").collect()
    assert(empty.length == 1 && empty.head.getDouble(0).isNaN)
    // per step: 00:30's lookback holds one series (web,i1), 01:00's two
    assert(rowsRange("vector(scalar(count(http_requests_total)))",
      T0 + HALF, T1, HALF) == Set(Seq(T0 + HALF, 1.0), Seq(T1, 2.0)))
  }

  test("limitk picks the first k in label order (full labels kept)") {
    assert(rows("limitk(1, sum_over_time(http_requests_total[1h]))") ==
      Set(Seq("api", "i1", 178.0)))
    assert(rows("limitk(1, sum_over_time(http_requests_total[1h])) by (job)") ==
      Set(Seq("api", "i1", 178.0), Seq("web", "i1", 190.0)))
    intercept[PromQLCompileException](run("limitk(0, http_requests_total)"))
  }

  test("limit_ratio(r) and limit_ratio(r-1) partition the vector") {
    val all = rows("sum_over_time(http_requests_total[1h])")
    val pos = rows("limit_ratio(0.5, sum_over_time(http_requests_total[1h]))")
    val neg = rows("limit_ratio(-0.5, sum_over_time(http_requests_total[1h]))")
    assert((pos & neg).isEmpty)
    assert((pos | neg) == all)
    assert(rows("limit_ratio(1.0, sum_over_time(http_requests_total[1h]))") == all)
    intercept[PromQLCompileException](
      run("limit_ratio(1.5, http_requests_total)"))
  }

  test("sort_by_label orders by the given labels") {
    val ordered = run(
      """sort_by_label(sum_over_time(http_requests_total[1h]), "instance", "job")""")
      .collect().map(_.toSeq)
    assert(ordered.map(r => (r(1), r(0))).toSeq ==
      Seq(("i1", "api"), ("i1", "web"), ("i2", "api")))
    intercept[PromQLCompileException](
      run("""sort_by_label(http_requests_total, "nope")"""))
  }

  test("sort ties break on label values — documented, partition-independent") {
    // three elements tied at 7.0, spread over 8 partitions so any
    // fetch-order dependence would surface; the documented tiebreak
    // is label values ascending with label NAMES in lexicographic
    // order (instance before job)
    val tied = Seq(
      ("b", "x", ts("2024-01-01 00:59:00"), 7.0, 1L),
      ("a", "y", ts("2024-01-01 00:59:00"), 7.0, 2L),
      ("a", "x", ts("2024-01-01 00:59:00"), 7.0, 3L),
      ("c", "x", ts("2024-01-01 00:59:00"), 3.0, 4L)
    ).toDF("job", "instance", "ts", "value", "seq").repartition(8)
    val tctx = ctx.copy(metrics = Map("tied_metric" -> tied))
    val s = PromQL.compile("sort(tied_metric)", tctx)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(s == Seq(("c", "x", 3.0),
      ("a", "x", 7.0), ("b", "x", 7.0), ("a", "y", 7.0)))
    val sd = PromQL.compile("sort_desc(tied_metric)", tctx)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(sd == Seq(("a", "x", 7.0), ("b", "x", 7.0), ("a", "y", 7.0),
      ("c", "x", 3.0)))
    // sort_by_label ties on the named label break on the REMAINING
    // labels (names lexicographic), then value
    val sl = PromQL.compile("""sort_by_label(tied_metric, "instance")""", tctx)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(sl == Seq(("a", "x"), ("b", "x"), ("c", "x"), ("a", "y")))
  }

  test("holt_winters / deriv / predict_linear compile to the PromOps plans") {
    val hw = rows("double_exponential_smoothing(http_requests_total[1h], 0.5, 0.5)")
    assert(hw.map(_.take(2)) ==
      Set(Seq("api", "i1"), Seq("api", "i2"), Seq("web", "i1")))
    val d = run("""deriv(http_requests_total{job="api"}[1h])""")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // (api,i2): two samples, slope = 40/(40*60*1000) ms → per-second
    assert(math.abs(d("i2") - 40.0 / 2400.0) < 1e-12)
    val pl = run("""predict_linear(http_requests_total{instance="i2"}[1h], 3600)""")
      .collect().map(r => r.getDouble(2)).head
    // line through (600s,5) (3000s,45): slope 1/60 per s; at eval+1h
    // (7200s from window start): 5 + (7200-600)/60 = 115
    assert(math.abs(pl - 115.0) < 1e-9)
  }

  test("atan2 is a binary operator at * precedence (scalar and vector forms)") {
    // scalar-scalar folds at compile time: atan2(1, 1) = π/4; the
    // word op binds tighter than + (1 + atan2(1,1) parses as
    // 1 + (1 atan2 1), i.e. prec(atan2) = prec(*))
    assert(rows("vector(1 atan2 1)") == Set(Seq(math.atan2(1.0, 1.0))))
    assert(rows("vector(1 + 1 atan2 1)") ==
      Set(Seq(1.0 + math.atan2(1.0, 1.0))))
    // vector-scalar: per-element atan2(value, 2)
    val v = run("""http_requests_total{instance="i1"} atan2 2""")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(v("api") == math.atan2(118.0, 2.0))
  }

  test("mad_over_time is the median absolute deviation about the window median") {
    // (api,i1) window [00:00,01:00): values 0, 60, 118 → median 60,
    // |dev| = {60, 0, 58} → mad = 58; (api,i2): {5, 45} → median 25,
    // |dev| = {20, 20} → mad 20; (web,i1): {100, 90} → mad 5
    assert(rows("mad_over_time(http_requests_total[1h])") ==
      Set(Seq("api", "i1", 58.0), Seq("api", "i2", 20.0),
        Seq("web", "i1", 5.0)))
  }
}
