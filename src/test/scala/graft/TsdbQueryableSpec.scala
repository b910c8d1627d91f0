package graft

import java.sql.Timestamp
import graft.tsdb.{Matcher, QuotaExceededException, TsdbQueryable}

class TsdbQueryableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def q = new TsdbQueryable(
    Seq(
      ("api", 1L, ts("2024-01-01 00:00:00"), 1.0),
      ("api", 2L, ts("2024-01-02 00:00:00"), 2.0),
      ("web", 1L, ts("2024-01-03 00:00:00"), 3.0),
      ("web", 2L, ts("2024-02-01 00:00:00"), 4.0)
    ).toDF("job", "instance", "ts", "value"),
    labelCols = Seq("job", "instance"))

  test("select filters by matchers and [mint, maxt)") {
    val out = q.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "web"))
    assert(out.collect().map(_.getDouble(3)).toSeq == Seq(3.0))
  }

  test("projection hints materialize only requested labels") {
    val out = q.select("2024-01-01", "2024-03-01", Seq(Matcher.Eq("job", "api")),
      projection = Seq("job"))
    assert(out.columns.toSeq == Seq("job", "ts", "value"))
  }

  test("sorted row quota truncates deterministically") {
    val out = q.select("2024-01-01", "2024-03-01", Nil, Nil, rowQuota = 2L)
    assert(out.collect().map(_.getDouble(3)).toSeq == Seq(1.0, 2.0))
  }

  test("unsorted row quota still caps the row count") {
    val out = q.select("2024-01-01", "2024-03-01", Nil, Nil,
      rowQuota = 2L, sorted = false)
    assert(out.count() == 2L)
  }

  test("selectStrict passes under budget, throws over it") {
    assert(q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil, 10L).count() == 4L)
    intercept[QuotaExceededException] {
      q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil, 3L)
    }
  }

  test("selectStrict chunk-bytes quota meters 16 bytes per sample") {
    // 4 samples in range → 64 sample bytes
    assert(q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil,
      chunkBytesQuota = 64L).count() == 4L)
    intercept[QuotaExceededException] {
      q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil,
        chunkBytesQuota = 63L)
    }
  }

  test("selectStrict data-bytes quota meters labels at actual width") {
    // per row: 16 sample bytes + 3 (job string) + 8 (instance long) = 27
    assert(q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil,
      dataBytesQuota = 4 * 27L).count() == 4L)
    intercept[QuotaExceededException] {
      q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil,
        dataBytesQuota = 4 * 27L - 1)
    }
    // projection shrinks the metered width: only job + samples = 19/row
    assert(q.selectStrict("2024-01-01", "2024-03-01", Nil,
      projection = Seq("job"), dataBytesQuota = 4 * 19L).count() == 4L)
    intercept[QuotaExceededException] {
      q.selectStrict("2024-01-01", "2024-03-01", Nil,
        projection = Seq("job"), dataBytesQuota = 4 * 19L - 1)
    }
  }

  test("row quota still enforced alongside byte quotas in one pass") {
    intercept[QuotaExceededException] {
      q.selectStrict("2024-01-01", "2024-03-01", Nil, Nil,
        rowQuota = 3L, chunkBytesQuota = 1000L)
    }
  }

  test("materializedSeriesCallback meters the selection without an extra job") {
    import org.apache.spark.sql.functions.{count, lit}
    import org.apache.spark.sql.Observation
    val obs = Observation("series_meter")
    val metered = q.withMaterializedSeriesCallback(
      _.observe(obs, count(lit(1)).as("materialized_rows")))
    val out = metered.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    assert(out.count() == 2L)
    assert(obs.get("materialized_rows") == 2L)
  }

  test("materializedSeriesCallback can post-filter materialized series") {
    val filtered = q.withMaterializedSeriesCallback(
      _.filter(org.apache.spark.sql.functions.col("value") > 1.5))
    val out = filtered.select("2024-01-01", "2024-03-01", Nil, Nil)
    assert(out.collect().map(_.getDouble(3)).sorted.toSeq == Seq(2.0, 3.0, 4.0))
    // the receiver is unchanged — callback attaches to a NEW queryable
    assert(q.select("2024-01-01", "2024-03-01", Nil, Nil).count() == 4L)
  }

  test("materializedLabelsFilterCallback gates every query path") {
    import org.apache.spark.sql.functions.col
    // the tenancy seam: only job=api series are visible, on top of
    // whatever matchers the caller sends
    val gated = q.withMaterializedLabelsFilterCallback(col("job") === "api")
    assert(gated.select("2024-01-01", "2024-03-01", Nil, Nil)
      .collect().map(_.getString(0)).toSet == Set("api"))
    assert(gated.selectSeries("2024-01-01", "2024-03-01", Nil)
      .collect().map(_.getString(0)).toSet == Set("api"))
    assert(gated.labelValues("job").collect().map(_.getString(0)).toSeq ==
      Seq("api"))
    assert(gated.labelCardinality()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("job" -> 1L, "instance" -> 2L))
    // composes with matchers: an impossible matcher under the gate
    assert(gated.select("2024-01-01", "2024-03-01",
      Seq(Matcher.Eq("job", "web")), Nil).count() == 0L)
    // the receiver is unchanged
    assert(q.labelValues("job").count() == 2L)
  }

  test("labelCardinality: exact counts under matchers; HLL within 5%") {
    val exact = q.labelCardinality(Seq(Matcher.Eq("job", "api")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("job" -> 1L, "instance" -> 2L))
    // HLL path on the real events fixture: each label within 5% of
    // the exact count (rsd 0.02 sketch)
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    val eq = new TsdbQueryable(events, labelCols = Seq("event_type", "user_id"))
    val ex = eq.labelCardinality()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = eq.labelCardinality(exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ex.foreach { case (l, n) =>
      val a = approx(l)
      assert(math.abs(a - n) <= math.max(1L, (0.05 * n).toLong),
        s"label $l: approx $a vs exact $n")
    }
  }

  test("selection cache serves repeated constraints without a source re-scan") {
    import graft.tsdb.SelectionCache
    import org.apache.spark.sql.execution.LogicalRDD
    val cache = new SelectionCache()
    val cached = q.withSelectionCache(cache)
    val first = cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    assert(first.collect().map(_.getDouble(3)).sorted.toSeq == Seq(1.0, 2.0))
    assert((cache.hits, cache.misses, cache.size) == (0L, 1L, 1))
    // same constraints → a hit, planned from the checkpointed blocks
    // (LogicalRDD), not from the source relation
    val second = cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    assert(cache.hits == 1L && cache.misses == 1L)
    assert(second.queryExecution.optimizedPlan.collectFirst {
      case r: LogicalRDD => r
    }.nonEmpty, "cache hit should replan from the checkpoint")
    assert(second.collect().map(_.getDouble(3)).sorted.toSeq == Seq(1.0, 2.0))
    // quota/sort apply ON TOP of the cached selection — still a hit
    val capped = cached.select("2024-01-01", "2024-02-01",
      Seq(Matcher.Eq("job", "api")), Nil, rowQuota = 1L)
    assert(cache.hits == 2L && capped.count() == 1L)
    // different constraints miss
    cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "web"))
    assert(cache.misses == 2L && cache.size == 2)
    // clear() drops everything (Close analog) — next use misses again
    cache.clear()
    assert(cache.size == 0)
    cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    assert(cache.misses == 3L)
  }

  test("selection cache at capacity passes misses through uncached") {
    import graft.tsdb.SelectionCache
    val cache = new SelectionCache(maxEntries = 1)
    val cached = q.withSelectionCache(cache)
    cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    assert(cache.size == 1)
    val over = cached.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "web"))
    assert(cache.size == 1 && cache.misses == 2L)
    assert(over.collect().map(_.getDouble(3)).toSeq == Seq(3.0))
  }

  test("selection cache evicts a throwing build and retries cleanly") {
    import graft.tsdb.SelectionCache
    val cache = new SelectionCache()
    var attempts = 0
    def flaky(): org.apache.spark.sql.DataFrame = {
      attempts += 1
      if (attempts == 1) sys.error("boom")
      else q.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api"))
    }
    val err = intercept[RuntimeException] { cache.getOrMaterialize("k", flaky()) }
    assert(err.getMessage == "boom")
    // failed build must not occupy a slot...
    assert(cache.size == 0)
    // ...and a retry materializes for real, then hits
    assert(cache.getOrMaterialize("k", flaky()).count() == 2L)
    assert(cache.size == 1 && attempts == 2)
    assert(cache.getOrMaterialize("k", flaky()).count() == 2L)
    assert(attempts == 2, "hit must not re-run the build")
  }

  test("selection cache fails fast on same-key re-entrant builds") {
    import graft.tsdb.SelectionCache
    val cache = new SelectionCache()
    lazy val recurse: org.apache.spark.sql.DataFrame =
      cache.getOrMaterialize("self", recurse)
    val err = intercept[IllegalStateException] {
      cache.getOrMaterialize("self", recurse)
    }
    assert(err.getMessage.contains("re-entered"))
    assert(cache.size == 0, "the failed self-referential entry is evicted")
    // unrelated-key re-entry from inside a build still works
    val nested = cache.getOrMaterialize("outer", {
      val inner = cache.getOrMaterialize("inner",
        q.select("2024-01-01", "2024-02-01", Matcher.Eq("job", "api")))
      inner.limit(1)
    })
    assert(nested.count() == 1L && cache.size == 2)
  }

  test("selectSeries returns distinct label sets; projection and limit apply") {
    val all = q.selectSeries("2024-01-01", "2024-03-01", Nil)
    assert(all.columns.toSeq == Seq("job", "instance"))
    assert(all.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("api", 1L), ("api", 2L), ("web", 1L), ("web", 2L)))
    // matchers narrow the series set before the distinct
    val web = q.selectSeries("2024-01-01", "2024-03-01", Seq(Matcher.Eq("job", "web")))
    assert(web.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("web", 1L), ("web", 2L)))
    // projection collapses to the requested label subset
    val proj = q.selectSeries("2024-01-01", "2024-03-01", Nil, projection = Seq("job"))
    assert(proj.columns.toSeq == Seq("job"))
    assert(proj.collect().map(_.getString(0)).toSeq == Seq("api", "web"))
    // limit truncates the ordered series list deterministically
    val lim = q.selectSeries("2024-01-01", "2024-03-01", Nil,
      projection = Seq("job"), limit = 1)
    assert(lim.collect().map(_.getString(0)).toSeq == Seq("api"))
    // the time range prunes series wholly outside it
    val jan = q.selectSeries("2024-01-01", "2024-02-01", Nil)
    assert(jan.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("api", 1L), ("api", 2L), ("web", 1L)))
  }

  test("labelValues respects matchers and limit") {
    val out = q.labelValues("instance", Seq(Matcher.Eq("job", "api")), limit = 1)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("1"))
  }

  test("labelNames honors its limit") {
    assert(q.labelNames(Nil, 1).collect().map(_.getString(0)).toSeq == Seq("instance"))
  }
}
