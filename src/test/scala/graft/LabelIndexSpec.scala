package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tsdb.{LabelIndexStore, Matcher, TsdbQueryable}

/** The materialized label index ([[graft.tsdb.LabelIndexStore]]):
  * routed label metadata must be IDENTICAL to the raw distinct-scan
  * answers (including the all-null-label and null-cell edges), the
  * routing must be visible in the plan, and anything the index
  * cannot answer — matchers, ACL filters, approximate cardinality —
  * must fall back to the raw scan silently with unchanged results.
  */
class LabelIndexSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // env label has a NULL cell (absent on one row) and region is
  // entirely null — the two enumeration edges the raw paths define
  private lazy val df: DataFrame = Seq(
    (ts("2024-01-01 10:00:00"), "req", "prod", null.asInstanceOf[String], 1.0),
    (ts("2024-01-02 11:00:00"), "req", null.asInstanceOf[String],
      null.asInstanceOf[String], 2.0),
    (ts("2024-01-02 12:00:00"), "view", "dev", null.asInstanceOf[String], 3.0),
    (ts("2024-01-05 09:00:00"), "view", "prod", null.asInstanceOf[String], 4.0)
  ).toDF("ts", "event_type", "env", "region", "value")

  private val labels = Seq("event_type", "env", "region")
  private val path = "/tmp/graft_labelidx_spec"

  private lazy val indexed: TsdbQueryable = {
    LabelIndexStore.write(df, path, labels, "ts")
    new TsdbQueryable(df, labels)
      .withLabelIndex(LabelIndexStore.read(spark, path))
  }
  private lazy val raw = new TsdbQueryable(df, labels)

  private def rows(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq)

  test("indexed labelValues/labelNames/labelCardinality ≡ the raw scans") {
    assert(rows(indexed.labelValues("event_type")) ==
      rows(raw.labelValues("event_type")))
    assert(rows(indexed.labelValues("env")) == rows(raw.labelValues("env")))
    // entirely-null label: both sides empty
    assert(rows(indexed.labelValues("region")) ==
      rows(raw.labelValues("region")))
    assert(rows(indexed.labelValues("region")).isEmpty)
    // names: region has no non-null value → absent on both sides
    assert(rows(indexed.labelNames()) == rows(raw.labelNames()))
    assert(!rows(indexed.labelNames()).flatten.contains("region"))
    // cardinality: region must still emit its 0 row, like raw
    assert(rows(indexed.labelCardinality()) == rows(raw.labelCardinality()))
    assert(rows(indexed.labelCardinality())
      .exists(r => r == Seq("region", 0L)))
    // limits apply after the identical ordering
    assert(rows(indexed.labelValues("event_type", limit = 1)) ==
      rows(raw.labelValues("event_type", limit = 1)))
    assert(rows(indexed.labelNames(Nil, 2)) == rows(raw.labelNames(Nil, 2)))
  }

  test("incremental ingest: a second write replaces only the buckets " +
      "it carries (dynamic partition overwrite)") {
    val p = "/tmp/graft_labelidx_incr_spec"
    val day1 = Seq((ts("2024-01-01 10:00:00"), "req", 1.0))
      .toDF("ts", "event_type", "value")
    val day2v1 = Seq((ts("2024-01-02 10:00:00"), "view", 1.0))
      .toDF("ts", "event_type", "value")
    val day2v2 = Seq((ts("2024-01-02 11:00:00"), "click", 1.0))
      .toDF("ts", "event_type", "value")
    LabelIndexStore.write(day1, p, Seq("event_type"), "ts")
    LabelIndexStore.write(day2v1, p, Seq("event_type"), "ts")
    def pairs() = LabelIndexStore.read(spark, p)
      .select(col("bucket").cast("long"), col("label_value")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // a second-day ingest must not wipe day 1 (STATIC overwrite would)
    assert(pairs() == Set((19723L, "req"), (19724L, "view")))
    // re-ingesting day 2 replaces day 2 only
    LabelIndexStore.write(day2v2, p, Seq("event_type"), "ts")
    assert(pairs() == Set((19723L, "req"), (19724L, "click")))
    // and the sketch layer honors the same contract
    val ps = "/tmp/graft_labelidx_incr_sketch_spec"
    LabelIndexStore.writeSketches(day1, ps, Seq("event_type"), "ts")
    LabelIndexStore.writeSketches(day2v1, ps, Seq("event_type"), "ts")
    assert(LabelIndexStore.readSketches(spark, ps)
      .select(col("bucket").cast("long")).as[Long].collect().toSet ==
      Set(19723L, 19724L))
  }

  test("same-label matchers route labelValues at index grain: ≡ raw " +
      "across eq/neq/regex/negation/empty edges; cross-label and " +
      "non-string labels fall back silently") {
    def agree(name: String, ms: Seq[Matcher]): Unit =
      assert(rows(indexed.labelValues(name, ms)) ==
        rows(raw.labelValues(name, ms)), s"$name under $ms")
    val cases = Seq(
      Seq(Matcher.Eq("event_type", "req")),
      Seq(Matcher.Neq("event_type", "req")),
      Seq(Matcher.Re("event_type", "v.*")),
      Seq(Matcher.Nre("event_type", "v.*")),
      Seq(Matcher.Re("event_type", ".*")), // match-all compiles to None
      Seq(Matcher.Eq("event_type", "")), // absent-match: no "" stored
      Seq(Matcher.Re("event_type", "r.q"), Matcher.Neq("event_type", "x")))
    cases.foreach(agree("event_type", _))
    // env has a null cell: negation matchers see it as "" on the raw
    // side but it contributes no VALUE either way
    agree("env", Seq(Matcher.Nre("env", "pr.*")))
    agree("env", Seq(Matcher.Eq("env", "")))
    def plan(d: DataFrame) = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // routed: the index path serves, the raw local relation is gone
    val p = plan(indexed.labelValues("event_type",
      Seq(Matcher.Re("event_type", "v.*"))))
    assert(p.contains("graft_labelidx_spec") && !p.contains("LocalTableScan"))
    // a matcher on ANOTHER label disqualifies routing (the index has
    // no cross-column row linkage) — raw results, unchanged
    val q = plan(indexed.labelValues("env", Seq(Matcher.Eq("event_type", "req"))))
    assert(!q.contains("graft_labelidx_spec"))
    agree("env", Seq(Matcher.Eq("event_type", "req")))
    // a NON-STRING label column never routes: raw compares in the
    // native type where "05" == 5; the index's canonical strings
    // would diverge
    val numDf = Seq((ts("2024-01-01 10:00:00"), 5L, 1.0),
      (ts("2024-01-02 10:00:00"), 7L, 2.0)).toDF("ts", "user_id", "value")
    val numPath = "/tmp/graft_labelidx_num_spec"
    LabelIndexStore.write(numDf, numPath, Seq("user_id"), "ts")
    val numIndexed = new TsdbQueryable(numDf, Seq("user_id"))
      .withLabelIndex(LabelIndexStore.read(spark, numPath))
    val numRaw = new TsdbQueryable(numDf, Seq("user_id"))
    val numMs = Seq(Matcher.Eq("user_id", "05"))
    assert(!plan(numIndexed.labelValues("user_id", numMs))
      .contains("graft_labelidx_num_spec"))
    assert(rows(numIndexed.labelValues("user_id", numMs)) ==
      rows(numRaw.labelValues("user_id", numMs)))
  }

  test("a column OUTSIDE labelCols never routes: the index only holds " +
      "labelCols, so enumeration of any other df column takes raw") {
    // `value` is a real df column but not a label — with or without
    // matchers the indexed queryable must answer like raw, not empty
    def vals(q: TsdbQueryable, ms: Seq[Matcher]) =
      rows(q.labelValues("value", ms))
    assert(vals(indexed, Nil) == vals(raw, Nil) && vals(raw, Nil).nonEmpty)
    assert(vals(indexed, Seq(Matcher.Eq("value", "1.0"))) ==
      vals(raw, Seq(Matcher.Eq("value", "1.0"))))
  }

  test("routing is visible in the plan; raw scan absent") {
    def plan(d: DataFrame) = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val p = plan(indexed.labelValues("event_type"))
    assert(p.contains("graft_labelidx_spec"))
    // the sample table here is a local relation — an indexed
    // enumeration's plan must not contain it at all
    assert(!p.contains("LocalTableScan"),
      "indexed enumeration must not touch the sample table")
  }

  test("matchers / ACL filter / approx cardinality fall back to raw, silently") {
    val m = Seq(Matcher.Eq("event_type", "req"))
    // matcher-constrained enumeration cannot come from the index —
    // and the answers still match the raw queryable exactly
    assert(rows(indexed.labelValues("env", m)) ==
      rows(raw.labelValues("env", m)))
    assert(rows(indexed.labelNames(m, 0)) == rows(raw.labelNames(m, 0)))
    assert(rows(indexed.labelCardinality(m)) == rows(raw.labelCardinality(m)))
    def plan(d: DataFrame) = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan(indexed.labelValues("env", m)).contains("graft_labelidx_spec"))
    // ACL filter rides the raw path even without matchers
    val acl = indexed.withMaterializedLabelsFilterCallback(
      col("event_type") =!= "view")
    assert(!plan(acl.labelValues("env")).contains("graft_labelidx_spec"))
    assert(rows(acl.labelValues("env")) == Seq(Seq("prod")))
    // approximate cardinality keeps its HLL semantics (raw path)
    assert(!plan(indexed.labelCardinality(Nil, exact = false))
      .contains("graft_labelidx_spec"))
  }

  test("streamed label index ≡ the batch index, and serves the routed paths") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_labelidx_stream").toString
    val mem = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val stream = mem.toDF().toDF("ts", "event_type", "env", "region")
    val query = graft.streaming.EventsStream.toLabelIndexLayer(
      stream, s"$root/idx", s"$root/ckpt", labels, "10 minutes").start()
    try {
      mem.addData(df.select("ts", "event_type", "env", "region")
        .collect().toSeq.map(r => (r.getTimestamp(0), r.getString(1),
          r.getString(2), r.getString(3))): _*)
      query.processAllAvailable()
      // advance the watermark far past every bucket → all sealed
      mem.addData((ts("2024-02-01 00:00:00"), "advancer", null, null))
      query.processAllAvailable()
    } finally query.stop()
    LabelIndexStore.write(df, s"$root/batch", labels, "ts")
    def canon(path: String) = LabelIndexStore.read(spark, path)
      .filter(col("label_value") =!= "advancer")
      .select("bucket", "label_name", "label_value", "n_rows")
      .collect().map(_.toSeq).toSet
    assert(canon(s"$root/idx") == canon(s"$root/batch"))
    // the streamed index serves the standard routed read path
    val q = new TsdbQueryable(df, labels).withLabelIndex(
      LabelIndexStore.read(spark, s"$root/idx")
        .filter(col("label_value") =!= "advancer"))
    assert(rows(q.labelValues("env")) == rows(raw.labelValues("env")))
    assert(rows(q.labelCardinality()) == rows(raw.labelCardinality()))
  }

  test("querier range scoping: aligned ranges keep the index " +
      "(bucket-pruned), unaligned drop to raw — answers never change") {
    def plan(d: DataFrame) = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val day = 86400000L
    val jan2 = 1704153600000L
    // ALIGNED [Jan 2, Jan 3): the scoped enumeration stays routed —
    // and equals the raw scan over the same range (only 'dev' there)
    val aligned = indexed.scopedTo(jan2, jan2 + day)
    val rawScoped = raw.scopedTo(jan2, jan2 + day)
    assert(rows(aligned.labelValues("env")) ==
      rows(rawScoped.labelValues("env")))
    assert(rows(aligned.labelValues("env")) == Seq(Seq("dev")))
    assert(rows(aligned.labelCardinality()) ==
      rows(rawScoped.labelCardinality()))
    assert(plan(aligned.labelValues("env")).contains("graft_labelidx_spec"))
    // UNALIGNED [Jan 2 00:00, Jan 2 13:00): a partial bucket cannot
    // come from bucket-grain index rows — silent raw fallback, same
    // answers (the 12:00 'dev' row is inside, nothing else has env)
    val part = indexed.scopedTo(jan2, jan2 + 13 * 3600000L)
    assert(!plan(part.labelValues("env")).contains("graft_labelidx_spec"))
    assert(rows(part.labelValues("env")) ==
      rows(raw.scopedTo(jan2, jan2 + 13 * 3600000L).labelValues("env")))
    assert(rows(part.labelValues("env")) == Seq(Seq("dev")))
    // scoping also limits the select path
    assert(aligned.select("2024-01-01", "2024-02-01", Nil).count() == 2)
    // ATTACHMENT ORDER cannot leak out-of-range rows: a layer
    // attached AFTER scoping is pruned identically to one attached
    // before (the scope prunes lazily at eligibility time)
    val after = raw.scopedTo(jan2, jan2 + day)
      .withLabelIndex(LabelIndexStore.read(spark, path))
    assert(rows(after.labelValues("env")) == Seq(Seq("dev")))
    assert(plan(after.labelValues("env")).contains("graft_labelidx_spec"))
    // and an unaligned scope disqualifies a later-attached layer too
    val afterPart = raw.scopedTo(jan2, jan2 + 13 * 3600000L)
      .withLabelIndex(LabelIndexStore.read(spark, path))
    assert(!plan(afterPart.labelValues("env"))
      .contains("graft_labelidx_spec"))
    // nested scopes intersect: [Jan 1, Jan 3) ∩ [Jan 2, Feb 1) =
    // [Jan 2, Jan 3) — same routed answer as the direct scope
    val nested = indexed.scopedTo(jan2 - day, jan2 + day)
      .scopedTo(jan2, jan2 + 30 * day)
    assert(rows(nested.labelValues("env")) == Seq(Seq("dev")))
  }

  test("HLL sketch layer: per-bucket union ≡ one whole-table sketch, " +
      "exact in sparse mode, routed with silent fallback") {
    val skPath = "/tmp/graft_labelsk_spec"
    LabelIndexStore.writeSketches(df, skPath, labels, "ts")
    val sk = LabelIndexStore.readSketches(spark, skPath)
    // HLL register state is a deterministic function of the inserted
    // value SET: unioning the per-bucket sketches must estimate
    // exactly what a single whole-table sketch estimates
    val unioned = LabelIndexStore.approxLabelCardinality(sk)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = df
      .select(explode(map(labels.flatMap(c =>
        Seq(lit(c), col(c).cast("string"))): _*))
        .as(Seq("label_name", "label_value")))
      .filter(col("label_value").isNotNull)
      .groupBy("label_name")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("label_value"), lit(14)))
        .cast("long").as("cardinality"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unioned == global)
    // at this cardinality the sketch is in sparse mode — the
    // estimate is EXACT, so it equals the raw count(DISTINCT)
    assert(unioned == Map("event_type" -> 2L, "env" -> 2L))
    // routed approx cardinality serves from the sketch layer (plan
    // shows the sketch parquet, sample table absent) with the same
    // zero-row rebuild for the all-null label
    val q = new TsdbQueryable(df, labels).withLabelSketches(sk)
    val served = q.labelCardinality(Nil, exact = false)
    def plan(d: DataFrame) = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan(served).contains("graft_labelsk_spec"))
    // served = stored registers unioned; the raw fallback would have
    // to SKETCH the sample table on the fly (hll_sketch_agg) or run
    // approx_count_distinct over it — neither may appear. (The tiny
    // label-name zero-fill list is a LocalTableScan by design, so
    // scan-node counting can't discriminate here.)
    assert(!plan(served).contains("hll_sketch_agg"),
      "sketch-served cardinality must not sketch the sample table")
    assert(!plan(served).contains("approx_count_distinct"))
    assert(rows(served) == Seq(Seq("env", 2L), Seq("event_type", 2L),
      Seq("region", 0L)))
    // matchers / ACL filter fall back to the raw HLL scan silently
    val m = Seq(Matcher.Eq("event_type", "req"))
    assert(!plan(q.labelCardinality(m, exact = false))
      .contains("graft_labelsk_spec"))
    assert(rows(q.labelCardinality(m, exact = false)) ==
      rows(raw.labelCardinality(m, exact = false)))
    // 5% contract on the bigger end: the sketch layer built over the
    // event fixture agrees with exact within the gate bound
    val exactCard = rows(raw.labelCardinality()).map {
      case Seq(n: String, c: Long) => n -> c
    }.toMap
    for ((n, approx) <- unioned ++ Map("region" -> 0L))
      assert(math.abs(approx - exactCard(n)) <= 0.05 * exactCard(n) ||
        exactCard(n) == approx)
  }

  test("streamed sketch layer ≡ the batch sketch layer at the " +
      "estimate level, and serves the routed approx path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_labelsk_stream").toString
    val mem = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val stream = mem.toDF().toDF("ts", "event_type", "env", "region")
    val query = graft.streaming.EventsStream.toLabelSketchLayer(
      stream, s"$root/sk", s"$root/ckpt", labels, "10 minutes").start()
    try {
      mem.addData(df.select("ts", "event_type", "env", "region")
        .collect().toSeq.map(r => (r.getTimestamp(0), r.getString(1),
          r.getString(2), r.getString(3))): _*)
      query.processAllAvailable()
      mem.addData((ts("2024-02-01 00:00:00"), "advancer", null, null))
      query.processAllAvailable()
    } finally query.stop()
    LabelIndexStore.writeSketches(df, s"$root/batch", labels, "ts")
    // sketch BYTES may differ (sparse coupon order follows arrival);
    // the register SET does not — estimates must agree exactly
    def card(path: String) = LabelIndexStore.approxLabelCardinality(
        LabelIndexStore.readSketches(spark, path)
          .filter(col("bucket") < 19754L)) // drop the advancer bucket
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card(s"$root/sk") == card(s"$root/batch"))
    assert(card(s"$root/sk") == Map("event_type" -> 2L, "env" -> 2L))
    // and the streamed layer serves the routed queryable path
    val q = new TsdbQueryable(df, labels).withLabelSketches(
      LabelIndexStore.readSketches(spark, s"$root/sk")
        .filter(col("bucket") < 19754L))
    assert(rows(q.labelCardinality(Nil, exact = false)) ==
      Seq(Seq("env", 2L), Seq("event_type", 2L), Seq("region", 0L)))
  }

  test("bucket-ranged select prunes to the overlapped buckets only") {
    LabelIndexStore.write(df, path, labels, "ts")
    val day = 86400000L
    // [Jan 2, Jan 3): only bucket 19724 — env 'dev' present, 'prod'
    // (Jan 1 / Jan 5) pruned away
    val sel = LabelIndexStore.select(spark, path,
      1704153600000L, 1704240000000L)
    assert(rows(LabelIndexStore.labelValues(sel, "env")) == Seq(Seq("dev")))
    // full range sees both
    assert(rows(LabelIndexStore.labelValues(
      LabelIndexStore.select(spark, path, 1704067200000L,
        1704067200000L + 5 * day), "env")) ==
      Seq(Seq("dev"), Seq("prod")))
  }
}
