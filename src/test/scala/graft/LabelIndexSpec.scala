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
