package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized LABEL INDEX — per time bucket, the distinct
  * (label name, label value) pairs present in the series table, with
  * their row counts. This is the metadata layer the reference gets
  * from parquet DICTIONARY pages: `MaterializeAllLabelValues` /
  * `MaterializeLabelNames` (search/materialize.go:320,358) walk a
  * column's dictionary without touching data pages, so a label
  * enumeration costs dictionary bytes, not column bytes. Spark's
  * DataFrame reader has no dictionary-only scan, so graft
  * materializes the same information once at write time — the index
  * is to label queries (Grafana autocomplete, planner cardinality
  * probes) what [[RollupStore]] is to range queries: at 100 TB a
  * `label_values(user_id)` reads index rows (buckets × labels ×
  * distinct values) instead of a full column of every sample.
  *
  * Maintenance shape: ONE narrow map (bucket stamp + a per-row
  * explode of the label map — labelCols entries per row) into one
  * partial-aggregating shuffle at (bucket, label, value) grain: the
  * map-side combine collapses each partition to its distinct pairs
  * before anything moves, so the exchange is index-sized, never
  * sample-sized. The layout is bucket-partitioned parquet like every
  * other layer, so a time-ranged label query prunes whole bucket
  * directories, and an incremental ingest rewrites only the buckets
  * it touched (dynamic partition overwrite).
  *
  * Answer EXACTNESS: the index stores every distinct pair with its
  * count, so names (presence), values (distinct union across
  * buckets) and per-label cardinality (distinct count across
  * buckets) reconstruct the raw distinct-scan answers exactly —
  * routing through the index can change bytes read, never results.
  * [[TsdbQueryable.withLabelIndex]] routes the three label paths
  * here when no matchers/ACL filter apply and falls back to the raw
  * scan silently otherwise (a matcher constrains OTHER columns of
  * the same row — cross-column information the per-label index does
  * not hold, same reason the reference's dictionary path serves the
  * unconstrained enumeration).
  */
object LabelIndexStore {

  /** Materialize the index for `df`'s `labelCols` at
    * `bucketDuration` grain. Values are stored as strings (the
    * Prometheus label model; [[TsdbQueryable.labelValues]] casts the
    * same way), nulls are absent (a null label cell is "no value" in
    * the flattened model, exactly how the raw paths count).
    */
  def write(df: DataFrame, path: String, labelCols: Seq[String],
      tsCol: String, bucketDuration: String = "1 day"): Unit = {
    require(labelCols.nonEmpty, "labelCols must be non-empty")
    df.withColumn("bucket", TsdbConverter.bucketCol(tsCol, bucketDuration))
      .select(col("bucket"), explode(map(
        labelCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
        .as(Seq("label_name", "label_value")))
      .filter(col("label_value").isNotNull)
      .groupBy("bucket", "label_name", "label_value")
      .agg(count(lit(1)).as("n_rows"))
      .sortWithinPartitions("label_name", "label_value")
      // dynamic overwrite: an incremental ingest must replace only the
      // buckets it carries — Spark's default STATIC mode would wipe every
      // previously written bucket directory.
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Index rows restricted to the buckets overlapping
    * `[mintMs, maxtMs)` — a LITERAL partition-column filter, so
    * whole bucket directories prune before any file opens.
    */
  def select(spark: SparkSession, path: String, mintMs: Long, maxtMs: Long,
      bucketDuration: String = "1 day"): DataFrame = {
    require(maxtMs > mintMs, s"empty range [$mintMs, $maxtMs)")
    val width = TsdbConverter.durationSeconds(bucketDuration) * 1000L
    read(spark, path)
      .filter(col("bucket").between(
        Math.floorDiv(mintMs, width), Math.floorDiv(maxtMs - 1, width)))
  }

  /** Distinct values of `name`, sorted, optionally limited — the
    * [[TsdbQueryable.labelValues]] contract served from index rows.
    */
  def labelValues(index: DataFrame, name: String, limit: Int = 0): DataFrame = {
    val base = index
      .filter(col("label_name") === name)
      .select(col("label_value"))
      .distinct()
      .orderBy("label_value")
    if (limit > 0) base.limit(limit) else base
  }

  /** Label names with at least one value — presence in the index IS
    * non-null existence (nulls were dropped at write).
    */
  def labelNames(index: DataFrame, limit: Int = 0): DataFrame = {
    val base = index.select(col("label_name")).distinct()
      .orderBy("label_name")
    if (limit > 0) base.limit(limit) else base
  }

  /** Exact per-label distinct-value cardinality: distinct across
    * buckets of the stored pairs — identical to the raw
    * count(DISTINCT) per column, at index cardinality.
    */
  def labelCardinality(index: DataFrame): DataFrame =
    index.groupBy(col("label_name"))
      .agg(countDistinct(col("label_value")).cast("long").as("cardinality"))
      .orderBy("label_name")

  // ---------------------------------------------------------------
  // HLL sketch layer — approximate cardinality at METADATA grain
  // ---------------------------------------------------------------

  /** Materialize per (bucket, label) HYPERLOGLOG SKETCHES of the
    * label's values (Spark's DataSketches `hll_sketch_agg`). This is
    * the cardinality layer one level ABOVE the pair index: the pair
    * index holds every distinct (label, value) — for a billion-user
    * `user_id` label that is still a billion rows — while this layer
    * holds ONE fixed-size (≤ 2^lgK bytes) register array per (bucket,
    * label). Because an HLL register state is a deterministic
    * function of the inserted value SET, per-bucket sketches UNION
    * into exactly the register state a single whole-range sketch
    * would have ([[LabelIndexSpec]] pins the estimates equal
    * bitwise) — so a time-ranged approximate `label_cardinality`
    * reads buckets × labels tiny rows and never touches values, the
    * metadata-scan shape dictionary statistics give the reference.
    * Default lgK = 14: relative standard error ≈ 0.81 %
    * (1.04/√2^14), spec-pinned within 5 % of exact on the gate data.
    *
    * Same maintenance shape as [[write]]: one narrow explode, one
    * partial-aggregating shuffle at (bucket, label) grain — sketches
    * merge map-side, so the exchange carries one register array per
    * partition × label, never values.
    */
  def writeSketches(df: DataFrame, path: String, labelCols: Seq[String],
      tsCol: String, bucketDuration: String = "1 day",
      lgK: Int = 14): Unit = {
    require(labelCols.nonEmpty, "labelCols must be non-empty")
    df.withColumn("bucket", TsdbConverter.bucketCol(tsCol, bucketDuration))
      .select(col("bucket"), explode(map(
        labelCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
        .as(Seq("label_name", "label_value")))
      .filter(col("label_value").isNotNull)
      .groupBy("bucket", "label_name")
      .agg(hll_sketch_agg(col("label_value"), lit(lgK)).as("sketch"))
      // dynamic overwrite — same incremental-ingest contract as [[write]].
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path)
  }

  def readSketches(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Sketch rows restricted to the buckets overlapping
    * `[mintMs, maxtMs)` — the same literal partition pruning as
    * [[select]].
    */
  def selectSketches(spark: SparkSession, path: String, mintMs: Long,
      maxtMs: Long, bucketDuration: String = "1 day"): DataFrame = {
    require(maxtMs > mintMs, s"empty range [$mintMs, $maxtMs)")
    val width = TsdbConverter.durationSeconds(bucketDuration) * 1000L
    readSketches(spark, path)
      .filter(col("bucket").between(
        Math.floorDiv(mintMs, width), Math.floorDiv(maxtMs - 1, width)))
  }

  /** Approximate per-label cardinality from a sketch frame: union
    * the per-bucket registers, one estimate per label. Cost is
    * independent of value cardinality — the 100 TB shape for the
    * cardinality probes planners and UIs fire constantly.
    */
  def approxLabelCardinality(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("label_name"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .cast("long").as("cardinality"))
      .orderBy("label_name")
}
