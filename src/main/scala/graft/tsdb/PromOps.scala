package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL-flavoured operators over the long-format series model.
  *
  * The reference is the storage layer beneath a PromQL engine
  * (queryable/parquet_queryable.go feeds Thanos/Cortex evaluators);
  * these are the evaluator-side operations its consumers run,
  * re-expressed as single-shuffle Spark plans: window functions for
  * per-series deltas, time_bucket + groupBy for range aggregation.
  * All are codegen-friendly (built-in functions only, no UDFs).
  */
object PromOps {

  /** Latest sample per series at or before `at` — an instant query.
    * One shuffle (the window partition); ties broken on a total
    * order so results are deterministic.
    */
  def lastPoint(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Per-series increase over the full selected range, counter-style:
    * sum of positive deltas between consecutive samples (PromQL
    * `increase` without extrapolation — documented, and mirrored
    * exactly by the DuckDB oracle).
    */
  def increase(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    df.withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_delta",
        when(col("_prev").isNull, lit(0.0))
          .when(col(valueCol) >= col("_prev"), col(valueCol) - col("_prev"))
          .otherwise(col(valueCol))) // counter reset
      .groupBy(seriesCols.map(col): _*)
      .agg(sum("_delta").as("increase"), count(lit(1)).as("samples"))
  }

  /** Per-series rate: counter increase divided by the range width in
    * seconds (PromQL `rate` = increase / range, no extrapolation —
    * the division the reference's PromQL consumers apply on top of
    * Select, queryable/parquet_queryable.go:283).
    */
  def rate(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valueCol: String, rangeSeconds: Double,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(rangeSeconds > 0, "rangeSeconds must be positive")
    increase(df, seriesCols, tsCol, valueCol, tieBreak)
      .withColumn("rate", col("increase") / rangeSeconds)
  }

  /** Cross-series aggregation — PromQL `sum/avg/min/max/count by
    * (labels)`: collapse all series sharing the `by` labels at each
    * timestamp-bucket. One shuffle on (by-labels, bucket); map-side
    * partial aggregation keeps the 100 TB shuffle small.
    */
  def aggregateBy(df: DataFrame, by: Seq[String], tsCol: String,
      valueCol: String, window: String): DataFrame =
    df.groupBy((by.map(col) :+ date_trunc(window, col(tsCol)).as("bucket")): _*)
      .agg(
        sum(col(valueCol)).as("sum_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        count(lit(1)).as("n_series_samples"))

  /** Per-series count of counter resets (PromQL `resets`): samples
    * strictly below their predecessor.
    */
  def resets(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    df.withColumn("_prev", lag(col(valueCol), 1).over(w))
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(when(col(valueCol) < col("_prev"), 1).otherwise(0))
        .cast("long").as("resets"))
  }

  /** Per-series gauge delta (PromQL `delta`, no extrapolation):
    * last value minus first value over the selected range.
    */
  def delta(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col))
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("_first", first(col(valueCol)).over(w))
      .withColumn("_last", last(col(valueCol)).over(w))
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("_last") - col("_first")).as("delta"))
  }

  /** Downsample to fixed windows: per-series per-bucket aggregates
    * (avg/max/count) — the `*_over_time` family over aligned steps.
    */
  def downsample(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valueCol: String, window: String): DataFrame =
    df.groupBy((seriesCols.map(col) :+
        date_trunc(window, col(tsCol)).as("bucket")): _*)
      .agg(
        avg(col(valueCol)).as("avg_value"),
        max(col(valueCol)).as("max_value"),
        count(lit(1)).as("n_samples"))
}
