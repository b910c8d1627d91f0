package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

/** Materialized QUANTILE SKETCH layer — per (series, window) one
  * Greenwald–Khanna summary of the window's samples
  * ([[graft.functions.QuantileSketch]]), in the same bucketed layout
  * as every other layer. This is the `quantile_over_time` analog of
  * the rollup layers: exact quantiles are order statistics the
  * moment columns cannot serve (the router leaves them raw by
  * design), so the layer stores the classic deterministic compromise
  * instead — a fixed-size summary whose quantile answers carry a
  * worst-case ±ε·n RANK guarantee, and which MERGES across windows.
  * A 30-day p99 dashboard probe then reads windows-in-range sketch
  * rows (one ~O((1/ε)·log εn) blob per window) and merges them,
  * never the raw samples.
  *
  * DECLARED APPROXIMATE: exposed as this explicit API plus a
  * rank-contract gate (`ts_quantile_sketch`) — never silently routed
  * by the PromQL front-end, whose invariant is that routing can
  * never change answers.
  *
  * Maintenance shape: one partial-aggregating shuffle at (series,
  * window) grain — GK buffers merge map-side like any imperative
  * aggregate; the write reuses [[TsdbConverter.convert]]'s bucketed
  * sorted layout, so range reads prune day directories and matchers
  * push into the scan.
  */
object QuantileSketchStore {

  /** Materialize the sketch layer at `resolutionMs` window width. */
  def write(df: DataFrame, path: String, seriesCols: Seq[String],
      tsCol: String, valueCol: String, resolutionMs: Long,
      relativeError: Double = 0.01,
      opts: ConvertOptions = ConvertOptions(Nil)): Unit = {
    require(resolutionMs > 0, s"resolution must be positive, got $resolutionMs")
    require(relativeError > 0 && relativeError < 1,
      s"relativeError must be in (0, 1), got $relativeError")
    val rolled = df
      .withColumn("_win",
        (floor(unix_millis(col(tsCol).cast("timestamp")) / resolutionMs) *
          resolutionMs).cast("long"))
      .groupBy((seriesCols.map(col) :+ col("_win").as("window_ms")): _*)
      .agg(QuantileSketch
        .sketchAgg(col(valueCol).cast("double"), relativeError)
        .as("qsketch"))
      .withColumn(tsCol, timestamp_millis(col("window_ms")))
    TsdbConverter.convert(rolled, path, tsCol,
      if (opts.sortBy.nonEmpty) opts else opts.copy(sortBy = seriesCols))
  }

  /** Build a COARSER sketch layer from a finer one — the same
    * cascade maintenance shape as [[RollupStore.writeFrom]] (coarser
    * layers never rescan raw): per coarse window the fine windows'
    * summaries MERGE, which is exactly how Spark distributes its own
    * percentile aggregation across partitions, so the rank guarantee
    * survives (the gate/spec contract margin of 2ε covers merge
    * growth). Counts compose exactly (n is order-independent);
    * quantile ANSWERS may differ from a direct build by merge order,
    * within the bound — the same declared-approximate convention as
    * the whole layer.
    */
  def writeFrom(spark: SparkSession, finePath: String, path: String,
      seriesCols: Seq[String], tsCol: String, fineResolutionMs: Long,
      resolutionMs: Long, opts: ConvertOptions = ConvertOptions(Nil)): Unit = {
    require(fineResolutionMs > 0 && resolutionMs > fineResolutionMs,
      s"coarse resolution $resolutionMs must exceed fine $fineResolutionMs")
    require(resolutionMs % fineResolutionMs == 0,
      s"coarse resolution $resolutionMs must be a multiple of " +
        s"$fineResolutionMs or fine windows would straddle coarse seams")
    val rolled = read(spark, finePath)
      .withColumn("_cw",
        (floor(col("window_ms") / resolutionMs) * resolutionMs).cast("long"))
      .groupBy((seriesCols.map(col) :+ col("_cw").as("window_ms")): _*)
      .agg(QuantileSketch.mergeAgg(col("qsketch")).as("qsketch"))
      .withColumn(tsCol, timestamp_millis(col("window_ms")))
    TsdbConverter.convert(rolled, path, tsCol,
      if (opts.sortBy.nonEmpty) opts else opts.copy(sortBy = seriesCols))
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Sketch rows whose window lies in `[mintMs, maxtMs)` — literal
    * bucket pruning plus matcher pushdown, like [[RollupStore.select]].
    */
  def select(spark: SparkSession, path: String, mintMs: Long, maxtMs: Long,
      matchers: Seq[Matcher] = Nil,
      bucketDuration: String = "1 day"): DataFrame = {
    require(maxtMs > mintMs, s"empty range [$mintMs, $maxtMs)")
    val width = TsdbConverter.durationSeconds(bucketDuration) * 1000L
    val pred = matchers.flatMap(_.toPredicate)
      .reduceOption(_ && _).getOrElse(lit(true))
    read(spark, path)
      // floorDiv, not /: pre-epoch (negative-ms) bounds must round toward
      // -inf or the lower bucket bound excludes valid buckets — same
      // convention as LabelIndexStore.select and TsdbQueryable.scopedLayer.
      .filter(col("bucket").between(
        Math.floorDiv(mintMs, width), Math.floorDiv(maxtMs - 1, width)))
      .filter(col("window_ms") >= mintMs && col("window_ms") < maxtMs)
      .filter(pred)
  }

  /** Approximate per-series quantile over the window-aligned range:
    * merge the windows' sketches, one query — the returned value's
    * rank among the range's raw samples is within the merged
    * summaries' ε bound of q·n ([[QuantileSketchSpec]] and the
    * `ts_quantile_sketch` gate pin the contract). One aggregation at
    * series grain; the buffer is one summary, independent of n.
    */
  def quantileOverTime(spark: SparkSession, path: String,
      seriesCols: Seq[String], q: Double, mintMs: Long, maxtMs: Long,
      matchers: Seq[Matcher] = Nil): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must be in [0, 1], got $q")
    select(spark, path, mintMs, maxtMs, matchers)
      .groupBy(seriesCols.map(col): _*)
      .agg(QuantileSketch.mergeAgg(col("qsketch")).as("_merged"))
      // a series whose in-range windows hold only empty (all-NaN)
      // sketches answers NaN, matching the raw order-statistic path
      // and the PromQL front-end — the two public APIs agree on
      // series presence and on the all-NaN edge.
      .select((seriesCols.map(col) :+
        coalesce(QuantileSketch.query(col("_merged"), lit(q)),
          lit(Double.NaN)).as("value")): _*)
  }
}
