package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native analog of the reference's Prometheus
  * `storage.Queryable` implementation (reference:
  * queryable/parquet_queryable.go:153-558): select series samples by
  * label matchers + time range, and answer LabelNames / LabelValues
  * under matchers.
  *
  * Model (SURVEY §3): a long-format series table with label columns,
  * a timestamp column and a value column. Where the reference
  * materializes chunk bytes and decodes samples (search/
  * materialize.go:674), here samples are plain rows: selection is a
  * Catalyst filter that pushes down to the Parquet scan, and
  * "materialization" is projection — Tungsten does the rest.
  *
  * At scale the table is written time-bucketed + label-sorted by
  * [[TsdbConverter]], so the same predicates prune partitions and
  * row groups instead of scanning 100 TB.
  */
final class TsdbQueryable(
    df: DataFrame,
    labelCols: Seq[String],
    tsCol: String = "ts",
    valueCol: String = "value") {

  private def withMatchers(matchers: Seq[Matcher]): DataFrame =
    Matcher.compile(matchers).map(df.filter).getOrElse(df)

  private def inRange(mint: String, maxt: String): Column =
    col(tsCol) >= lit(mint).cast("timestamp") &&
      col(tsCol) < lit(maxt).cast("timestamp")

  /** Select samples of all series matching `matchers` within
    * [mint, maxt), sorted by series labels then time — the `sorted`
    * contract of queryable/parquet_queryable.go:283 Select.
    */
  def select(mint: String, maxt: String, matchers: Matcher*): DataFrame =
    withMatchers(matchers)
      .filter(inRange(mint, maxt))
      .select((labelCols :+ tsCol :+ valueCol).map(col): _*)

  /** Label names that have at least one non-null value among rows
    * matching `matchers` (reference: materialize.go:273
    * MaterializeLabelNames). One pass: aggregate a count per label
    * column, then keep the non-empty ones.
    */
  def labelNames(matchers: Matcher*): DataFrame = {
    val counts = withMatchers(matchers)
      .agg(count(lit(1)).as("_rows"),
        labelCols.map(c => count(col(c)).as(c)): _*)
    val spark = df.sparkSession
    import spark.implicits._
    val stacked = labelCols
      .map(c => counts.select(lit(c).as("label_name"), col(c).as("_cnt")))
      .reduce(_ unionAll _)
    stacked.filter($"_cnt" > 0).select("label_name").orderBy("label_name")
  }

  /** Distinct values of one label among rows matching `matchers`
    * (reference: materialize.go:320 MaterializeLabelValues), sorted,
    * optionally limited (limits.go quota analog).
    */
  def labelValues(name: String, limit: Int = 0, matchers: Matcher*): DataFrame = {
    val base = withMatchers(matchers)
      .select(col(name).cast("string").as("label_value"))
      .filter(col("label_value").isNotNull)
      .distinct()
      .orderBy("label_value")
    if (limit > 0) base.limit(limit) else base
  }
}
