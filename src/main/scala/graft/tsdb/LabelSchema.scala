package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic label-set ↔ physical-column mapping — the Spark analog of
  * the reference's schema builder (reference: schema/schema_builder.go
  * :41-171), which scans a TSDB block's label names and emits one
  * physical parquet column `l_<name>` per label.
  *
  * Prometheus series carry an open label set; a columnar layout wants
  * fixed physical columns. `spread` discovers the label-name universe
  * (an aggregation over the corpus — metadata-scale, the same pass
  * the reference's builder makes over a block's index) and pivots a
  * `map<string,string>` labels column into `l_<name>` columns; absent
  * labels become nulls, which Parquet stores for free and [[Matcher]]
  * treats as "" — exactly the reference's null-page convention.
  * `gather` is the inverse.
  */
object LabelSchema {

  val prefix = "l_"

  /** Distinct label names present in a map-typed labels column. One
    * distributed aggregation; the result (label-name universe) is
    * metadata-sized by construction.
    */
  def labelNames(df: DataFrame, labelsCol: String): Seq[String] =
    df.select(explode(map_keys(col(labelsCol))).as("k"))
      .distinct().orderBy("k")
      .collect().map(_.getString(0)).toSeq

  /** Pivot `labelsCol: map<string,string>` into one `l_<name>` column
    * per discovered label, dropping the map.
    */
  def spread(df: DataFrame, labelsCol: String): DataFrame =
    spread(df, labelsCol, labelNames(df, labelsCol))

  /** [[spread]] against an ALREADY-DISCOVERED label universe — the
    * reference runs its schema builder once per block at convert time
    * (schema/schema_builder.go:41) and reuses the result for every
    * query; callers that hold that metadata pass it here and skip the
    * discovery scan. Labels absent from `names` are dropped, exactly
    * as the reference's fixed physical schema drops unknown labels.
    */
  def spread(df: DataFrame, labelsCol: String, names: Seq[String]): DataFrame = {
    val labelCols = names.map(n => col(labelsCol).getItem(n).as(prefix + n))
    val rest = df.columns.filterNot(_ == labelsCol).map(col).toSeq
    df.select(rest ++ labelCols: _*)
  }

  /** Inverse of [[spread]]: fold all `l_<name>` columns back into a
    * map, omitting absent (null) labels per series.
    */
  def gather(df: DataFrame, labelsCol: String = "labels"): DataFrame = {
    val labelCols = df.columns.filter(_.startsWith(prefix)).sorted.toSeq
    val entries = labelCols.flatMap { c =>
      Seq(lit(c.stripPrefix(prefix)), col(c))
    }
    val rest = df.columns.filterNot(_.startsWith(prefix)).map(col).toSeq
    df.select(rest :+ map_filter(map(entries: _*), (_, v) => v.isNotNull)
      .as(labelsCol): _*)
  }
}
