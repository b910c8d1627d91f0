package graft.tsdb

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native analog of the reference's TSDB→Parquet converter
  * (reference: convert/convert.go:348 ConvertTSDBBlock and its
  * options convert.go:112-274).
  *
  * Option mapping (WHAT, re-expressed for Spark's execution model):
  *   - WithSortBy(labels…)      → range-repartition + sort-within-
  *     partitions on the label columns, so parquet row-group min/max
  *     stats give the same pruning the reference gets from its
  *     sorted layout.
  *   - WithColDuration(d)       → a `bucket` partition column
  *     (floor(epoch/d)); time-range queries prune whole directories
  *     instead of decoding chunk columns (schema/schema_builder.go:155
  *     DataColumIdx analog).
  *   - WithRowGroupSize/NumRowGroups → parquet.block.size +
  *     maxRecordsPerFile.
  *   - WithBloomFilterLabels    → parquet bloom filter write options
  *     (convert.go:81 buildBloomfilterColumns analog).
  *   - compression opts         → spark.sql.parquet.compression.codec.
  *
  * The reference's k-way merge of overlapping blocks with same-series
  * chunk dedup (convert/merge.go) is `mergeShards` below: union +
  * last-writer-wins per (series, ts) — a single shuffle, no driver
  * loop, scales with executors.
  */
final case class ConvertOptions(
    sortBy: Seq[String],
    colDuration: String = "1 day", // bucket width, any Spark interval
    bloomFilterLabels: Seq[String] = Nil,
    maxRecordsPerFile: Long = 0L,
    shards: Int = 0,
    compression: String = "zstd",
    // the row-group / page sizing knobs the reference exposes as
    // WithRowGroupSize / WithPageBufferSize (convert/convert.go:
    // 226,179). NOT a 1:1 unit mapping: the reference's
    // WithRowGroupSize targets ROWS per row group (default 1 M);
    // Spark's parquet writer sizes row groups in BYTES
    // (parquet.block.size), so this knob is byte-based — same lever
    // (row-group grain), different unit. WithPageBufferSize is
    // byte-sized on both sides. 0 keeps the writer defaults.
    // Row-group size bounds the unit of row-group pruning (smaller
    // groups → finer mint/maxt skipping, more footer overhead);
    // page size bounds the unit of page-level dictionary/stats
    // reads.
    rowGroupBytes: Long = 0L,
    pageBytes: Long = 0L)

object TsdbConverter {

  /** Bucket width in seconds for a `colDuration` spec. */
  def durationSeconds(duration: String): Long = duration.trim.split("\\s+") match {
    case Array(n, u) => n.toLong * (u.toLowerCase match {
      case "second" | "seconds" => 1L
      case "minute" | "minutes" => 60L
      case "hour" | "hours"     => 3600L
      case "day" | "days"       => 86400L
      case other => throw new IllegalArgumentException(s"bad unit $other")
    })
    case _ => throw new IllegalArgumentException(s"bad duration $duration")
  }

  /** Bucket index for a timestamp column: floor(epoch_sec / width). */
  def bucketCol(tsCol: String, duration: String) =
    floor(unix_timestamp(col(tsCol)) / durationSeconds(duration)).cast("long")

  /** Write a long-format series DataFrame as a time-bucketed,
    * label-sorted parquet dataset.
    */
  def convert(df: DataFrame, path: String, tsCol: String, opts: ConvertOptions): Unit = {
    val bucketed = df.withColumn("bucket", bucketCol(tsCol, opts.colDuration))
    val arranged =
      (if (opts.shards > 0)
        bucketed.repartition(opts.shards, opts.sortBy.map(col): _*)
      else bucketed)
    writeArranged(arranged, path, tsCol, opts)
  }

  /** The write half of [[convert]] over data that already carries the
    * layout partitioning (and a `bucket` column): sort within
    * partitions + bucketed parquet write, no extra exchange. Callers
    * that can establish the `opts.sortBy` hash partitioning upstream
    * (e.g. [[mergeBlockDirs]], which rides it through the merge
    * aggregation) skip [[convert]]'s repartition entirely.
    */
  private def writeArranged(bucketed: DataFrame, path: String,
      tsCol: String, opts: ConvertOptions): Unit = {
    val sortCols = (opts.sortBy :+ tsCol).map(col)
    val arranged = bucketed.sortWithinPartitions(col("bucket") +: sortCols: _*)
    var w = arranged.write
      .mode(SaveMode.Overwrite)
      .option("compression", opts.compression)
      .partitionBy("bucket")
    if (opts.maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", opts.maxRecordsPerFile)
    if (opts.rowGroupBytes > 0)
      w = w.option("parquet.block.size", opts.rowGroupBytes)
    if (opts.pageBytes > 0)
      w = w.option("parquet.page.size", opts.pageBytes)
    opts.bloomFilterLabels.foreach { l =>
      w = w.option(s"parquet.bloom.filter.enabled#$l", "true")
    }
    w.parquet(path)
  }

  /** [[convert]] for an open label set: a `map<string,string>` labels
    * column is first spread to `l_<name>` physical columns
    * ([[LabelSchema.spread]] — the reference's schema-builder pass,
    * schema/schema_builder.go:41), then written sorted/bucketed. The
    * result is the reference's wide layout: one parquet column per
    * label, absent labels as nulls.
    */
  def convertWithLabels(df: DataFrame, labelsCol: String, path: String,
      tsCol: String, opts: ConvertOptions): Unit = {
    val wide = LabelSchema.spread(df, labelsCol)
    val sortBy =
      if (opts.sortBy.nonEmpty) opts.sortBy
      else wide.columns.filter(_.startsWith(LabelSchema.prefix)).sorted.toSeq
    convert(wide, path, tsCol, opts.copy(sortBy = sortBy))
  }

  /** Merge N converted shards that may overlap in series/time:
    * last-writer-wins per (series labels, ts), where "last" = the
    * highest shard ordinal — the deterministic winner the reference's
    * k-way merge picks (convert/merge.go:25 NewMergeChunkSeriesSet +
    * Prometheus vertical merge keeps one chosen sample per
    * timestamp). One distributed aggregation: `max_by(value,
    * shard_idx)`, no driver loop, scales with executors.
    */
  def mergeShards(shards: Seq[DataFrame], seriesCols: Seq[String],
      tsCol: String, valueCol: String): DataFrame = {
    val tagged = shards.zipWithIndex.map { case (s, i) =>
      s.withColumn("_shard_idx", lit(i))
    }
    val all = tagged.reduce(_ unionByName _)
    val keys = (seriesCols :+ tsCol).map(col)
    all.groupBy(keys: _*)
      .agg(expr(s"max_by(`$valueCol`, _shard_idx)").as(valueCol))
  }

  /** The reference's block-compaction workflow end to end
    * (convert/merge.go NewMergeChunkSeriesSet driven by
    * convert.go:348): read N already-converted block directories
    * whose series/time ranges may overlap, k-way merge them with
    * last-writer-wins per (series, ts) — later directory in `dirs`
    * wins, the analog of the newer block winning a vertical
    * compaction — and write ONE sorted, time-bucketed output block.
    * Everything is a single distributed plan: N scans → union →
    * one merge shuffle → sorted bucketed write; no driver-side
    * iteration at any scale.
    */
  def mergeBlockDirs(spark: SparkSession, dirs: Seq[String], outPath: String,
      seriesCols: Seq[String], tsCol: String, valueCol: String,
      opts: ConvertOptions): Unit = {
    require(dirs.nonEmpty, "need at least one block directory")
    // When the write layout key (opts.sortBy) is a subset of the merge
    // key (seriesCols), the merge aggregation and the write layout can
    // share ONE exchange (guide §2.4): pre-partition the union on
    // sortBy — hash partitioning on a subset of the grouping key
    // satisfies the aggregation's clustered distribution, so no
    // agg-induced exchange — and the agg output lands already arranged
    // for the bucketed write. The old shape moved every merged byte
    // across the network twice (merge-agg exchange + convert's
    // repartition). The trade: partial aggregation no longer reduces
    // rows before the exchange — bounded here, because the LWW merge
    // collapses at most |dirs| rows per key (the overlap factor),
    // never an unbounded group.
    val fused = opts.shards > 0 && opts.sortBy.nonEmpty &&
      opts.sortBy.toSet.subsetOf(seriesCols.toSet)
    if (fused) {
      val tagged = dirs.zipWithIndex.map { case (d, i) =>
        spark.read.parquet(d).withColumn("_shard_idx", lit(i))
      }
      val keys = (seriesCols :+ tsCol).map(col)
      val merged = tagged.reduce(_ unionByName _)
        .repartition(opts.shards, opts.sortBy.map(col): _*)
        .groupBy(keys: _*)
        .agg(expr(s"max_by(`$valueCol`, _shard_idx)").as(valueCol))
        .withColumn("bucket", bucketCol(tsCol, opts.colDuration))
      writeArranged(merged, outPath, tsCol, opts)
    } else {
      val merged = mergeShards(dirs.map(spark.read.parquet(_)),
        seriesCols, tsCol, valueCol)
      convert(merged, outPath, tsCol, opts)
    }
  }
}
