package graft.tsdb.shard

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** The reference's PHYSICAL shard schema — the on-disk contract a
  * parquet-common reader opens day one (schema/schema.go:27-36,
  * schema/schema_builder.go:41-171, storage/parquet_shard.go):
  *
  *   - a shard is TWO row-aligned parquet files under one block dir:
  *     `<shard>.labels.parquet` (per series: one OPTIONAL string
  *     column `l_<name>` per label, `s_col_indexes` — a varint-coded
  *     list of which label columns this series populates — and
  *     `s_series_hash`, 8 big-endian bytes of the Prometheus
  *     StableHash) and `<shard>.chunks.parquet` (one REQUIRED binary
  *     column `s_data_<i>` per colDuration window, holding that
  *     window's re-encoded chunk frames; empty bytes when the series
  *     has no samples there). Row j of the labels file IS series j
  *     of the chunks file (convert/reader.go:104-152).
  *   - both footers carry the same key-value metadata:
  *     `data_col_duration_ms`, `minT`, `maxT` (schema_builder.go:
  *     44-49; attached to every projection file, writer.go:85-87).
  *   - column ORDER is alphabetical by full column name — the
  *     reference builds its schema from a parquet-go Group (a map
  *     whose fields serialize sorted), so `l_*` precede every `s_*`
  *     and `s_data_10` precedes `s_data_2`. The indices stored in
  *     `s_col_indexes` are leaf positions in THAT order, which is
  *     why they are reproducible here without parquet-go.
  *
  * Parquet is self-describing, so everything above is checkable and
  * writable from the JVM; two declared divergences, both
  * reader-transparent: column ENCODINGS (the reference requests
  * RLE_DICTIONARY / DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY;
  * parquet-java picks dictionary-with-fallback — any conformant
  * reader decodes either) and the optional per-row-group
  * SORTING-COLUMNS metadata hint (convert.go buildSortingColumns;
  * parquet-java 1.16's ParquetWriter API does not expose it — the
  * rows ARE sorted identically, only the footer hint is absent; the
  * reference reads it purely as a constraint-ORDERING performance
  * hint, search/constraint.go:123 sortConstraintsBySortingColumns,
  * so absence can reorder its matcher evaluation, never results).
  */
object ParquetShardSchema {

  val LabelColumnPrefix = "l_"
  val DataColumnPrefix = "s_data_"
  val ColIndexesColumn = "s_col_indexes"
  val SeriesHashColumn = "s_series_hash"

  val DataColSizeMd = "data_col_duration_ms"
  val MinTMd = "minT"
  val MaxTMd = "maxT"
  // graft extension (absent from reference-written shards): bitmask of
  // the chunkenc families the writer encoded (1 << enc ordinal), so a
  // compaction's single-family guard is a footer read instead of a
  // full data scan of every input cell
  val FamilyMaskMd = "graft_chunkenc_family_mask"

  def labelToColumn(label: String): String = LabelColumnPrefix + label

  def extractLabelFromColumn(col: String): Option[String] =
    if (col.startsWith(LabelColumnPrefix))
      Some(col.substring(LabelColumnPrefix.length))
    else None

  def dataColumn(i: Int): String = DataColumnPrefix + i

  def isDataColumn(col: String): Boolean = col.startsWith(DataColumnPrefix)

  /** Number of data columns for [mint, maxt] at `durationMs` grain —
    * the builder's `for i := mint; i <= maxt; i += duration` loop
    * (schema_builder.go:113-116): maxt is INCLUSIVE, so a range
    * ending exactly on a window edge still opens that window.
    */
  def numDataCols(mintMs: Long, maxtMs: Long, durationMs: Long): Int = {
    require(durationMs > 0, s"colDuration must be positive, got $durationMs")
    require(maxtMs >= mintMs, s"empty time range [$mintMs, $maxtMs]")
    val n = (maxtMs - mintMs) / durationMs + 1
    require(n <= Int.MaxValue,
      s"$n data columns of $durationMs ms do not fit an Int — widen " +
        "colDuration or convert per block")
    n.toInt
  }

  /** Data-column index of timestamp `t` (schema_builder.go:154-160:
    * clamps below-mint to column 0). */
  def dataColumnIdx(tMs: Long, mintMs: Long, durationMs: Long): Int =
    if (tMs < mintMs) 0 else ((tMs - mintMs) / durationMs).toInt

  /** Labels-file column names in the reference's (alphabetical)
    * physical order. */
  def labelsFileColumns(labelNames: Seq[String]): Seq[String] =
    (labelNames.map(labelToColumn) ++
      Seq(ColIndexesColumn, SeriesHashColumn)).sorted

  /** Chunks-file column names in the reference's (alphabetical)
    * physical order — NOTE `s_data_10` < `s_data_2` under string
    * sort, faithfully reproduced. */
  def chunksFileColumns(numCols: Int): Seq[String] =
    (0 until numCols).map(dataColumn).sorted

  /** Leaf index of each label column in the COMBINED tsdb schema
    * (labels + data columns, alphabetical): because every `l_*` sorts
    * before every `s_*`, a label's combined-schema index is simply
    * its position among the sorted label column names — these are
    * the values `s_col_indexes` stores (convert/reader.go:125-133).
    */
  def labelColumnIndexes(labelNames: Seq[String]): Map[String, Int] =
    labelNames.map(labelToColumn).sorted.zipWithIndex.map {
      case (c, i) => extractLabelFromColumn(c).get -> i
    }.toMap

  // ---------------------------------------------------------------
  // s_col_indexes codec (schema/encoder.go:327 EncodeIntSlice /
  // :345 DecodeUintSlice): SIGNED zigzag varints — count first,
  // then the sorted values.
  // ---------------------------------------------------------------

  private def putVarint(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    // Go's binary.PutVarint: zigzag then uvarint
    var x = (v << 1) ^ (v >> 63)
    while (java.lang.Long.compareUnsigned(x, 0x80L) >= 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write((x & 0x7f).toInt)
  }

  private def readVarint(b: Array[Byte], pos: Array[Int]): Long = {
    var x = 0L
    var shift = 0
    var p = pos(0)
    var cur = b(p); p += 1
    while ((cur & 0x80) != 0) {
      x |= (cur & 0x7fL) << shift
      shift += 7
      cur = b(p); p += 1
    }
    pos(0) = p
    x |= (cur & 0x7fL) << shift
    (x >>> 1) ^ -(x & 1) // un-zigzag
  }

  def encodeIntSlice(s: Seq[Int]): Array[Byte] = {
    val sorted = s.sorted
    val out = new java.io.ByteArrayOutputStream()
    putVarint(out, sorted.length.toLong)
    sorted.foreach(v => putVarint(out, v.toLong))
    out.toByteArray
  }

  def decodeIntSlice(b: Array[Byte]): Seq[Int] = {
    val pos = Array(0)
    val n = readVarint(b, pos)
    (0L until n).map(_ => readVarint(b, pos).toInt)
  }

  // ---------------------------------------------------------------
  // series hash — Prometheus labels.StableHash: standard xxHash64
  // (seed 0) over `name 0xff value 0xff` per label in NAME order,
  // stored as 8 big-endian bytes (convert/reader.go:135-140).
  // Spark's XXH64 is the same published algorithm, so the hash a
  // parquet-common reader computes for shard routing matches.
  // ---------------------------------------------------------------

  def stableHash(labels: Seq[(String, String)]): Long = {
    val out = new java.io.ByteArrayOutputStream()
    labels.sortBy(_._1).foreach { case (n, v) =>
      out.write(n.getBytes("UTF-8")); out.write(0xff)
      out.write(v.getBytes("UTF-8")); out.write(0xff)
    }
    val b = out.toByteArray
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0L)
  }

  def seriesHashBytes(labels: Seq[(String, String)]): Array[Byte] = {
    val h = stableHash(labels)
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (h >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }
}
