package graft.tsdb

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.{DelegatingSeekableInputStream, InputFile, SeekableInputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MAINTENANCE-FREE label enumeration from parquet DICTIONARY pages —
  * the reference's `MaterializeAllLabelValues`
  * (search/materialize.go:358): a label column in a converted layout
  * is dictionary-encoded, so its distinct values already sit in one
  * tiny page per column chunk; reading ONLY footers + dictionary
  * pages answers `label_values` on COLD data — any shard as-written,
  * no [[LabelIndexStore]] layer to maintain. The maintained index
  * stays the hot-path shape (one row read per distinct pair, time-
  * bucket pruning); this is the zero-upkeep complement for data
  * nobody indexed.
  *
  * Distribution: the driver lists files (metadata-sized, the same
  * bounded listing the block stores do), then ONE task per file batch
  * opens footers and dictionary pages via parquet-java and emits
  * dictionary entries — bytes read per file ≈ footer + one
  * dictionary page per row group, asserted ≪ column size by
  * [[dictionaryScanBytes]] and its spec.
  *
  * EXACTNESS: a dictionary is only the complete value set while
  * every data page of the chunk is dictionary-encoded; parquet
  * writers FALL BACK to plain encoding when a dictionary overflows.
  * Files where any chunk of the column carries non-dictionary data
  * pages (or pages predating encoding stats) are detected from the
  * footer's EncodingStats and routed to a normal Spark distinct-scan
  * — results never change, only bytes do (the same silent-fallback
  * convention as every other routing layer here).
  */
object DictionaryLabelScan {

  /** Distinct values of `column` across every parquet file under
    * `dir` (recursive), as sorted strings — ≡
    * `TsdbQueryable.labelValues(column)` on the same data.
    */
  def labelValues(spark: SparkSession, dir: String, column: String,
      limit: Int = 0): DataFrame = {
    import spark.implicits._
    val files = listParquetFiles(spark, dir)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val tasks = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    // (isFallbackFile, payload): dictionary entries ride as values;
    // files needing a data scan ride as their path
    val scanned = spark.sparkContext
      .parallelize(files, tasks)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          fileDictionaryValues(
            HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p),
              conf.value), column) match {
            case Some(values) => values.iterator.map((false, _))
            case None => Iterator.single((true, p))
          }
        }
      }.toDF("_fallback", "_s")
    val dictValues = scanned.filter(!col("_fallback"))
      .select(col("_s").as("label_value"))
    // plain-encoded files (dictionary overflow): a bounded file list,
    // scanned the normal way — correctness never depends on routing
    val fallbackFiles = scanned.filter(col("_fallback"))
      .select("_s").as[String].collect()
    val all = if (fallbackFiles.isEmpty) dictValues
      else dictValues.unionByName(
        spark.read.parquet(fallbackFiles.toIndexedSeq: _*)
          .select(col(column).cast("string").as("label_value"))
          .filter(col("label_value").isNotNull))
    val base = all.distinct().orderBy("label_value")
    if (limit > 0) base.limit(limit) else base
  }

  /** Label NAMES with at least one value, from footers alone — the
    * reference's `MaterializeAllLabelNames` shape applied cold: a
    * column exists in a file's self-describing schema, and its
    * chunks' statistics say whether any value is non-null, so no
    * page is ever read. Columns are taken through `nameOf` (identity
    * for a raw layout; strip the `l_` prefix for wide/shard layouts
    * via [[graft.tsdb.shard.ParquetShardSchema.extractLabelFromColumn]]).
    */
  def labelNames(spark: SparkSession, dir: String,
      nameOf: String => Option[String] = Some(_)): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val out = scala.collection.mutable.SortedSet.empty[String]
    listParquetFiles(spark, dir).foreach { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), conf))
      try {
        val footer = r.getFooter
        footer.getFileMetaData.getSchema.getFields.asScala.foreach { f =>
          nameOf(f.getName).foreach { name =>
            val hasValue = footer.getBlocks.asScala.exists { b =>
              b.getColumns.asScala.exists { c =>
                c.getPath.toDotString == f.getName && (
                  c.getStatistics == null ||
                  !c.getStatistics.isNumNullsSet ||
                  c.getStatistics.getNumNulls < c.getValueCount)
              }
            }
            if (hasValue) out += name
          }
        }
      } finally r.close()
    }
    out.toSeq
  }

  /** The IO attestation for the spec: run the same dictionary
    * extraction over every file with a byte-counting stream, and
    * return (bytesRead, totalColumnChunkBytes, fileBytes) — the
    * dictionary path must cost a small fraction of the column.
    */
  def dictionaryScanBytes(spark: SparkSession, dir: String,
      column: String): (Long, Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    var read = 0L
    var columnBytes = 0L
    var fileBytes = 0L
    listParquetFiles(spark, dir).foreach { p =>
      val hif = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), conf)
      val counting = new CountingInputFile(hif)
      fileDictionaryValues(counting, column)
      read += counting.bytesRead
      fileBytes += hif.getLength
      val r = ParquetFileReader.open(hif)
      try {
        r.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala
            .filter(_.getPath.toDotString == column)
            .foreach(c => columnBytes += c.getTotalSize)
        }
      } finally r.close()
    }
    (read, columnBytes, fileBytes)
  }

  private def listParquetFiles(spark: SparkSession,
      dir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith("."))
        out += f.getPath.toString
    }
    out.toSeq.sorted
  }

  /** Dictionary entries of `column` in one file, decoded to strings —
    * None when any chunk's data pages are not guaranteed
    * dictionary-encoded (plain fallback / missing encoding stats), in
    * which case the caller must data-scan this file. A file without
    * the column (or with only-null chunks) contributes no values.
    */
  private[tsdb] def fileDictionaryValues(input: InputFile,
      column: String): Option[Seq[String]] = {
    val reader = ParquetFileReader.open(input)
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      if (!schema.getFields.asScala.exists(_.getName == column))
        return Some(Nil)
      val desc = schema.getColumnDescription(Array(column))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      footer.getBlocks.asScala.foreach { block =>
        val ccmd = block.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(return None)
        val allNull = ccmd.getStatistics != null &&
          ccmd.getStatistics.isNumNullsSet &&
          ccmd.getStatistics.getNumNulls == ccmd.getValueCount
        if (!allNull) {
          val st = ccmd.getEncodingStats
          if (st == null || st.hasNonDictionaryEncodedPages)
            return None // plain fallback: dictionary is incomplete
          // widen to the public interface: parquet-java's concrete
          // DictionaryPageReader class is package-private
          val store: org.apache.parquet.column.page.DictionaryPageReadStore =
            reader.getDictionaryReader(block)
          val page = store.readDictionaryPage(desc)
          if (page == null) return None
          val dict = page.getEncoding.initDictionary(desc, page)
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
          var i = 0
          while (i <= dict.getMaxId) {
            out += (desc.getPrimitiveType.getPrimitiveTypeName match {
              case BINARY | FIXED_LEN_BYTE_ARRAY =>
                dict.decodeToBinary(i).toStringUsingUTF8
              case INT64 => dict.decodeToLong(i).toString
              case INT32 => dict.decodeToInt(i).toString
              case DOUBLE => dict.decodeToDouble(i).toString
              case FLOAT => dict.decodeToFloat(i).toString
              case t => return None // BOOLEAN/INT96: no dictionary path
            })
            i += 1
          }
        }
      }
      Some(out.toSeq)
    } finally reader.close()
  }

  /** InputFile whose streams count every byte read — the spec's
    * evidence that the dictionary path touches footer + dictionary
    * pages only. */
  private class CountingInputFile(delegate: InputFile) extends InputFile {
    private val counter = new java.util.concurrent.atomic.AtomicLong()
    def bytesRead: Long = counter.get()
    override def getLength: Long = delegate.getLength
    override def newStream(): SeekableInputStream = {
      val in = delegate.newStream()
      new DelegatingSeekableInputStream(in) {
        override def getPos: Long = in.getPos
        override def seek(newPos: Long): Unit = in.seek(newPos)
        override def read(): Int = {
          val r = super.read(); if (r >= 0) counter.incrementAndGet(); r
        }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val r = super.read(b, off, len)
          if (r > 0) counter.addAndGet(r.toLong)
          r
        }
        override def read(buf: java.nio.ByteBuffer): Int = {
          val r = super.read(buf)
          if (r > 0) counter.addAndGet(r.toLong)
          r
        }
        override def readFully(b: Array[Byte]): Unit = {
          super.readFully(b); counter.addAndGet(b.length.toLong)
        }
        override def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
          super.readFully(b, off, len); counter.addAndGet(len.toLong)
        }
        override def readFully(buf: java.nio.ByteBuffer): Unit = {
          val n = buf.remaining()
          super.readFully(buf); counter.addAndGet(n.toLong)
        }
      }
    }
  }
}
