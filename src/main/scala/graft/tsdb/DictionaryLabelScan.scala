package graft.tsdb

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.{DelegatingSeekableInputStream, InputFile, SeekableInputStream}
import org.apache.parquet.schema.LogicalTypeAnnotation
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
  * Two distributed passes, both metadata-sized: a FOOTER-ONLY
  * planning pass classifies every file (dictionary-complete vs
  * needs-data-scan) from its EncodingStats — the bounded file lists
  * come back to the driver, the same bounded-listing convention as
  * the block stores — then the answer frame lazily reads dictionary
  * pages of the good files and data-scans the rest. Per good file
  * the IO is footer + one dictionary page per row group, asserted
  * ≪ column size by [[dictionaryScanBytes]] and its spec.
  *
  * EXACTNESS: a dictionary is only the complete value set while
  * every data page of the chunk is dictionary-encoded; parquet
  * writers FALL BACK to plain encoding when a dictionary overflows.
  * Fallback files (or pages predating encoding stats) are detected
  * from the footer and routed to a normal Spark distinct-scan —
  * results never change, only bytes do (the same silent-fallback
  * convention as every other routing layer here). Columns whose
  * LOGICAL type is not string/plain-numeric (DATE, TIMESTAMP,
  * DECIMAL, unsigned ints…) also fall back: the raw path's
  * cast-to-string formats them, while a dictionary decode would
  * surface physical representations (days-since-epoch, unscaled
  * ints) — silently different strings.
  */
object DictionaryLabelScan {

  /** Distinct values of `column` across every parquet file under
    * `dir` (recursive), as sorted strings — ≡
    * `TsdbQueryable.labelValues(column)` on the same data.
    */
  def labelValues(spark: SparkSession, dir: String, column: String,
      limit: Int = 0): DataFrame = {
    import spark.implicits._
    val (goodFiles, fallbackFiles) = planScan(spark, dir, column)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dictValues =
      if (goodFiles.isEmpty) spark.emptyDataset[String].toDF("label_value")
      else spark.sparkContext
        .parallelize(goodFiles, tasksFor(spark, goodFiles.size))
        .mapPartitions(_.flatMap(p => fileDictionaryValues(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p),
            conf.value), column).getOrElse(
          // the planning pass vouched for this file; a concurrent
          // rewrite between passes must fail loudly, not lose values
          throw new IllegalStateException(
            s"$p lost dictionary completeness between planning and read"))))
        .toDF("label_value")
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
    * page is ever read. Columns map through `nameOf` (identity for a
    * raw layout; strip the `l_` prefix for wide/shard layouts via
    * [[graft.tsdb.shard.ParquetShardSchema.extractLabelFromColumn]]).
    * One distributed footer pass; the name set is metadata-sized.
    */
  def labelNames(spark: SparkSession, dir: String,
      nameOf: String => Option[String] = Some(_)): Seq[String] = {
    val files = listParquetFiles(spark, dir)
    if (files.isEmpty) return Nil
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // per (file, column): PROVEN present (some chunk's stats show a
    // non-null value), proven absent (every chunk all-null), or
    // UNKNOWN (stats missing/unset in some chunk and not proven
    // elsewhere). Unknown columns fall back to a bounded data probe —
    // the same silent-fallback convention as [[labelValues]]; stats-
    // less foreign files must not report all-null labels the raw
    // scan would exclude.
    val statuses = spark.sparkContext
      .parallelize(files, tasksFor(spark, files.size))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf.value))
          try {
            val footer = r.getFooter
            footer.getFileMetaData.getSchema.getFields.asScala.toList
              .map(_.getName).map { c =>
                val chunks = footer.getBlocks.asScala
                  .flatMap(_.getColumns.asScala)
                  .filter(_.getPath.toDotString == c)
                val proven = chunks.exists(cc =>
                  cc.getStatistics != null &&
                    cc.getStatistics.isNumNullsSet &&
                    cc.getStatistics.getNumNulls < cc.getValueCount)
                val unknown = !proven && chunks.exists(cc =>
                  cc.getStatistics == null ||
                    !cc.getStatistics.isNumNullsSet)
                (c, if (proven) 2 else if (unknown) 1 else 0, p)
              }
          } finally r.close()
        }
      }.collect().toSeq
    val proven = statuses.collect { case (c, 2, _) => c }.toSet
    val unknownByFile = statuses
      .collect { case (c, 1, p) if !proven(c) => (p, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    // only stats-less foreign files reach here (graft's writer always
    // records null counts). ONE batched job over all of them
    // (mergeSchema unions their schemas): a column is present iff any
    // such file holds a non-null value — per-file scoping added
    // nothing (a file where the column is absent, or proven all-null
    // by stats, contributes zero to the count) and cost O(files)
    // sequential driver-blocking Spark jobs.
    val probed: Set[String] = if (unknownByFile.isEmpty) Set.empty else {
      val paths = unknownByFile.keys.toSeq
      val cols = unknownByFile.values.flatten.toSeq.distinct
      val row = spark.read.option("mergeSchema", "true").parquet(paths: _*)
        .agg(count(lit(1)),
          cols.map(c => count(col(s"`$c`")).as(c)): _*)
        .head()
      cols.zipWithIndex.collect {
        case (c, i) if row.getLong(i + 1) > 0 => c
      }.toSet
    }
    (proven ++ probed).toSeq.flatMap(nameOf(_)).distinct.sorted
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

  /** The footer-only planning pass: (dictionary-complete files,
    * data-scan files). Distributed; only the bounded path lists come
    * back to the driver.
    */
  private def planScan(spark: SparkSession, dir: String,
      column: String): (Seq[String], Seq[String]) = {
    val files = listParquetFiles(spark, dir)
    if (files.isEmpty) return (Nil, Nil)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val classified = spark.sparkContext
      .parallelize(files, tasksFor(spark, files.size))
      .map { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf.value))
        try (p, dictionaryComplete(r, column)) finally r.close()
      }.collect()
    // files without the column contribute nothing: drop them entirely
    (classified.collect { case (p, Some(true)) => p }.toSeq,
      classified.collect { case (p, Some(false)) => p }.toSeq)
  }

  private def tasksFor(spark: SparkSession, n: Int): Int =
    math.max(1, math.min(n, spark.sparkContext.defaultParallelism))

  /** Some(true) = the dictionary IS the complete value set;
    * Some(false) = needs a data scan; None = no such column / no
    * values here.
    */
  private def dictionaryComplete(reader: ParquetFileReader,
      column: String): Option[Boolean] = {
    val footer = reader.getFooter
    val schema = footer.getFileMetaData.getSchema
    if (!schema.getFields.asScala.exists(_.getName == column)) return None
    val desc = schema.getColumnDescription(Array(column))
    if (!decodableLogicalType(desc.getPrimitiveType)) return Some(false)
    var any = false
    footer.getBlocks.asScala.foreach { block =>
      val ccmd = block.getColumns.asScala
        .find(_.getPath.toDotString == column)
        .getOrElse(return Some(false))
      val allNull = ccmd.getStatistics != null &&
        ccmd.getStatistics.isNumNullsSet &&
        ccmd.getStatistics.getNumNulls == ccmd.getValueCount
      if (!allNull) {
        any = true
        val st = ccmd.getEncodingStats
        if (st == null || st.hasNonDictionaryEncodedPages)
          return Some(false) // plain fallback: dictionary incomplete
      }
    }
    if (any) Some(true) else None
  }

  /** Only types whose dictionary decode prints the SAME string the
    * raw path's cast-to-string would: plain strings and plain signed
    * numerics. DATE/TIMESTAMP/DECIMAL/enum/unsigned carry logical
    * types the cast FORMATS — those files data-scan instead.
    */
  private def decodableLogicalType(
      t: org.apache.parquet.schema.PrimitiveType): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val ann = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case BINARY =>
        ann == null ||
          ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case INT32 | INT64 =>
        ann == null || (ann match {
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
          case _ => false
        })
      case DOUBLE | FLOAT => ann == null
      case _ => false // BOOLEAN/INT96/FLBA: no faithful dictionary path
    }
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
    * None when the planning predicate ([[dictionaryComplete]]) does
    * not hold for this file. A file without the column (or with
    * only-null chunks) contributes no values.
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
      if (!decodableLogicalType(desc.getPrimitiveType)) return None
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
              case BINARY => dict.decodeToBinary(i).toStringUsingUTF8
              case INT64 => dict.decodeToLong(i).toString
              case INT32 => dict.decodeToInt(i).toString
              case DOUBLE => dict.decodeToDouble(i).toString
              case FLOAT => dict.decodeToFloat(i).toString
              case _ => return None
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
