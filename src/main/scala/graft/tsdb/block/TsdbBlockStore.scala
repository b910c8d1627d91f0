package graft.tsdb.block

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.Matcher
import TsdbBlockFormat._

/** One decoded block sample: full label set, timestamp (ms), value. */
final case class TsdbSample(labels: Map[String, String], ts: Long,
    value: Double)

/** Distributed reader/writer for byte-level Prometheus TSDB blocks
  * ([[TsdbBlockFormat]]) — the ingestion seam the reference reaches
  * through `tsdb.OpenBlock` + `NewBlockChunkSeriesSet`
  * (convert/convert.go:348,500): a user migrating from the
  * reference points [[read]] at a Prometheus data directory and
  * gets the same DataFrame shape every graft converter accepts.
  *
  * Scale design (the 100 TB story):
  *   - The BLOCK is the parallel unit — a Prometheus data dir at
  *     scale is thousands of 2h/24h blocks, far more than executor
  *     slots, so one task per (block, shard) saturates a cluster
  *     without any shuffle: reading is a pure narrow scan.
  *   - Within a block, `shardsPerBlock` splits the sorted postings
  *     list round-robin so a giant block parallelizes too; each
  *     shard re-reads only the (small) index, never another shard's
  *     chunk bytes — chunk segments are read lazily per referenced
  *     segment.
  *   - Matchers prune at the INDEX level before any chunk I/O:
  *     equality → its postings list, regex → the label-value list
  *     filtered then union'd, intersected across matchers
  *     (mirroring the reference's PostingsForMatchers path), then
  *     re-verified against the decoded labels so negations and
  *     regex subtleties stay exact.
  *   - Writing streams: rows arrive sorted by (block, labels, ts),
  *     chunks flush every `samplesPerChunk` samples, and only the
  *     index metadata (series entries + postings) is held in memory
  *     per block — the Prometheus compactor's own memory profile.
  *     Blocks build under a hidden temp name and RENAME into place,
  *     so a concurrent reader never sees a partial block.
  *
  * I/O goes through java.nio against the block path visible on the
  * task's host — local disks under local[*]; at cluster scale the
  * same paths point at a shared/POSIX mount (the deployment the
  * reference documents for its own converter input).
  */
object TsdbBlockStore {

  /** Prometheus tsdb.DefaultSamplesPerChunk. */
  final val DefaultSamplesPerChunk = 120

  // ---------------------------------------------------------------
  // write
  // ---------------------------------------------------------------

  /** Write `df` (label columns + a millisecond timestamp column + a
    * double value column) as TSDB blocks of `blockDurationMs` under
    * `root`, one block per time window. Returns the created block
    * dir names (ULIDs), sorted.
    */
  def write(df: DataFrame, root: String, labelCols: Seq[String],
      tsCol: String, valueCol: String,
      blockDurationMs: Long = 2 * 3600 * 1000L,
      samplesPerChunk: Int = DefaultSamplesPerChunk,
      segmentBytes: Long = DefaultSegmentBytes): Seq[String] = {
    require(labelCols.nonEmpty, "at least one label column required")
    require(blockDurationMs > 0, "blockDurationMs must be positive")
    // Prometheus orders series lexicographically by label NAME then
    // value; with one shared name set, sorting rows by the
    // name-sorted columns yields exactly that order
    val sortedLabels = labelCols.sorted
    val prepared = df
      .select((labelCols.map(c => col(c).cast("string").as(c)) :+
        col(tsCol).cast("long").as("_ts") :+
        col(valueCol).cast("double").as("_v")): _*)
      .withColumn("_blk", floor(col("_ts") / blockDurationMs))
      .repartition(col("_blk"))
      // _v closes the sort to a total order: without it, samples
      // tied on (series, ts) arrive in shuffle-fetch order, the
      // content hash folds them in that order, and a redelivered
      // batch could mint a DIFFERENT ULID for identical data —
      // breaking the idempotency the streaming sink relies on
      .sortWithinPartitions(
        (col("_blk") +: sortedLabels.map(col) :+ col("_ts") :+ col("_v")): _*)
    val labelArr = sortedLabels.toArray
    // resolve ordinals OUTSIDE the closure: capturing `prepared`
    // itself would serialize the whole plan into every task
    val schema = prepared.schema
    val labelIdx = labelArr.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex("_ts")
    val vIdx = schema.fieldIndex("_v")
    val blkIdx = schema.fieldIndex("_blk")
    val dirs = prepared.queryExecution.toRdd.mapPartitions { rows =>
      import org.apache.spark.unsafe.types.UTF8String
      // operate on InternalRow, and materialize label Strings only
      // when the series CHANGES (rows arrive series-sorted, so a new
      // allocation every ~chunk, not every sample): the cached
      // UTF8Strings are cloned because unsafe rows reuse buffers.
      // Passing the SAME String array while the series is unchanged
      // also lets BlockBuilder's Arrays.equals short-circuit on
      // reference equality.
      val out = Seq.newBuilder[String]
      val b = new BlockBuilder(root, labelArr, blockDurationMs,
        samplesPerChunk, segmentBytes)
      val n = labelIdx.length
      var curU: Array[UTF8String] = null
      var curS: Array[String] = null
      rows.foreach { r =>
        var same = curU != null
        var i = 0
        while (same && i < n) {
          val u = if (r.isNullAt(labelIdx(i))) null
            else r.getUTF8String(labelIdx(i))
          val c = curU(i)
          same = if (u == null) c == null else c != null && u.equals(c)
          i += 1
        }
        if (!same) {
          curU = new Array[UTF8String](n)
          curS = new Array[String](n)
          var j = 0
          while (j < n) {
            val u = if (r.isNullAt(labelIdx(j))) null
              else r.getUTF8String(labelIdx(j))
            curU(j) = if (u == null) null else u.clone()
            curS(j) = if (u == null) "" else u.toString
            j += 1
          }
        }
        b.add(r.getLong(blkIdx), curS, r.getLong(tsIdx),
          r.getDouble(vIdx)).foreach(out += _)
      }
      b.finish().foreach(out += _)
      out.result().iterator
    }.collect().toSeq.sorted
    dirs
  }

  /** Streaming per-partition block builder: rows must arrive sorted
    * by (block, labels, ts). Holds one open chunk buffer plus the
    * current block's index metadata. */
  private final class BlockBuilder(root: String, labelNames: Array[String],
      blockDurationMs: Long, samplesPerChunk: Int, segmentBytes: Long) {
    private var curBlk = Long.MinValue
    private var tmpDir: java.io.File = null
    private var segs: ChunkSegmentWriter = null
    private val series = Seq.newBuilder[SeriesEntry]
    private var nSeries = 0L
    private var nSamples = 0L
    private var nChunks = 0L
    private var contentHash = 0xcbf29ce484222325L

    private var curLabels: Array[String] = null
    private val chunkMetas = Seq.newBuilder[ChunkMeta]
    private val tsBuf = new Array[Long](samplesPerChunk)
    private val vBuf = new Array[Double](samplesPerChunk)
    private var bufLen = 0

    private def mix(x: Long): Unit = {
      contentHash ^= x
      contentHash *= 0x100000001b3L
    }

    private def flushChunk(): Unit = if (bufLen > 0) {
      val data = encodeXorChunk(
        java.util.Arrays.copyOf(tsBuf, bufLen),
        java.util.Arrays.copyOf(vBuf, bufLen))
      val ref = segs.append(data)
      chunkMetas += ChunkMeta(tsBuf(0), tsBuf(bufLen - 1), ref)
      nChunks += 1
      bufLen = 0
    }

    private def flushSeries(): Unit = if (curLabels != null) {
      flushChunk()
      series += SeriesEntry(
        labelNames.zip(curLabels).toSeq.filter(_._2.nonEmpty),
        chunkMetas.result())
      chunkMetas.clear()
      nSeries += 1
      curLabels = null
    }

    private def flushBlock(): Option[String] = {
      if (tmpDir == null) return None
      flushSeries()
      segs.close()
      val entries = series.result()
      series.clear()
      val mint = curBlk * blockDurationMs
      val maxt = (curBlk + 1) * blockDurationMs
      val ulid = deterministicUlid(maxt, contentHash)
      java.nio.file.Files.write(
        new java.io.File(tmpDir, "index").toPath, encodeIndex(entries))
      writeMeta(tmpDir, ulid, mint, maxt, nSeries, nSamples, nChunks)
      writeEmptyTombstones(tmpDir)
      val target = new java.io.File(root, ulid)
      val created =
        if (target.exists()) { deleteRecursively(tmpDir); false }
        else tmpDir.renameTo(target)
      tmpDir = null
      nSeries = 0; nSamples = 0; nChunks = 0
      contentHash = 0xcbf29ce484222325L
      if (created) Some(ulid) else None
    }

    /** Add one sample; returns a completed block's ULID when this
      * sample rolls into a new block. */
    def add(blk: Long, labels: Array[String], ts: Long,
        v: Double): Option[String] = {
      var done: Option[String] = None
      if (blk != curBlk) {
        done = flushBlock()
        curBlk = blk
        val rootDir = new java.io.File(root)
        require(rootDir.isDirectory || rootDir.mkdirs(),
          s"cannot create $root")
        val pid = org.apache.spark.TaskContext.getPartitionId()
        tmpDir = new java.io.File(root, s".building-p$pid-$blk")
        if (tmpDir.exists()) deleteRecursively(tmpDir)
        require(tmpDir.mkdirs(), s"cannot create $tmpDir")
        segs = new ChunkSegmentWriter(
          new java.io.File(tmpDir, "chunks"), segmentBytes)
      } else if (curLabels != null &&
          !java.util.Arrays.equals(
            curLabels.asInstanceOf[Array[AnyRef]],
            labels.asInstanceOf[Array[AnyRef]])) {
        flushSeries()
      }
      if (curLabels == null) {
        curLabels = labels
        labels.foreach(s => mix(s.hashCode.toLong))
      }
      if (bufLen == samplesPerChunk) flushChunk()
      tsBuf(bufLen) = ts
      vBuf(bufLen) = v
      bufLen += 1
      nSamples += 1
      mix(ts)
      mix(java.lang.Double.doubleToRawLongBits(v))
      done
    }

    def finish(): Option[String] = flushBlock()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  // ---------------------------------------------------------------
  // read
  // ---------------------------------------------------------------

  /** Past this many blocks the meta.json overlap filter runs as a
    * Spark job instead of a sequential driver loop. */
  private final val DriverMetaScanCap = 256

  /** All block dirs under `root` whose [minTime, maxTime) overlaps
    * [mint, maxt] — pruned on meta.json alone, before any index or
    * chunk byte is read. The directory listing itself is one driver
    * syscall; the per-block meta READS distribute once the data dir
    * is large (a year of 2h blocks is ~4 400 dirs — a sequential
    * driver loop over shared storage would dominate query setup). */
  private def overlappingBlocks(spark: SparkSession, root: String,
      mint: Long, maxt: Long): Seq[String] = {
    val rootDir = new java.io.File(root)
    // '.'-prefixed names are in-flight '.building-*' temp dirs (or a
    // crashed writer's leftovers): never readable blocks — a partial
    // dir can carry a valid meta.json before its rename
    val dirs = Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !d.getName.startsWith(".") &&
        new java.io.File(d, "meta.json").isFile)
      .map(_.getName).sorted.toSeq
    def overlaps(name: String): Boolean = {
      val (bMin, bMax) = readMetaTimes(new java.io.File(root, name))
      bMin <= maxt && bMax > mint
    }
    if (dirs.size <= DriverMetaScanCap) dirs.filter(overlaps)
    else spark.sparkContext
      .parallelize(dirs, math.max(1, dirs.size / 64))
      .filter(overlaps).collect().sorted.toSeq
  }

  /** Read every sample matching `matchers` in [mint, maxt] from the
    * TSDB blocks under `root`, as a Dataset of [[TsdbSample]].
    * One narrow task per (block, shard); no shuffle. */
  def read(spark: SparkSession, root: String,
      mint: Long = Long.MinValue, maxt: Long = Long.MaxValue,
      matchers: Seq[Matcher] = Nil,
      shardsPerBlock: Int = 1): Dataset[TsdbSample] = {
    import spark.implicits._
    require(shardsPerBlock > 0, "shardsPerBlock must be positive")
    val blocks = overlappingBlocks(spark, root, mint, maxt)
    val tasks = for (b <- blocks; s <- 0 until shardsPerBlock)
      yield (b, s)
    val matcherSpecs = matchers.map(encodeMatcher)
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(tasks.size, 1))
      .flatMap { case (block, shard) =>
        readBlockShard(new java.io.File(root, block), mint, maxt,
          matcherSpecs.map(decodeMatcher), shard, shardsPerBlock)
      }
    spark.createDataset(rdd)
  }

  /** [[read]] flattened to one string column per label in
    * `labelCols` (absent label → ""), ready for the converters.
    * Projection happens INSIDE the block reader: one string array
    * per series (not a Map per row through the encoder), because at
    * 100 TB per-sample Map construction + Map serialization is pure
    * allocation overhead the flattened schema never needed. */
  def readLabels(spark: SparkSession, root: String,
      labelCols: Seq[String], mint: Long = Long.MinValue,
      maxt: Long = Long.MaxValue, matchers: Seq[Matcher] = Nil,
      shardsPerBlock: Int = 1): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(shardsPerBlock > 0, "shardsPerBlock must be positive")
    val blocks = overlappingBlocks(spark, root, mint, maxt)
    val tasks = for (b <- blocks; s <- 0 until shardsPerBlock)
      yield (b, s)
    val matcherSpecs = matchers.map(encodeMatcher)
    val cols = labelCols.toIndexedSeq
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(tasks.size, 1))
      .flatMap { case (block, shard) =>
        readBlockShardFlat(new java.io.File(root, block), mint, maxt,
          matcherSpecs.map(decodeMatcher), shard, shardsPerBlock, cols)
      }
    val schema = StructType(
      cols.map(c => StructField(c, StringType, nullable = false)) :+
        StructField("ts", LongType, nullable = false) :+
        StructField("value", DoubleType, nullable = false))
    spark.createDataFrame(rdd, schema)
  }

  /** The flattened row iterator behind [[readLabels]]: identical
    * pruning/verification to [[readBlockShard]], but each series
    * projects its labels to the requested columns ONCE and emits
    * plain Rows. */
  private def readBlockShardFlat(dir: java.io.File, mint: Long,
      maxt: Long, matchers: Seq[Matcher], shard: Int, nShards: Int,
      cols: IndexedSeq[String]): Iterator[org.apache.spark.sql.Row] = {
    val n = cols.length
    readBlockSeries(dir, mint, maxt, matchers, shard, nShards)
      .flatMap { case (labelMap, samples) =>
        val proj = new Array[Any](n + 2)
        var i = 0
        while (i < n) { proj(i) = labelMap.getOrElse(cols(i), ""); i += 1 }
        samples.map { case (ts, v) =>
          val row = proj.clone()
          row(n) = ts
          row(n + 1) = v
          org.apache.spark.sql.Row.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(row))
        }
      }
  }

  /** Vertical compaction (the Prometheus compactor's overlapping-
    * block merge): read every block under `root`, deduplicate exact
    * (series, ts) collisions — the sample from the lexicographically
    * LAST block ULID wins, the deterministic analog of Prometheus
    * merging its sorted block list — and rewrite as blocks of
    * `blockDurationMs` under `outRoot`. One narrow read fan-in, one
    * shuffle (the LWW groupBy doubles as the writer's
    * repartition-by-window sort input). */
  def compact(spark: SparkSession, root: String, outRoot: String,
      labelCols: Seq[String], blockDurationMs: Long = 2 * 3600 * 1000L,
      shardsPerBlock: Int = 1): Seq[String] = {
    import spark.implicits._
    val blocks = overlappingBlocks(spark, root, Long.MinValue, Long.MaxValue)
    val tasks = for (b <- blocks; s <- 0 until shardsPerBlock)
      yield (b, s)
    val cols = labelCols.toIndexedSeq
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(tasks.size, 1))
      .flatMap { case (block, shard) =>
        readBlockShard(new java.io.File(root, block), Long.MinValue,
            Long.MaxValue, Nil, shard, shardsPerBlock)
          .map(s => (block, cols.map(c => s.labels.getOrElse(c, "")),
            s.ts, s.value))
      }
    val flat = rdd.toDF("_ulid", "_ls", "ts", "value")
      .select((cols.zipWithIndex.map { case (c, i) =>
        col("_ls")(i).as(c) } :+ col("_ulid") :+ col("ts") :+
        col("value")): _*)
    // (_ulid, value) as the max_by key: duplicate (series, ts)
    // samples WITHIN one block tie on _ulid alone and max_by would
    // pick arbitrarily — the value tiebreak keeps compaction
    // deterministic end to end
    val lww = flat
      .groupBy((cols.map(col) :+ col("ts")): _*)
      .agg(max_by(col("value"),
        struct(col("_ulid"), col("value"))).as("value"))
    write(lww, outRoot, labelCols, "ts", "value", blockDurationMs)
  }

  // Matcher is not Serializable-friendly across the closure (it
  // carries Catalyst Columns); ship the constructor fields instead.
  private def encodeMatcher(m: Matcher): (String, String, String) = m match {
    case Matcher.Eq(l, v)  => ("eq", l, v)
    case Matcher.Neq(l, v) => ("neq", l, v)
    case Matcher.Re(l, p)  => ("re", l, p)
    case Matcher.Nre(l, p) => ("nre", l, p)
  }

  private def decodeMatcher(t: (String, String, String)): Matcher = t match {
    case ("eq", l, v)  => Matcher.Eq(l, v)
    case ("neq", l, v) => Matcher.Neq(l, v)
    case ("re", l, p)  => Matcher.Re(l, p)
    case ("nre", l, p) => Matcher.Nre(l, p)
    case (k, _, _)     => throw new IllegalStateException(s"matcher kind $k")
  }

  /** Anchored RE2-compatible value match (absent label == ""). */
  private def valueMatches(m: Matcher, v: String): Boolean = m match {
    case Matcher.Eq(_, x)  => v == x
    case Matcher.Neq(_, x) => v != x
    case Matcher.Re(_, p)  => anchored(p).matcher(v).matches()
    case Matcher.Nre(_, p) => !anchored(p).matcher(v).matches()
  }

  private val reCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def anchored(p: String): java.util.regex.Pattern =
    reCache.computeIfAbsent(p, p0 =>
      java.util.regex.Pattern.compile("\\A(?:" + Matcher.re2ToJava(p0) + ")\\z"))

  /** Resolve the candidate series refs for the POSITIVE matchers via
    * the postings index — equality uses its postings list directly,
    * regex unions the postings of index-listed values that match —
    * then intersect. Negative matchers can't prune (they match the
    * open-ended complement); they apply in the per-series check. */
  private def candidateRefs(ir: IndexReader,
      matchers: Seq[Matcher]): Seq[Long] = {
    // a matcher can prune via the index ONLY if it cannot match the
    // absent label (== ""): a series lacking the label appears in NO
    // postings list for it, so a regex like "a*" or "east|" that
    // matches "" must fall through to the per-series exact re-check
    val positive = matchers.collect {
      case Matcher.Eq(l, v) if v.nonEmpty =>
        ir.postings(l, v)
      case m @ Matcher.Re(l, p) if !valueMatches(m, "") =>
        ir.labelValues(l).filter(v => valueMatches(m, v))
          .flatMap(v => ir.postings(l, v)).distinct.sorted
    }
    if (positive.isEmpty) ir.allPostings
    else positive.reduce((a, b) => intersectSorted(a, b))
  }

  private def intersectSorted(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var i = 0
    var j = 0
    val av = a.toIndexedSeq
    val bv = b.toIndexedSeq
    while (i < av.length && j < bv.length) {
      val c = java.lang.Long.compare(av(i), bv(j))
      if (c == 0) { out += av(i); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    out.result()
  }

  private def readBlockShard(dir: java.io.File, mint: Long, maxt: Long,
      matchers: Seq[Matcher], shard: Int,
      nShards: Int): Iterator[TsdbSample] =
    readBlockSeries(dir, mint, maxt, matchers, shard, nShards)
      .flatMap { case (labelMap, samples) =>
        samples.map { case (ts, v) => TsdbSample(labelMap, ts, v) }
      }

  /** Shared per-shard series walk: candidate refs from the postings
    * index, exact matcher re-verification, chunk-frame time pruning,
    * tombstone application. Emits one (label map, sample iterator)
    * pair per surviving series so callers project labels ONCE per
    * series, not per sample. */
  private def readBlockSeries(dir: java.io.File, mint: Long, maxt: Long,
      matchers: Seq[Matcher], shard: Int, nShards: Int)
      : Iterator[(Map[String, String], Iterator[(Long, Double)])] = {
    val ir = new IndexReader(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "index").toPath))
    val chunks = new ChunkSegmentReader(new java.io.File(dir, "chunks"))
    val tombstones = readTombstones(dir)
    val refs = candidateRefs(ir, matchers).zipWithIndex
      .collect { case (r, i) if i % nShards == shard => r }
    refs.iterator.flatMap { ref =>
      val se = ir.series(ref)
      val labelMap = se.labels.toMap
      // exact re-check: negations, empty-value equality, regex
      // semantics against the FULL label set (absent == "")
      val ok = matchers.forall(m =>
        valueMatches(m, labelMap.getOrElse(m.label, "")))
      if (!ok) Iterator.empty
      else {
        val deleted = tombstones.getOrElse(ref, Nil)
        val samples = se.chunks.iterator
          .filter(cm => cm.mint <= maxt && cm.maxt >= mint)
          .flatMap { cm =>
            val (enc, data) = chunks.chunk(cm.ref)
            require(enc == EncXOR, s"unsupported chunk encoding $enc")
            val (ts, vs) = decodeXorChunk(data, 0, data.length)
            ts.indices.iterator
              .filter(i => ts(i) >= mint && ts(i) <= maxt &&
                !deleted.exists(d => d._1 <= ts(i) && ts(i) <= d._2))
              .map(i => (ts(i), vs(i)))
          }
        Iterator.single((labelMap, samples))
      }
    }
  }
}
