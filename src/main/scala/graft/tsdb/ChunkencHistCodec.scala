package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import graft.tsdb.block.{ChunkencHistogram, TsdbBlockStore}
import ChunkencHistogram.{FloatHistChunk, HistChunk}

/** Shard-cell codec whose frame BODIES are REAL Prometheus chunkenc
  * histogram chunks ([[graft.tsdb.block.ChunkencHistogram]] — the
  * published tsdb/docs/format/chunks.md layout), framed exactly like
  * the reference's parquet cells (schema/encoder.go:202-221:
  * uvarint(enc) uvarint(mint) uvarint(maxt) uvarint(len) chunkBytes).
  *
  * This is the byte contract a parquet-common reader actually
  * depends on: its decoder hands every frame body to
  * `chunkenc.FromData(enc, bytes)` (schema/encoder.go Decode +
  * search/materialize.go), so a shard is only interoperable if the
  * bodies parse as chunkenc — [[HistChunkCodec]]'s graft-native body
  * layout frames identically but would NOT. [[ChunkCodec]] (XOR,
  * enc 1) is already bit-exact chunkenc; this codec closes the
  * histogram families (enc 2/3) the same way, NHCB custom-bucket
  * chunks (schema -53, bound list in-chunk) included.
  *
  * Encode mirrors the Prometheus appender's chunk-cut ladder the
  * block writer uses (TsdbBlockStore.writeRows): a counter RESET
  * (zero bucket or any same-index bucket count decreasing, a bucket
  * VANISHING — the appender's test) cuts a chunk and marks the next
  * one CounterReset; a `samplesPerChunk` cap cut marks it
  * NotCounterReset; gauge series carry GaugeType on every chunk and
  * never reset-cut. Within one chunk the samples are re-laid onto
  * the UNION bucket layout with absolute-0 fills — what chunkenc's
  * own recode produces when buckets appear mid-chunk.
  *
  * The chunkenc wire format always carries a tracked sum; a NULL
  * input sum is persisted as NaN (what Prometheus stores when the
  * sum is untracked) and decodes back as NaN, never null.
  *
  * Decode skips non-overlapping frames on the header alone, skips
  * KNOWN foreign-family frames (a reference-written cell may mix
  * XOR and histogram chunks when one series changed sample type —
  * schema/encoder.go keeps per-encoding appenders per column; each
  * family's reader keeps its own, the block readers' convention),
  * and throws loudly on an unknown encoding ordinal. SIGNED
  * histograms (negative buckets) ride the same sample struct
  * (`nidx`/`ncnt`, empty for positive-only series), so everything a
  * reference shard's histogram cells can hold — exponential, signed,
  * NHCB, gauge — decodes here.
  */
object ChunkencHistCodec {

  private val NoNegL: Array[Long] = Array.empty
  private val NoNegD: Array[Double] = Array.empty

  // ---------------------------------------------------------------
  // integer family (EncHistogram, ordinal 2)
  // ---------------------------------------------------------------

  /** samples: sorted array<struct<ts:long, zero:long, idx:array<int>,
    * cnt:array<long>, sum:double?, nidx:array<int>, ncnt:array<long>>>
    * → framed blob of enc=2 chunkenc chunks. `customValues` non-empty
    * iff schema == -53 (NHCB — no negative side allowed). Positive-
    * only series pass empty neg arrays. */
  def encodeArrayData(samples: ArrayData, schema: Int,
      samplesPerChunk: Int, customValues: Array[Double],
      gauge: Boolean): Array[Byte] = {
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    val n = samples.numElements()
    val out = new java.io.ByteArrayOutputStream()
    val tsB = new Array[Long](samplesPerChunk)
    val zeroB = new Array[Long](samplesPerChunk)
    val sumB = new Array[Double](samplesPerChunk)
    val idxB = new Array[Array[Int]](samplesPerChunk)
    val cntB = new Array[Array[Long]](samplesPerChunk)
    val nIdxB = new Array[Array[Int]](samplesPerChunk)
    val nCntB = new Array[Array[Long]](samplesPerChunk)
    var m = 0
    var flags = if (gauge) ChunkencHistogram.GaugeType
      else ChunkencHistogram.UnknownCounterReset

    def flush(): Unit = if (m > 0) {
      val union = TsdbBlockStore.unionIndexes(idxB, m)
      val nUnion = TsdbBlockStore.unionIndexes(nIdxB, m)
      val pos = new Array[Array[Long]](m)
      val neg = new Array[Array[Long]](m)
      val count = new Array[Long](m)
      var i = 0
      while (i < m) {
        val abs = TsdbBlockStore.fillUnion(idxB(i), cntB(i), union)
        val nAbs = if (nUnion.isEmpty) NoNegL
          else TsdbBlockStore.fillUnion(nIdxB(i), nCntB(i), nUnion)
        var total = zeroB(i)
        abs.foreach(total += _)
        nAbs.foreach(total += _)
        pos(i) = abs
        neg(i) = nAbs
        count(i) = total
        i += 1
      }
      val body = ChunkencHistogram.encodeHistChunk(HistChunk(
        flags, schema, 0.0, ChunkencHistogram.spansFromIndexes(union),
        ChunkencHistogram.spansFromIndexes(nUnion),
        java.util.Arrays.copyOf(tsB, m), count,
        java.util.Arrays.copyOf(zeroB, m),
        java.util.Arrays.copyOf(sumB, m), pos, neg, customValues))
      ChunkCodec.putUvarint(out, HistChunkCodec.EncHistogram)
      ChunkCodec.putUvarint(out, tsB(0))
      ChunkCodec.putUvarint(out, tsB(m - 1))
      ChunkCodec.putUvarint(out, body.length.toLong)
      out.write(body, 0, body.length)
      m = 0
    }

    var lastZero = 0L
    var lastTs = Long.MinValue
    var lastIdx: Array[Int] = null
    var lastCnt: Array[Long] = null
    var lastNIdx: Array[Int] = null
    var lastNCnt: Array[Long] = null
    var i = 0
    while (i < n) {
      val r = samples.getStruct(i, 7)
      val ts = r.getLong(0)
      val zero = r.getLong(1)
      val idx = r.getArray(2).toIntArray()
      val cnt = r.getArray(3).toLongArray()
      val nidx = r.getArray(5).toIntArray()
      val ncnt = r.getArray(6).toLongArray()
      TsdbBlockStore.requireAscending(idx)
      TsdbBlockStore.requireAscending(nidx)
      val sum = if (r.isNullAt(4)) Double.NaN else r.getDouble(4)
      require(lastIdx == null || ts >= lastTs,
        "samples must be sorted by timestamp")
      // the appender's cut ladder: reset first (a reset landing on a
      // cap boundary must not be filed as a continuation), then cap
      if (!gauge && lastIdx != null &&
          (zero < lastZero ||
            TsdbBlockStore.sparseDecreased(lastIdx, lastCnt, idx, cnt) ||
            TsdbBlockStore.sparseDecreased(lastNIdx, lastNCnt, nidx, ncnt))) {
        flush()
        flags = ChunkencHistogram.CounterReset
      } else if (m == samplesPerChunk) {
        flush()
        if (!gauge) flags = ChunkencHistogram.NotCounterReset
      }
      tsB(m) = ts; zeroB(m) = zero; sumB(m) = sum
      idxB(m) = idx; cntB(m) = cnt; nIdxB(m) = nidx; nCntB(m) = ncnt
      m += 1
      lastZero = zero; lastTs = ts; lastIdx = idx; lastCnt = cnt
      lastNIdx = nidx; lastNCnt = ncnt
      i += 1
    }
    flush()
    out.toByteArray
  }

  /** blob → array<struct<ts, zero, idx, cnt, sum, schema, cv, nidx,
    * ncnt>> of the enc=2 chunks whose header overlaps [qmint, qmaxt]
    * (inclusive, the reference decoder's filter). idx/cnt (and the
    * negative side) come back on the chunk's UNION layout (absent
    * buckets read absolute 0 — chunkenc's recode semantics); callers
    * drop zero-count buckets when they want the sparse view.
    * `schema` and the NHCB bound list `cv` ride each sample so
    * custom-bucket consumers resolve bounds from the decoded bytes,
    * like the block reader's `custom_values` column. */
  def decodeToArrayData(blob: Array[Byte], qmint: Long,
      qmaxt: Long): ArrayData = {
    val rows = Vector.newBuilder[Any]
    val pos = Array(0)
    while (pos(0) < blob.length) {
      val enc = ChunkCodec.readUvarint(blob, pos)
      val mint = ChunkCodec.readUvarint(blob, pos)
      val maxt = ChunkCodec.readUvarint(blob, pos)
      val size = ChunkCodec.readUvarint(blob, pos).toInt
      val bodyStart = pos(0)
      pos(0) = bodyStart + size
      if (enc == HistChunkCodec.EncHistogram) {
        if (mint <= qmaxt && maxt >= qmint) {
          val c = ChunkencHistogram.decodeHistChunk(blob, bodyStart, size)
          val union = ChunkencHistogram.bucketIndexes(c.posSpans)
          val nUnion = ChunkencHistogram.bucketIndexes(c.negSpans)
          val cv = new GenericArrayData(c.customValues)
          val nIdxArr = new GenericArrayData(nUnion)
          var i = 0
          while (i < c.ts.length) {
            rows += InternalRow(c.ts(i), c.zeroCount(i),
              new GenericArrayData(union),
              new GenericArrayData(c.posBuckets(i)), c.sum(i),
              c.schema, cv, nIdxArr,
              new GenericArrayData(c.negBuckets(i)))
            i += 1
          }
        }
      } else if (enc == ChunkCodec.EncXor ||
          enc == HistChunkCodec.EncFloatHistogram) {
        // foreign family in a mixed cell: theirs, not ours — skip
      } else throw new IllegalArgumentException(
        s"unknown chunk encoding $enc")
    }
    new GenericArrayData(rows.result().toArray)
  }

  // ---------------------------------------------------------------
  // float family (EncFloatHistogram, ordinal 3)
  // ---------------------------------------------------------------

  /** [[encodeArrayData]] for FLOAT histograms: zero and bucket counts
    * are doubles (struct<ts:long, zero:double, idx:array<int>,
    * cnt:array<double>, sum:double?, nidx:array<int>,
    * ncnt:array<double>>), bodies enc=3 chunkenc float chunks. */
  def encodeFloatArrayData(samples: ArrayData, schema: Int,
      samplesPerChunk: Int, customValues: Array[Double],
      gauge: Boolean): Array[Byte] = {
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    val n = samples.numElements()
    val out = new java.io.ByteArrayOutputStream()
    val tsB = new Array[Long](samplesPerChunk)
    val zeroB = new Array[Double](samplesPerChunk)
    val sumB = new Array[Double](samplesPerChunk)
    val idxB = new Array[Array[Int]](samplesPerChunk)
    val cntB = new Array[Array[Double]](samplesPerChunk)
    val nIdxB = new Array[Array[Int]](samplesPerChunk)
    val nCntB = new Array[Array[Double]](samplesPerChunk)
    var m = 0
    var flags = if (gauge) ChunkencHistogram.GaugeType
      else ChunkencHistogram.UnknownCounterReset

    def flush(): Unit = if (m > 0) {
      val union = TsdbBlockStore.unionIndexes(idxB, m)
      val nUnion = TsdbBlockStore.unionIndexes(nIdxB, m)
      val pos = new Array[Array[Double]](m)
      val neg = new Array[Array[Double]](m)
      val count = new Array[Double](m)
      var i = 0
      while (i < m) {
        val abs = TsdbBlockStore.fillUnionD(idxB(i), cntB(i), union)
        val nAbs = if (nUnion.isEmpty) NoNegD
          else TsdbBlockStore.fillUnionD(nIdxB(i), nCntB(i), nUnion)
        var total = zeroB(i)
        abs.foreach(total += _)
        nAbs.foreach(total += _)
        pos(i) = abs
        neg(i) = nAbs
        count(i) = total
        i += 1
      }
      val body = ChunkencHistogram.encodeFloatHistChunk(FloatHistChunk(
        flags, schema, 0.0, ChunkencHistogram.spansFromIndexes(union),
        ChunkencHistogram.spansFromIndexes(nUnion),
        java.util.Arrays.copyOf(tsB, m), count,
        java.util.Arrays.copyOf(zeroB, m),
        java.util.Arrays.copyOf(sumB, m), pos, neg, customValues))
      ChunkCodec.putUvarint(out, HistChunkCodec.EncFloatHistogram)
      ChunkCodec.putUvarint(out, tsB(0))
      ChunkCodec.putUvarint(out, tsB(m - 1))
      ChunkCodec.putUvarint(out, body.length.toLong)
      out.write(body, 0, body.length)
      m = 0
    }

    var lastZero = 0.0
    var lastTs = Long.MinValue
    var lastIdx: Array[Int] = null
    var lastCnt: Array[Double] = null
    var lastNIdx: Array[Int] = null
    var lastNCnt: Array[Double] = null
    var i = 0
    while (i < n) {
      val r = samples.getStruct(i, 7)
      val ts = r.getLong(0)
      val zero = r.getDouble(1)
      val idx = r.getArray(2).toIntArray()
      val cnt = r.getArray(3).toDoubleArray()
      val nidx = r.getArray(5).toIntArray()
      val ncnt = r.getArray(6).toDoubleArray()
      TsdbBlockStore.requireAscending(idx)
      TsdbBlockStore.requireAscending(nidx)
      val sum = if (r.isNullAt(4)) Double.NaN else r.getDouble(4)
      require(lastIdx == null || ts >= lastTs,
        "samples must be sorted by timestamp")
      if (!gauge && lastIdx != null &&
          (zero < lastZero ||
            TsdbBlockStore.sparseDecreasedD(lastIdx, lastCnt, idx, cnt) ||
            TsdbBlockStore.sparseDecreasedD(lastNIdx, lastNCnt, nidx, ncnt))) {
        flush()
        flags = ChunkencHistogram.CounterReset
      } else if (m == samplesPerChunk) {
        flush()
        if (!gauge) flags = ChunkencHistogram.NotCounterReset
      }
      tsB(m) = ts; zeroB(m) = zero; sumB(m) = sum
      idxB(m) = idx; cntB(m) = cnt; nIdxB(m) = nidx; nCntB(m) = ncnt
      m += 1
      lastZero = zero; lastTs = ts; lastIdx = idx; lastCnt = cnt
      lastNIdx = nidx; lastNCnt = ncnt
      i += 1
    }
    flush()
    out.toByteArray
  }

  /** [[decodeToArrayData]] for enc=3 float-histogram frames. */
  def decodeFloatToArrayData(blob: Array[Byte], qmint: Long,
      qmaxt: Long): ArrayData = {
    val rows = Vector.newBuilder[Any]
    val pos = Array(0)
    while (pos(0) < blob.length) {
      val enc = ChunkCodec.readUvarint(blob, pos)
      val mint = ChunkCodec.readUvarint(blob, pos)
      val maxt = ChunkCodec.readUvarint(blob, pos)
      val size = ChunkCodec.readUvarint(blob, pos).toInt
      val bodyStart = pos(0)
      pos(0) = bodyStart + size
      if (enc == HistChunkCodec.EncFloatHistogram) {
        if (mint <= qmaxt && maxt >= qmint) {
          val c = ChunkencHistogram.decodeFloatHistChunk(blob, bodyStart, size)
          val union = ChunkencHistogram.bucketIndexes(c.posSpans)
          val nUnion = ChunkencHistogram.bucketIndexes(c.negSpans)
          val cv = new GenericArrayData(c.customValues)
          val nIdxArr = new GenericArrayData(nUnion)
          var i = 0
          while (i < c.ts.length) {
            rows += InternalRow(c.ts(i), c.zeroCount(i),
              new GenericArrayData(union),
              new GenericArrayData(c.posBuckets(i)), c.sum(i),
              c.schema, cv, nIdxArr,
              new GenericArrayData(c.negBuckets(i)))
            i += 1
          }
        }
      } else if (enc == ChunkCodec.EncXor ||
          enc == HistChunkCodec.EncHistogram) {
        // foreign family in a mixed cell — skip
      } else throw new IllegalArgumentException(
        s"unknown chunk encoding $enc")
    }
    new GenericArrayData(rows.result().toArray)
  }
}
