package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import ChunkCodec.{BitReader, BitWriter}

/** NATIVE-histogram chunk codec — the reference's THIRD chunk
  * encoding family (schema/encoder.go:118-196 re-encodes
  * `EncHistogram`/`EncFloatHistogram` chunks per data column; the
  * XOR float family is [[ChunkCodec]]). One chunk holds a run of
  * exponential-bucket histogram SAMPLES of one series, exploiting
  * the two regularities Prometheus's own histogram chunks exploit:
  * timestamps are near-regular (delta-of-delta varbit, the
  * [[ChunkCodec]] scheme) and consecutive samples of a HISTOGRAM
  * COUNTER share their bucket layout with slowly-growing counts
  * (layout reuse + per-bucket count DELTAS as zigzag varints — a
  * cumulative bucket that grows by k costs ~⌈bits(k)/7⌉ bytes, not
  * 8). The byte layout is graft's own; the reference's wire format
  * is a Prometheus-internal detail its own encoder also abstracts
  * away.
  *
  * Chunk layout (MSB-first bitstream):
  *   - 16 bits sample count, 8 bits flags (bit0: samples carry a
  *     tracked observation sum), zigzag-varint schema
  *   - sample 0: ts zigzag-varint; zero_count uvarint; nbuckets
  *     uvarint, first bucket idx zigzag-varint, then ascending gaps
  *     (uvarint, ≥1); counts uvarint each; sum as 64 raw IEEE bits
  *     (when flagged)
  *   - sample i≥1:
  *       ts: delta uvarint (i=1) / delta-of-delta varbit (i≥2),
  *         exactly the [[ChunkCodec]] buckets;
  *       layout bit: '0' → SAME bucket index set as the previous
  *         sample; zero_count and every bucket count stored as
  *         zigzag-varint deltas vs the previous sample.
  *         '1' → layout change (buckets appeared/vanished):
  *         zero_count delta zigzag-varint, then the full new index
  *         set + ABSOLUTE counts as in sample 0;
  *       sum (when flagged): XOR-encoded vs the previous sum with
  *         the Gorilla leading/trailing window (bit-exact, NaN
  *         payloads included).
  *
  * Blob framing is [[ChunkCodec]]'s parquet cell format with
  * encoding ordinal [[EncHistogram]] (Prometheus's chunkenc
  * ordinal 2): uvarint(enc) uvarint(mint) uvarint(maxt)
  * uvarint(len) body. Decode skips non-overlapping chunks on the
  * FRAME HEADER alone — bodies of skipped chunks are never parsed
  * (schema/encoder.go:274 semantics; [[HistChunkCodecSpec]] pins it
  * with planted garbage).
  */
object HistChunkCodec {

  /** Prometheus chunkenc.EncHistogram ordinal, kept for frame compat. */
  final val EncHistogram = 2L

  /** Prometheus chunkenc.EncFloatHistogram ordinal (schema/encoder.go
    * re-encodes both families; recording rules emit float
    * histograms). Frame format identical; the body stores zero count
    * and bucket counts as XOR-windowed DOUBLES instead of integer
    * deltas. */
  final val EncFloatHistogram = 3L

  /** Decoded samples of one series span, parallel arrays. `sums` is
    * null when the chunk carries no tracked sums. */
  final case class Samples(ts: Array[Long], zero: Array[Long],
      idx: Array[Array[Int]], cnt: Array[Array[Long]],
      sums: Array[Double])

  /** FLOAT-histogram samples: bucket counts and the zero count are
    * doubles (Prometheus FloatHistogram — what recording rules and
    * `rate()` emit). Same layout-reuse idea; counts travel through
    * the XOR window instead of integer deltas. */
  final case class FloatSamples(ts: Array[Long], zero: Array[Double],
      idx: Array[Array[Int]], cnt: Array[Array[Double]],
      sums: Array[Double])

  /** Gorilla XOR leading/trailing window over a shared bit stream —
    * the sum-column scheme of the integer chunk, factored so the
    * float chunk can run EVERY double (zero count, bucket counts,
    * sums) through it. Bit-exact incl. NaN payloads. */
  private[tsdb] final class XorWriter(w: BitWriter) {
    private var winLeading = -1
    private var winTrailing = 0
    def write(bits: Long, prevBits: Long): Unit = {
      val xor = bits ^ prevBits
      if (xor == 0L) w.writeBit(false)
      else {
        w.writeBit(true)
        val leading = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
        val trailing = java.lang.Long.numberOfTrailingZeros(xor)
        if (winLeading != -1 && leading >= winLeading &&
            trailing >= winTrailing) {
          w.writeBit(false)
          w.writeBits(xor >>> winTrailing, 64 - winLeading - winTrailing)
        } else {
          winLeading = leading
          winTrailing = trailing
          val sigbits = 64 - leading - trailing
          w.writeBit(true)
          w.writeBits(leading.toLong, 5)
          w.writeBits(sigbits.toLong & 0x3f, 6) // 64 stored as 0
          w.writeBits(xor >>> trailing, sigbits)
        }
      }
    }
  }

  private[tsdb] final class XorReader(r: BitReader) {
    private var winLeading = 0
    private var winTrailing = 0
    def read(prevBits: Long): Long = {
      if (!r.readBit()) prevBits
      else if (!r.readBit()) {
        val sigbits = 64 - winLeading - winTrailing
        prevBits ^ (r.readBits(sigbits) << winTrailing)
      } else {
        winLeading = r.readBits(5).toInt
        var sigbits = r.readBits(6).toInt
        if (sigbits == 0) sigbits = 64
        winTrailing = 64 - winLeading - sigbits
        prevBits ^ (r.readBits(sigbits) << winTrailing)
      }
    }
  }

  /** Delta-of-delta timestamp column (the [[ChunkCodec]] varbit
    * buckets) with its run state, shared by the integer and float
    * chunk encoders: raw varint at sample 0, uvarint delta at
    * sample 1, then bucketed DoD. */
  private[tsdb] final class TsWriter(w: BitWriter) {
    private var prevT = 0L
    private var prevDelta = 0L
    private var i = 0
    def write(t: Long): Unit = {
      if (i == 0) w.writeVarint(t)
      else if (i == 1) {
        prevDelta = t - prevT
        require(prevDelta >= 0, "timestamps must be sorted")
        w.writeUvarint(prevDelta)
      } else {
        val delta = t - prevT
        require(delta >= 0, "timestamps must be sorted")
        val dod = delta - prevDelta
        prevDelta = delta
        if (dod == 0) w.writeBit(false)
        else if (-8191 <= dod && dod <= 8192) {
          w.writeBits(0x2, 2); w.writeBits(dod & 0x3fff, 14)
        } else if (-65535 <= dod && dod <= 65536) {
          w.writeBits(0x6, 3); w.writeBits(dod & 0x1ffff, 17)
        } else if (-524287 <= dod && dod <= 524288) {
          w.writeBits(0xe, 4); w.writeBits(dod & 0xfffff, 20)
        } else {
          w.writeBits(0xf, 4); w.writeBits(dod, 64)
        }
      }
      prevT = t
      i += 1
    }
  }

  private[tsdb] final class TsReader(r: BitReader) {
    private var prevT = 0L
    private var prevDelta = 0L
    private var i = 0
    def read(): Long = {
      if (i == 0) prevT = r.readVarint()
      else {
        if (i == 1) prevDelta = r.readUvarint()
        else {
          var width = 0
          if (!r.readBit()) width = 0
          else if (!r.readBit()) width = 14
          else if (!r.readBit()) width = 17
          else if (!r.readBit()) width = 20
          else width = 64
          if (width > 0) {
            var dod = r.readBits(width)
            if (width != 64 && dod > (1L << (width - 1)))
              dod -= 1L << width
            prevDelta += dod
          }
        }
        prevT += prevDelta
      }
      i += 1
      prevT
    }
  }

  // ---------------------------------------------------------------
  // single chunk
  // ---------------------------------------------------------------

  /** Encode one chunk. `ts` sorted ascending; per-sample `idx`
    * strictly ascending with aligned `cnt`; `sums` may be null
    * (no tracked sum). ≤ 0xffff samples.
    */
  def encodeChunk(ts: Array[Long], zero: Array[Long],
      idx: Array[Array[Int]], cnt: Array[Array[Long]],
      sums: Array[Double], schema: Int): Array[Byte] = {
    val n = ts.length
    require(zero.length == n && idx.length == n && cnt.length == n,
      "parallel array length mismatch")
    require(sums == null || sums.length == n, "sums length mismatch")
    require(n <= 0xffff, s"chunk too large: $n")
    val hasSum = sums != null
    val w = new BitWriter()
    w.writeBits(n.toLong, 16)
    w.writeBits(if (hasSum) 1L else 0L, 8)
    w.writeVarint(schema.toLong)
    val tw = new TsWriter(w)
    val xs = new XorWriter(w)
    var prevSumBits = 0L
    var i = 0
    while (i < n) {
      tw.write(ts(i))

      val bi = idx(i)
      val bc = cnt(i)
      require(bi.length == bc.length, s"idx/cnt mismatch at sample $i")
      if (i == 0) {
        w.writeUvarint(zero(0))
        writeLayoutAbsolute(w, bi, bc)
      } else {
        val sameLayout = java.util.Arrays.equals(bi, idx(i - 1))
        if (sameLayout) {
          w.writeBit(false)
          w.writeVarint(zero(i) - zero(i - 1))
          val pc = cnt(i - 1)
          var j = 0
          while (j < bc.length) { w.writeVarint(bc(j) - pc(j)); j += 1 }
        } else {
          w.writeBit(true)
          w.writeVarint(zero(i) - zero(i - 1))
          writeLayoutAbsolute(w, bi, bc)
        }
      }

      if (hasSum) {
        val bits = java.lang.Double.doubleToRawLongBits(sums(i))
        if (i == 0) w.writeBits(bits, 64)
        else xs.write(bits, prevSumBits)
        prevSumBits = bits
      }
      i += 1
    }
    w.toBytes
  }

  private def writeLayoutAbsolute(w: BitWriter, bi: Array[Int],
      bc: Array[Long]): Unit = {
    w.writeUvarint(bi.length.toLong)
    var j = 0
    while (j < bi.length) {
      if (j == 0) w.writeVarint(bi(0).toLong)
      else {
        val gap = bi(j) - bi(j - 1)
        require(gap >= 1, "bucket indexes must be strictly ascending")
        w.writeUvarint(gap.toLong)
      }
      j += 1
    }
    j = 0
    while (j < bc.length) { w.writeUvarint(bc(j)); j += 1 }
  }

  /** Decode one chunk from `bytes[start, start+len)`. Returns the
    * samples plus the chunk's schema. */
  def decodeChunk(bytes: Array[Byte], start: Int, len: Int): (Samples, Int) = {
    val r = new BitReader(bytes, start, start + len)
    val n = r.readBits(16).toInt
    val hasSum = (r.readBits(8) & 1L) != 0
    val schema = r.readVarint().toInt
    val ts = new Array[Long](n)
    val zero = new Array[Long](n)
    val idx = new Array[Array[Int]](n)
    val cnt = new Array[Array[Long]](n)
    val sums = if (hasSum) new Array[Double](n) else null
    val tr = new TsReader(r)
    val xs = new XorReader(r)
    var prevSumBits = 0L
    var i = 0
    while (i < n) {
      ts(i) = tr.read()

      if (i == 0) {
        zero(0) = r.readUvarint()
        val (bi, bc) = readLayoutAbsolute(r)
        idx(0) = bi; cnt(0) = bc
      } else if (!r.readBit()) { // same layout: deltas
        zero(i) = zero(i - 1) + r.readVarint()
        val bi = idx(i - 1)
        val pc = cnt(i - 1)
        val bc = new Array[Long](bi.length)
        var j = 0
        while (j < bi.length) { bc(j) = pc(j) + r.readVarint(); j += 1 }
        idx(i) = bi; cnt(i) = bc
      } else { // layout change: absolute re-encode
        zero(i) = zero(i - 1) + r.readVarint()
        val (bi, bc) = readLayoutAbsolute(r)
        idx(i) = bi; cnt(i) = bc
      }

      if (hasSum) {
        if (i == 0) prevSumBits = r.readBits(64)
        else prevSumBits = xs.read(prevSumBits)
        sums(i) = java.lang.Double.longBitsToDouble(prevSumBits)
      }
      i += 1
    }
    (Samples(ts, zero, idx, cnt, sums), schema)
  }

  private def readLayoutAbsolute(r: BitReader): (Array[Int], Array[Long]) = {
    val nb = r.readUvarint().toInt
    val bi = new Array[Int](nb)
    var j = 0
    while (j < nb) {
      bi(j) = if (j == 0) r.readVarint().toInt
        else bi(j - 1) + r.readUvarint().toInt
      j += 1
    }
    val bc = new Array[Long](nb)
    j = 0
    while (j < nb) { bc(j) = r.readUvarint(); j += 1 }
    (bi, bc)
  }

  // ---------------------------------------------------------------
  // framed blob
  // ---------------------------------------------------------------

  /** Encode sorted samples into a framed blob, a new chunk every
    * `samplesPerChunk` samples ([[ChunkCodec.encodeBlob]] framing,
    * ordinal [[EncHistogram]]).
    */
  def encodeBlob(s: Samples, schema: Int, samplesPerChunk: Int): Array[Byte] = {
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < s.ts.length) {
      val take = math.min(samplesPerChunk, s.ts.length - off)
      val bytes = encodeChunk(
        java.util.Arrays.copyOfRange(s.ts, off, off + take),
        java.util.Arrays.copyOfRange(s.zero, off, off + take),
        java.util.Arrays.copyOfRange(s.idx, off, off + take),
        java.util.Arrays.copyOfRange(s.cnt, off, off + take),
        if (s.sums == null) null
        else java.util.Arrays.copyOfRange(s.sums, off, off + take),
        schema)
      ChunkCodec.putUvarint(out, EncHistogram)
      ChunkCodec.putUvarint(out, s.ts(off))
      ChunkCodec.putUvarint(out, s.ts(off + take - 1))
      ChunkCodec.putUvarint(out, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
      off += take
    }
    out.toByteArray
  }

  /** Frame headers `(enc, mint, maxt, bodyStart, size)` of a blob —
    * introspection for tests and storage tooling (the same walk
    * [[decodeBlob]] performs, headers only). */
  def frames(blob: Array[Byte]): Seq[(Long, Long, Long, Int, Int)] = {
    val out = Seq.newBuilder[(Long, Long, Long, Int, Int)]
    val pos = Array(0)
    while (pos(0) < blob.length) {
      val enc = ChunkCodec.readUvarint(blob, pos)
      val mint = ChunkCodec.readUvarint(blob, pos)
      val maxt = ChunkCodec.readUvarint(blob, pos)
      val size = ChunkCodec.readUvarint(blob, pos).toInt
      out += ((enc, mint, maxt, pos(0), size))
      pos(0) += size
    }
    out.result()
  }

  /** Decode every chunk whose [mint, maxt] header overlaps
    * [qmint, qmaxt] (inclusive); skipped bodies are never parsed.
    * Returns the concatenated samples and the LAST decoded chunk's
    * schema (one series never mixes schemas in a blob).
    */
  def decodeBlob(blob: Array[Byte], qmint: Long, qmaxt: Long): (Samples, Int) = {
    val ts = Array.newBuilder[Long]
    val zero = Array.newBuilder[Long]
    val idx = Array.newBuilder[Array[Int]]
    val cnt = Array.newBuilder[Array[Long]]
    val sums = Array.newBuilder[Double]
    var hasSum = false
    var schema = 0
    val pos = Array(0)
    while (pos(0) < blob.length) {
      val enc = ChunkCodec.readUvarint(blob, pos)
      require(enc == EncHistogram, s"unknown chunk encoding $enc")
      val mint = ChunkCodec.readUvarint(blob, pos)
      val maxt = ChunkCodec.readUvarint(blob, pos)
      val size = ChunkCodec.readUvarint(blob, pos).toInt
      val bodyStart = pos(0)
      pos(0) = bodyStart + size
      if (mint <= qmaxt && maxt >= qmint) {
        val (s, sch) = decodeChunk(blob, bodyStart, size)
        schema = sch
        ts ++= s.ts; zero ++= s.zero; idx ++= s.idx; cnt ++= s.cnt
        if (s.sums != null) { hasSum = true; sums ++= s.sums }
      }
    }
    (Samples(ts.result(), zero.result(), idx.result(), cnt.result(),
      if (hasSum) sums.result() else null), schema)
  }

  // ---------------------------------------------------------------
  // FLOAT-histogram chunks (EncFloatHistogram family)
  // ---------------------------------------------------------------

  /** Encode one FLOAT-histogram chunk. Same header/timestamp scheme
    * as [[encodeChunk]]; zero count and bucket counts are doubles —
    * sample 0 stores them as raw 64-bit IEEE words, later samples
    * run them (and the tracked sum) through ONE shared Gorilla XOR
    * window in stream order: a float counter growing smoothly XORs
    * against the previous sample's count at the SAME bucket position
    * (layout reuse), so only the changed mantissa bits cost
    * anything. Layout changes re-encode the new index set with
    * absolute raw-bit counts. Bit-lossless for every double incl.
    * NaN payloads and signed zeros.
    */
  def encodeFloatChunk(ts: Array[Long], zero: Array[Double],
      idx: Array[Array[Int]], cnt: Array[Array[Double]],
      sums: Array[Double], schema: Int): Array[Byte] = {
    val n = ts.length
    require(zero.length == n && idx.length == n && cnt.length == n,
      "parallel array length mismatch")
    require(sums == null || sums.length == n, "sums length mismatch")
    require(n <= 0xffff, s"chunk too large: $n")
    val hasSum = sums != null
    val w = new BitWriter()
    w.writeBits(n.toLong, 16)
    w.writeBits(if (hasSum) 1L else 0L, 8)
    w.writeVarint(schema.toLong)
    val tw = new TsWriter(w)
    val xc = new XorWriter(w) // zero + bucket counts
    val xs = new XorWriter(w) // tracked sums (own window, as in the int chunk)
    var prevZeroBits = 0L
    var prevCntBits: Array[Long] = null
    var prevSumBits = 0L
    var i = 0
    while (i < n) {
      tw.write(ts(i))

      val bi = idx(i)
      val bc = cnt(i)
      require(bi.length == bc.length, s"idx/cnt mismatch at sample $i")
      val zeroBits = java.lang.Double.doubleToRawLongBits(zero(i))
      if (i == 0) {
        w.writeBits(zeroBits, 64)
        writeFloatLayoutAbsolute(w, bi, bc)
        prevCntBits = bc.map(java.lang.Double.doubleToRawLongBits)
      } else {
        val sameLayout = java.util.Arrays.equals(bi, idx(i - 1))
        if (sameLayout) {
          w.writeBit(false)
          xc.write(zeroBits, prevZeroBits)
          var j = 0
          while (j < bc.length) {
            val bits = java.lang.Double.doubleToRawLongBits(bc(j))
            xc.write(bits, prevCntBits(j))
            prevCntBits(j) = bits
            j += 1
          }
        } else {
          w.writeBit(true)
          xc.write(zeroBits, prevZeroBits)
          writeFloatLayoutAbsolute(w, bi, bc)
          prevCntBits = bc.map(java.lang.Double.doubleToRawLongBits)
        }
      }
      prevZeroBits = zeroBits

      if (hasSum) {
        val bits = java.lang.Double.doubleToRawLongBits(sums(i))
        if (i == 0) w.writeBits(bits, 64)
        else xs.write(bits, prevSumBits)
        prevSumBits = bits
      }
      i += 1
    }
    w.toBytes
  }

  private def writeFloatLayoutAbsolute(w: BitWriter, bi: Array[Int],
      bc: Array[Double]): Unit = {
    w.writeUvarint(bi.length.toLong)
    var j = 0
    while (j < bi.length) {
      if (j == 0) w.writeVarint(bi(0).toLong)
      else {
        val gap = bi(j) - bi(j - 1)
        require(gap >= 1, "bucket indexes must be strictly ascending")
        w.writeUvarint(gap.toLong)
      }
      j += 1
    }
    j = 0
    while (j < bc.length) {
      w.writeBits(java.lang.Double.doubleToRawLongBits(bc(j)), 64)
      j += 1
    }
  }

  /** Decode one FLOAT-histogram chunk from `bytes[start, start+len)`.
    * Returns the samples plus the chunk's schema. */
  def decodeFloatChunk(bytes: Array[Byte], start: Int,
      len: Int): (FloatSamples, Int) = {
    val r = new BitReader(bytes, start, start + len)
    val n = r.readBits(16).toInt
    val hasSum = (r.readBits(8) & 1L) != 0
    val schema = r.readVarint().toInt
    val ts = new Array[Long](n)
    val zero = new Array[Double](n)
    val idx = new Array[Array[Int]](n)
    val cnt = new Array[Array[Double]](n)
    val sums = if (hasSum) new Array[Double](n) else null
    val tr = new TsReader(r)
    val xc = new XorReader(r)
    val xs = new XorReader(r)
    var prevZeroBits = 0L
    var prevCntBits: Array[Long] = null
    var prevSumBits = 0L
    var i = 0
    while (i < n) {
      ts(i) = tr.read()

      if (i == 0) {
        prevZeroBits = r.readBits(64)
        val (bi, bits) = readFloatLayoutAbsolute(r)
        idx(0) = bi; prevCntBits = bits
      } else if (!r.readBit()) { // same layout: XOR deltas
        prevZeroBits = xc.read(prevZeroBits)
        val bi = idx(i - 1)
        var j = 0
        while (j < bi.length) {
          prevCntBits(j) = xc.read(prevCntBits(j))
          j += 1
        }
        idx(i) = bi
      } else { // layout change: absolute re-encode
        prevZeroBits = xc.read(prevZeroBits)
        val (bi, bits) = readFloatLayoutAbsolute(r)
        idx(i) = bi; prevCntBits = bits
      }
      zero(i) = java.lang.Double.longBitsToDouble(prevZeroBits)
      cnt(i) = prevCntBits.map(java.lang.Double.longBitsToDouble)

      if (hasSum) {
        if (i == 0) prevSumBits = r.readBits(64)
        else prevSumBits = xs.read(prevSumBits)
        sums(i) = java.lang.Double.longBitsToDouble(prevSumBits)
      }
      i += 1
    }
    (FloatSamples(ts, zero, idx, cnt, sums), schema)
  }

  private def readFloatLayoutAbsolute(r: BitReader): (Array[Int], Array[Long]) = {
    val nb = r.readUvarint().toInt
    val bi = new Array[Int](nb)
    var j = 0
    while (j < nb) {
      bi(j) = if (j == 0) r.readVarint().toInt
        else bi(j - 1) + r.readUvarint().toInt
      j += 1
    }
    val bits = new Array[Long](nb)
    j = 0
    while (j < nb) { bits(j) = r.readBits(64); j += 1 }
    (bi, bits)
  }

  /** Encode sorted FLOAT-histogram samples into a framed blob
    * (ordinal [[EncFloatHistogram]], [[ChunkCodec.encodeBlob]]
    * framing — header-only skip works unchanged). */
  def encodeFloatBlob(s: FloatSamples, schema: Int,
      samplesPerChunk: Int): Array[Byte] = {
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < s.ts.length) {
      val take = math.min(samplesPerChunk, s.ts.length - off)
      val bytes = encodeFloatChunk(
        java.util.Arrays.copyOfRange(s.ts, off, off + take),
        java.util.Arrays.copyOfRange(s.zero, off, off + take),
        java.util.Arrays.copyOfRange(s.idx, off, off + take),
        java.util.Arrays.copyOfRange(s.cnt, off, off + take),
        if (s.sums == null) null
        else java.util.Arrays.copyOfRange(s.sums, off, off + take),
        schema)
      ChunkCodec.putUvarint(out, EncFloatHistogram)
      ChunkCodec.putUvarint(out, s.ts(off))
      ChunkCodec.putUvarint(out, s.ts(off + take - 1))
      ChunkCodec.putUvarint(out, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
      off += take
    }
    out.toByteArray
  }

  /** Decode every FLOAT-histogram chunk whose [mint, maxt] header
    * overlaps [qmint, qmaxt]; skipped bodies never parsed. */
  def decodeFloatBlob(blob: Array[Byte], qmint: Long,
      qmaxt: Long): (FloatSamples, Int) = {
    val ts = Array.newBuilder[Long]
    val zero = Array.newBuilder[Double]
    val idx = Array.newBuilder[Array[Int]]
    val cnt = Array.newBuilder[Array[Double]]
    val sums = Array.newBuilder[Double]
    var hasSum = false
    var schema = 0
    val pos = Array(0)
    while (pos(0) < blob.length) {
      val enc = ChunkCodec.readUvarint(blob, pos)
      require(enc == EncFloatHistogram, s"unknown chunk encoding $enc")
      val mint = ChunkCodec.readUvarint(blob, pos)
      val maxt = ChunkCodec.readUvarint(blob, pos)
      val size = ChunkCodec.readUvarint(blob, pos).toInt
      val bodyStart = pos(0)
      pos(0) = bodyStart + size
      if (mint <= qmaxt && maxt >= qmint) {
        val (s, sch) = decodeFloatChunk(blob, bodyStart, size)
        schema = sch
        ts ++= s.ts; zero ++= s.zero; idx ++= s.idx; cnt ++= s.cnt
        if (s.sums != null) { hasSum = true; sums ++= s.sums }
      }
    }
    (FloatSamples(ts.result(), zero.result(), idx.result(), cnt.result(),
      if (hasSum) sums.result() else null), schema)
  }

  // ---------------------------------------------------------------
  // codegen entry points (stable signatures over Catalyst types)
  // ---------------------------------------------------------------

  /** samples: array<struct<ts:long, zero:double, idx:array<int>,
    * cnt:array<double>, sum:double>> (sorted by ts) → framed
    * EncFloatHistogram blob. Null `sum` in ROW 0 marks a sum-less
    * series. */
  def encodeFloatArrayData(samples: ArrayData, schema: Int,
      samplesPerChunk: Int): Array[Byte] = {
    val n = samples.numElements()
    val ts = new Array[Long](n)
    val zero = new Array[Double](n)
    val idx = new Array[Array[Int]](n)
    val cnt = new Array[Array[Double]](n)
    var sums: Array[Double] = null
    var i = 0
    while (i < n) {
      val row = samples.getStruct(i, 5)
      ts(i) = row.getLong(0)
      zero(i) = row.getDouble(1)
      idx(i) = row.getArray(2).toIntArray()
      cnt(i) = row.getArray(3).toDoubleArray()
      if (i == 0 && !row.isNullAt(4)) sums = new Array[Double](n)
      if (sums != null) sums(i) = row.getDouble(4)
      i += 1
    }
    encodeFloatBlob(FloatSamples(ts, zero, idx, cnt, sums), schema,
      samplesPerChunk)
  }

  /** blob → array<struct<ts:long, zero:double, idx:array<int>,
    * cnt:array<double>, sum:double>> of the chunks overlapping
    * [qmint, qmaxt]; sum is null for sum-less blobs. */
  def decodeFloatToArrayData(blob: Array[Byte], qmint: Long,
      qmaxt: Long): ArrayData = {
    val (s, _) = decodeFloatBlob(blob, qmint, qmaxt)
    val rows = new Array[Any](s.ts.length)
    var i = 0
    while (i < s.ts.length) {
      rows(i) = InternalRow(s.ts(i), s.zero(i),
        new GenericArrayData(s.idx(i)),
        new GenericArrayData(s.cnt(i)),
        if (s.sums == null) null else java.lang.Double.valueOf(s.sums(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** samples: array<struct<ts:long, zero:long, idx:array<int>,
    * cnt:array<long>, sum:double>> (sorted by ts) → framed blob.
    * A null `sum` in ROW 0 marks a sum-less series (all rows must
    * agree). */
  def encodeArrayData(samples: ArrayData, schema: Int,
      samplesPerChunk: Int): Array[Byte] = {
    val n = samples.numElements()
    val ts = new Array[Long](n)
    val zero = new Array[Long](n)
    val idx = new Array[Array[Int]](n)
    val cnt = new Array[Array[Long]](n)
    var sums: Array[Double] = null
    var i = 0
    while (i < n) {
      val row = samples.getStruct(i, 5)
      ts(i) = row.getLong(0)
      zero(i) = row.getLong(1)
      idx(i) = row.getArray(2).toIntArray()
      cnt(i) = row.getArray(3).toLongArray()
      if (i == 0 && !row.isNullAt(4)) sums = new Array[Double](n)
      if (sums != null) sums(i) = row.getDouble(4)
      i += 1
    }
    encodeBlob(Samples(ts, zero, idx, cnt, sums), schema, samplesPerChunk)
  }

  /** blob → array<struct<ts:long, zero:long, idx:array<int>,
    * cnt:array<long>, sum:double>> of the chunks overlapping
    * [qmint, qmaxt]; sum is null for sum-less blobs. */
  def decodeToArrayData(blob: Array[Byte], qmint: Long, qmaxt: Long): ArrayData = {
    val (s, _) = decodeBlob(blob, qmint, qmaxt)
    val rows = new Array[Any](s.ts.length)
    var i = 0
    while (i < s.ts.length) {
      rows(i) = InternalRow(s.ts(i), s.zero(i),
        new GenericArrayData(s.idx(i)),
        new GenericArrayData(s.cnt(i)),
        if (s.sums == null) null else java.lang.Double.valueOf(s.sums(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
