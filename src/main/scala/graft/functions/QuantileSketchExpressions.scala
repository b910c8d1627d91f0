package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable QUANTILE SKETCHES over doubles — the Greenwald–Khanna
  * summaries Spark's own `percentile_approx` aggregates with
  * (`org.apache.spark.sql.catalyst.util.QuantileSummaries`), exposed
  * here as STORABLE binary sketch columns so a materialized layer can
  * hold one fixed-size sketch per (series, window) and answer
  * approximate `quantile_over_time` over any window-aligned range by
  * MERGING stored sketches — never rescanning samples.
  *
  * Exact quantiles are order statistics: they need the sample
  * multiset, so no moment column can serve them (the reason
  * `quantile_over_time` stays on the raw path in the rollup router).
  * The GK summary is the classic deterministic compromise: a
  * DETERMINISTIC worst-case rank guarantee — the value returned for
  * quantile q has rank within ±ε·n of q·n — at O((1/ε)·log(εn))
  * stored tuples, and summaries MERGE with a bounded error growth
  * (Spark distributes `percentile_approx` by exactly this merge).
  * Like the HLL label sketches, this is a DECLARED approximate
  * operator: it is exposed as an explicit API and a rank-contract
  * gate, never silently routed (routing must not change answers).
  *
  * Serialized form: ONE leading version byte (currently
  * [[QuantileSketch.FormatVersion]]), then compressThreshold,
  * relativeError, count, then (value, g, delta) per retained tuple.
  * These bytes PERSIST in parquet layers, so the version byte is the
  * compatibility contract: a reader seeing an unknown version FAILS
  * LOUDLY instead of misparsing a layer written by a different graft
  * or Spark `QuantileSummaries` vintage. Bump the version on ANY
  * field-order or `QuantileSummaries` internals change.
  * NON-FINITE inputs are SKIPPED, mirroring the exact layers'
  * NaN→decimal-null convention (a staleness marker must not poison a
  * window's sketch).
  */
object QuantileSketch {

  /** Persisted-blob format version — see the serialization contract
    * in the object doc. */
  val FormatVersion: Byte = 1

  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress() // flush the head buffer
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(FormatVersion)
    out.writeInt(qs.compressThreshold)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val st = qs.sampled
    out.writeInt(st.length)
    var i = 0
    while (i < st.length) {
      out.writeDouble(st(i).value)
      out.writeLong(st(i).g)
      out.writeLong(st(i).delta)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != FormatVersion)
      throw new IllegalArgumentException(
        s"unknown quantile-sketch blob version $version (this build reads " +
          s"version $FormatVersion); the layer was written by an " +
          "incompatible graft/Spark vintage — rebuild it from raw or fine " +
          "layers rather than risk a silent misparse")
    val threshold = in.readInt()
    val relErr = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val st = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      st(i) = QuantileSummaries.Stats(
        in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QuantileSummaries(threshold, relErr, st, count, true)
  }

  private def bridge = org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate raw double samples into one serialized GK sketch. */
  def sketchAgg(values: Column, relativeError: Double = 0.01): Column =
    bridge.column(QuantileSketchAgg(bridge.expression(values), relativeError)
      .toAggregateExpression())

  /** Merge serialized sketches into one (the layer-read reducer). */
  def mergeAgg(sketches: Column): Column =
    bridge.column(QuantileSketchMergeAgg(bridge.expression(sketches))
      .toAggregateExpression())

  /** Query a serialized sketch at quantile `q` ∈ [0, 1]; NULL on an
    * empty sketch. */
  def query(sketch: Column, q: Column): Column =
    bridge.column(QuantileSketchQuery(
      bridge.expression(sketch), bridge.expression(q)))
}

/** GK sketch of the child's finite double values → binary. */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError, Array.empty, 0L, false)

  override def update(buf: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(d)) buf.insert(d) else buf
    }
  }

  override def merge(buf: QuantileSummaries,
      other: QuantileSummaries): QuantileSummaries = {
    val a = buf.compress()
    val b = other.compress()
    if (b.count == 0) a else if (a.count == 0) b else a.merge(b)
  }

  override def eval(buf: QuantileSummaries): Any =
    QuantileSketch.toBytes(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Union of serialized sketches (binary in, binary out) — the
  * layer-read reducer: per series, windows-in-range sketches merge
  * into one summary before a single query. */
case class QuantileSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  // relativeError rides in each serialized sketch, so the zero buffer
  // only needs a neutral placeholder replaced on first merge
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError, Array.empty, 0L, true)

  override def update(buf: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = QuantileSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buf.count == 0) other
      else if (other.count == 0) buf
      else buf.compress().merge(other)
    }
  }

  override def merge(buf: QuantileSummaries,
      other: QuantileSummaries): QuantileSummaries =
    if (other.count == 0) buf
    else if (buf.count == 0) other
    else buf.compress().merge(other.compress())

  override def eval(buf: QuantileSummaries): Any =
    if (buf.count == 0) null else QuantileSketch.toBytes(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)
}

/** `query(sketch, q)` — the GK quantile lookup; NULL on an empty or
  * NULL sketch. Runs at result grain (one row per series), so the
  * CodegenFallback costs nothing measurable. */
case class QuantileSketchQuery(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val bin = left.eval(input)
    val q = right.eval(input)
    if (bin == null || q == null) null
    else {
      val qs = QuantileSketch.fromBytes(bin.asInstanceOf[Array[Byte]])
      if (qs.count == 0) null
      else qs.query(q.asInstanceOf[Double]) match {
        case Some(v) => java.lang.Double.valueOf(v)
        case None => null
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchQuery =
    copy(left = newLeft, right = newRight)
}
