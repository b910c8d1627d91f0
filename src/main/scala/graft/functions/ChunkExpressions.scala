package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.tsdb.{ChunkCodec, HistChunkCodec}

/** Catalyst expressions over the [[graft.tsdb.ChunkCodec]] XOR chunk
  * codec. Both stay inside whole-stage codegen: the generated code
  * calls the codec's static entry points directly (the per-row work
  * is byte-stream parsing that gains nothing from inlined Java, but
  * keeping the EXPRESSION codegen-able keeps the surrounding
  * project/filter/explode span fused — no CodegenFallback barrier in
  * the select path).
  */

/** `chunk_encode(samples, samplesPerChunk)`: sorted
  * array<struct<ts:long, value:double>> → framed XOR chunk blob
  * (binary). samplesPerChunk is a literal knob, not a column.
  */
case class ChunkEncode(child: Expression, samplesPerChunk: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(samplesPerChunk > 0, "samplesPerChunk must be positive")

  override def inputTypes =
    Seq(ArrayType(StructType(Seq(
      StructField("ts", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))))

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    ChunkCodec.encodeArrayData(v.asInstanceOf[ArrayData], samplesPerChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala emits static forwarders on the object's class, so this
    // is a plain static call in the generated Java
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.tsdb.ChunkCodec.encodeArrayData($c, $samplesPerChunk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `chunk_decode(blob, qmint, qmaxt)`: framed blob → samples of the
  * chunks whose frame header overlaps [qmint, qmaxt] (inclusive, the
  * reference decoder's filter — schema/encoder.go:310). Skipped
  * chunks are never parsed. Callers explode the result and apply the
  * exact per-sample range predicate on top.
  */
case class ChunkDecode(blob: Expression, qmint: Expression, qmaxt: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = blob
  override def second: Expression = qmint
  override def third: Expression = qmaxt

  override def inputTypes = Seq(BinaryType, LongType, LongType)

  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("ts", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
      containsNull = false)

  override def nullSafeEval(b: Any, mi: Any, ma: Any): Any =
    ChunkCodec.decodeToArrayData(b.asInstanceOf[Array[Byte]],
      mi.asInstanceOf[Long], ma.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, mi, ma) =>
      s"${ev.value} = graft.tsdb.ChunkCodec.decodeToArrayData($b, $mi, $ma);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(blob = newFirst, qmint = newSecond, qmaxt = newThird)
}

/** `float_hist_chunk_encode(samples, schema, samplesPerChunk)`:
  * sorted FLOAT-histogram samples → framed EncFloatHistogram blob
  * ([[graft.tsdb.HistChunkCodec.encodeFloatBlob]] — layout reuse +
  * XOR-windowed double counts).
  */
case class FloatHistChunkEncode(child: Expression, histSchema: Int,
    samplesPerChunk: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(samplesPerChunk > 0, "samplesPerChunk must be positive")

  override def inputTypes = Seq(ArrayType(HistChunkExpressions.floatSampleType))

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    HistChunkCodec.encodeFloatArrayData(v.asInstanceOf[ArrayData],
      histSchema, samplesPerChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.tsdb.HistChunkCodec.encodeFloatArrayData($c, $histSchema, $samplesPerChunk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `float_hist_chunk_decode(blob, qmint, qmaxt)`: framed
  * EncFloatHistogram blob → float-histogram samples of the chunks
  * whose frame header overlaps [qmint, qmaxt]; skipped bodies never
  * parsed.
  */
case class FloatHistChunkDecode(blob: Expression, qmint: Expression,
    qmaxt: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = blob
  override def second: Expression = qmint
  override def third: Expression = qmaxt

  override def inputTypes = Seq(BinaryType, LongType, LongType)

  override def dataType: DataType =
    ArrayType(HistChunkExpressions.floatSampleType, containsNull = false)

  override def nullSafeEval(b: Any, mi: Any, ma: Any): Any =
    HistChunkCodec.decodeFloatToArrayData(b.asInstanceOf[Array[Byte]],
      mi.asInstanceOf[Long], ma.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, mi, ma) =>
      s"${ev.value} = graft.tsdb.HistChunkCodec.decodeFloatToArrayData($b, $mi, $ma);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(blob = newFirst, qmint = newSecond, qmaxt = newThird)
}

/** The NATIVE-histogram sample struct both hist chunk expressions
  * share: one exponential-bucket histogram per element, sum nullable
  * (a sum-less counter series carries null in every row).
  */
object HistChunkExpressions {
  val sampleType: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("zero", LongType, nullable = false),
    StructField("idx", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("cnt", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("sum", DoubleType, nullable = true)))

  /** FLOAT-histogram sample struct (EncFloatHistogram family): zero
    * count and bucket counts are doubles. */
  val floatSampleType: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("zero", DoubleType, nullable = false),
    StructField("idx", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("cnt", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("sum", DoubleType, nullable = true)))

  /** Chunkenc-bodied decode structs ([[graft.tsdb.ChunkencHistCodec]])
    * extend the sample model with the chunk's exponential/NHCB schema
    * ordinal, the NHCB bound list (empty for exponential schemas) —
    * the block reader's `schema`/`custom_values` columns at the shard
    * seam — and the SIGNED side's negative buckets (empty for
    * positive-only series). */
  val chunkencSampleType: StructType = StructType(
    sampleType.fields.toSeq ++ Seq(
      StructField("schema", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("nidx", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("ncnt", ArrayType(LongType, containsNull = false),
        nullable = false)))

  val chunkencFloatSampleType: StructType = StructType(
    floatSampleType.fields.toSeq ++ Seq(
      StructField("schema", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("nidx", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("ncnt", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
}

/** `hist_chunk_encode(samples, schema, samplesPerChunk)`: sorted
  * native-histogram samples → framed EncHistogram blob
  * ([[graft.tsdb.HistChunkCodec]] — layout reuse + count deltas).
  * schema and samplesPerChunk are literal knobs.
  */
case class HistChunkEncode(child: Expression, histSchema: Int,
    samplesPerChunk: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(samplesPerChunk > 0, "samplesPerChunk must be positive")

  override def inputTypes = Seq(ArrayType(HistChunkExpressions.sampleType))

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    HistChunkCodec.encodeArrayData(v.asInstanceOf[ArrayData],
      histSchema, samplesPerChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.tsdb.HistChunkCodec.encodeArrayData($c, $histSchema, $samplesPerChunk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `chunkenc_hist_decode(blob, qmint, qmaxt)`: shard-cell blob whose
  * frame bodies are REAL chunkenc EncHistogram chunks
  * ([[graft.tsdb.ChunkencHistCodec]]) → native-histogram samples of
  * the overlapping chunks, on each chunk's union bucket layout.
  * Foreign-family frames (XOR / float-hist in a mixed cell) skip by
  * header; skipped bodies never parsed.
  */
case class ChunkencHistDecode(blob: Expression, qmint: Expression,
    qmaxt: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = blob
  override def second: Expression = qmint
  override def third: Expression = qmaxt

  override def inputTypes = Seq(BinaryType, LongType, LongType)

  override def dataType: DataType =
    ArrayType(HistChunkExpressions.chunkencSampleType, containsNull = false)

  override def nullSafeEval(b: Any, mi: Any, ma: Any): Any =
    graft.tsdb.ChunkencHistCodec.decodeToArrayData(
      b.asInstanceOf[Array[Byte]], mi.asInstanceOf[Long],
      ma.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, mi, ma) =>
      s"${ev.value} = graft.tsdb.ChunkencHistCodec.decodeToArrayData($b, $mi, $ma);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(blob = newFirst, qmint = newSecond, qmaxt = newThird)
}

/** [[ChunkencHistDecode]] for enc=3 FLOAT-histogram frame bodies. */
case class ChunkencFloatHistDecode(blob: Expression, qmint: Expression,
    qmaxt: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = blob
  override def second: Expression = qmint
  override def third: Expression = qmaxt

  override def inputTypes = Seq(BinaryType, LongType, LongType)

  override def dataType: DataType =
    ArrayType(HistChunkExpressions.chunkencFloatSampleType, containsNull = false)

  override def nullSafeEval(b: Any, mi: Any, ma: Any): Any =
    graft.tsdb.ChunkencHistCodec.decodeFloatToArrayData(
      b.asInstanceOf[Array[Byte]], mi.asInstanceOf[Long],
      ma.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, mi, ma) =>
      s"${ev.value} = graft.tsdb.ChunkencHistCodec.decodeFloatToArrayData($b, $mi, $ma);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(blob = newFirst, qmint = newSecond, qmaxt = newThird)
}

/** `hist_chunk_decode(blob, qmint, qmaxt)`: framed EncHistogram blob
  * → native-histogram samples of the chunks whose frame header
  * overlaps [qmint, qmaxt]; skipped bodies never parsed.
  */
case class HistChunkDecode(blob: Expression, qmint: Expression,
    qmaxt: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = blob
  override def second: Expression = qmint
  override def third: Expression = qmaxt

  override def inputTypes = Seq(BinaryType, LongType, LongType)

  override def dataType: DataType =
    ArrayType(HistChunkExpressions.sampleType, containsNull = false)

  override def nullSafeEval(b: Any, mi: Any, ma: Any): Any =
    HistChunkCodec.decodeToArrayData(b.asInstanceOf[Array[Byte]],
      mi.asInstanceOf[Long], ma.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, mi, ma) =>
      s"${ev.value} = graft.tsdb.HistChunkCodec.decodeToArrayData($b, $mi, $ma);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(blob = newFirst, qmint = newSecond, qmaxt = newThird)
}

/** [[graft.tsdb.ChunkCodec.frameFamilyMask]] as a Column: bitmask of
  * chunkenc families present in one encoded cell, headers only.
  */
case class ChunkFamilies(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any): Any =
    graft.tsdb.ChunkCodec.frameFamilyMask(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.tsdb.ChunkCodec.frameFamilyMask($a)")

  override protected def withNewChildInternal(newChild: Expression): ChunkFamilies =
    copy(child = newChild)

  override def prettyName: String = "graft_chunk_families"
}

object ChunkFamilies {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge
  def families(blob: Column): Column =
    ColumnBridge.column(ChunkFamilies(ColumnBridge.expression(blob)))
}
