package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bucket-wise SUM of native histograms as ONE aggregation — a
  * native Catalyst `TypedImperativeAggregate` merging sparse
  * (idx, count) arrays in the aggregation buffer (Prometheus's
  * FloatHistogram.Add on the reducer path).
  *
  * Why not compose built-ins: the explode → groupBy(group, idx) →
  * collect_list reassembly needs a SECOND aggregation (and a join)
  * for the zero/sum scalars, so the input subtree — at 100 TB, the
  * scan + instant-selector shuffle — is computed twice (column
  * pruning specializes each branch's scan, so ReuseExchange cannot
  * dedup them). This aggregate takes the whole histogram struct in
  * one pass: partial buffers merge map-side, ONE shuffle at group
  * grain, each buffer at most the union of bucket indexes.
  *
  * Input: `struct<zero:double, idx:array<int>, cnt:array<double>,
  * sum:double>` (the PromQL compiler's hist-vector model — counts as
  * double so rate vectors work; `sum` null for sum-less series).
  * Output: the same struct, buckets ascending by idx; `sum` is null
  * if ANY input sum was null. Counts that are integers stay exact in
  * double under any merge order (< 2^53).
  */
case class HistSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistSumAgg.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = HistSumAgg.resultType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): HistSumAgg.Buf = new HistSumAgg.Buf

  override def update(buf: HistSumAgg.Buf, input: InternalRow): HistSumAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.nonEmpty = true
      buf.zero += row.getDouble(0)
      val idx = row.getArray(1)
      val cnt = row.getArray(2)
      var j = 0
      val n = idx.numElements()
      while (j < n) {
        buf.add(idx.getInt(j), cnt.getDouble(j))
        j += 1
      }
      if (row.isNullAt(3)) buf.sawNullSum = true
      else buf.sum += row.getDouble(3)
    }
    buf
  }

  override def merge(buf: HistSumAgg.Buf, other: HistSumAgg.Buf): HistSumAgg.Buf = {
    if (other.nonEmpty) {
      buf.nonEmpty = true
      buf.zero += other.zero
      buf.sum += other.sum
      buf.sawNullSum ||= other.sawNullSum
      val it = other.buckets.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        buf.add(e.getKey, e.getValue)
      }
    }
    buf
  }

  override def eval(buf: HistSumAgg.Buf): Any = {
    if (!buf.nonEmpty) return null
    val n = buf.buckets.size()
    val idx = new Array[Int](n)
    val cnt = new Array[Double](n)
    val it = buf.buckets.entrySet().iterator()
    var j = 0
    while (it.hasNext) { // TreeMap: ascending idx
      val e = it.next()
      idx(j) = e.getKey
      cnt(j) = e.getValue
      j += 1
    }
    InternalRow(buf.zero, new GenericArrayData(idx),
      new GenericArrayData(cnt),
      if (buf.sawNullSum) null else java.lang.Double.valueOf(buf.sum))
  }

  override def serialize(buf: HistSumAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.nonEmpty)
    out.writeBoolean(buf.sawNullSum)
    out.writeDouble(buf.zero)
    out.writeDouble(buf.sum)
    out.writeInt(buf.buckets.size())
    val it = buf.buckets.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey)
      out.writeDouble(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HistSumAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HistSumAgg.Buf
    buf.nonEmpty = in.readBoolean()
    buf.sawNullSum = in.readBoolean()
    buf.zero = in.readDouble()
    buf.sum = in.readDouble()
    var n = in.readInt()
    while (n > 0) {
      val k = in.readInt()
      buf.buckets.put(k, in.readDouble())
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSumAgg =
    copy(child = newChild)
}

object HistSumAgg {
  val resultType: StructType = StructType(Seq(
    StructField("zero", DoubleType, nullable = false),
    StructField("idx", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("cnt", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("sum", DoubleType, nullable = true)))

  /** Mutable aggregation state: zero/sum accumulators + a sorted
    * sparse bucket map. */
  final class Buf {
    var nonEmpty: Boolean = false
    var sawNullSum: Boolean = false
    var zero: Double = 0.0
    var sum: Double = 0.0
    val buckets = new java.util.TreeMap[Integer, java.lang.Double]()
    def add(i: Int, c: Double): Unit = {
      val prev = buckets.get(Integer.valueOf(i))
      buckets.put(Integer.valueOf(i),
        java.lang.Double.valueOf((if (prev == null) 0.0 else prev.doubleValue()) + c))
    }
  }
}
