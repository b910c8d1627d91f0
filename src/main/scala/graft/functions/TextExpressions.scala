package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the shingling hot path.
  *
  * The SQL formulation (`transform(sequence(1, L-n+1), p ->
  * substring(text, p, n))`) calls `substring` once per position, and
  * UTF8String's substring walks codepoints from byte 0 on every call
  * — O(L²) per document. A 100 kB document is 10¹⁰ byte steps in one
  * task; even the 300-char corpus here spent ~2 s/pass on it. This
  * expression walks the string ONCE, records codepoint boundaries,
  * and emits every n-gram as a byte-range slice — O(L + k·n), with
  * optional in-row dedup (a LinkedHashSet) so SET semantics cost no
  * corpus-wide `distinct` exchange at all.
  *
  * Short-document semantics match the SQL version exactly: a
  * document with fewer than `n` codepoints yields ONE shingle — the
  * whole document (`substring(text, 1, n)` of a short string).
  */
case class NgramShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "shingle width must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    NgramShingles.compute(a.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.NgramShingles.compute($a, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_shingles"
}

object NgramShingles {

  /** Static entry for generated code: one pass, byte-range slices. */
  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // codepoint start offsets (+ end sentinel)
    val off = new Array[Int](len + 1)
    var i = 0
    var m = 0
    while (i < len) {
      off(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    off(m) = len
    val k = m - n + 1
    if (k <= 0) return new GenericArrayData(Array[Any](s))
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](k * 2)
      var j = 0
      while (j < k) {
        seen.add(UTF8String.fromBytes(bytes, off(j), off(j + n) - off(j)))
        j += 1
      }
      new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
    } else {
      val arr = new Array[Any](k)
      var j = 0
      while (j < k) {
        arr(j) = UTF8String.fromBytes(bytes, off(j), off(j + n) - off(j))
        j += 1
      }
      new GenericArrayData(arr)
    }
  }

  /** Column API: array of n-gram shingles (all occurrences). */
  def ngramShingles(text: Column, n: Int): Column =
    ColumnBridge.column(NgramShingles(ColumnBridge.expression(text), n, distinct = false))

  /** Column API: array of DISTINCT n-gram shingles, first-occurrence
    * order — per-row set semantics, no shuffle.
    */
  def ngramShingleSet(text: Column, n: Int): Column =
    ColumnBridge.column(NgramShingles(ColumnBridge.expression(text), n, distinct = true))
}
