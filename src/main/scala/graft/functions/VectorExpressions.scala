package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * is semantically right but evaluates a lambda per element — at
  * N² candidate pairs × 64 dims that interpreter overhead dominates
  * the whole dedup/ANN stage. This expression compiles to a tight
  * primitive `double` loop inside whole-stage codegen: no lambda, no
  * boxing, no per-element virtual calls.
  *
  * Sum order is ascending index on both the codegen and interpreted
  * paths — the same left-to-right fold as the HOF version and as
  * DuckDB's list_inner_product, so oracle comparisons stay exact.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // null on length mismatch (and on null elements), like the
  // zip_with/aggregate HOF this replaces — never a silent
  // min-length sum, which would yield plausible-but-wrong scores
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // the per-element null check is only emitted when the input
      // array types can actually hold nulls; parquet-sourced
      // non-null embeddings keep the tight two-load loop
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Packed hyperplane-LSH bucket id for a double vector, computed in
  * one pass: bit p of the result is the sign of Σᵢ vᵢ·rₚᵢ where the
  * pseudo-random ±1 weight rₚᵢ is derived from the same xxhash64
  * chain the HOF formulation used (`xxhash64(i, plane)` with Spark's
  * seed 42), so bucket values are BIT-IDENTICAL to the old
  * `zip_with`/`aggregate` version — only ~nPlanes× faster per row,
  * with no per-element lambda dispatch. The per-row map over every
  * corpus vector is exactly the hot loop that matters at 100 TB.
  */
case class HyperplaneBucket(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  // one long holds the bucket: plane p sets bit p, and 1L << p
  // silently wraps mod 64 beyond that — reject instead of aliasing
  // unrelated hyperplanes onto the same bit
  require(nPlanes >= 1 && nPlanes <= 64,
    s"nPlanes must be in [1,64] (bits of one long bucket), got $nPlanes")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneBucket.compute(a.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HyperplaneBucket.compute($a, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bucket"
}

object HyperplaneBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  // The ±1 sign for (plane, dim) is a row-independent constant —
  // cache the table per (nPlanes, dim) so the per-row loop is array
  // loads, not 2 hash calls per element (the tablesFor pattern
  // MinHashSignature uses).
  private val signTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signsFor(nPlanes: Int, dim: Int): Array[Array[Double]] =
    signTables.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      Array.tabulate(np, d) { (p, i) =>
        // same chain as xxhash64(i, lit(p)): seed 42, then fold p
        val h = XXH64.hashInt(p, XXH64.hashInt(i, 42L))
        if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
      }
    })

  /** Static entry for generated code: one tight loop per row. */
  def compute(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    val signs = signsFor(nPlanes, n)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val row = signs(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getDouble(i) * row(i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[HyperplaneBucket]]. */
  def lshBucketNative(v: Column, nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(v), nPlanes))
}
