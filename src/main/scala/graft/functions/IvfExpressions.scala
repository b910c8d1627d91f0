package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the IVF / IVF-PQ hot path.
  *
  * The Column formulation built one `struct(cosine(v, lit(centᵢ)),
  * i)` per centroid (and one nested HOF loop per PQ subspace) — at 16+
  * centroids × 64-dim literals that is a THOUSANDS-of-node expression
  * tree. The per-row arithmetic was never the bottleneck at this
  * fixture size; the tree was: Catalyst re-optimizes it per AQE stage
  * and the interpreted HOF lambdas (`transform`/`aggregate` are not
  * whole-stage-codegen'd) pay per-element dispatch on every row.
  * These expressions carry the centroid/codebook tables as PLAIN
  * SCALA PARAMETERS (one leaf node each) and run tight loops.
  *
  * Exactness contract (spec-pinned against the Column forms):
  *   - cosine matches [[VectorFunctions.cosine]]: ascending-index dot
  *     folds, `when(denom === 0.0, 0.0)` zero guard;
  *   - argmax/sort tie-breaks replicate `array_max` /
  *     `reverse(array_sort(...))` over `struct(score, cell)` —
  *     lexicographic with SPARK double ordering (NaN above all,
  *     NaN == NaN, -0.0 == 0.0), so equal scores resolve to the
  *     LARGER cell/code index;
  *   - PQ scores are `dot(sub, cb) − 0.5·Σcb²` with the half-norms
  *     precomputed by the same ascending Scala fold the literal table
  *     used;
  *   - the ADC sum runs `0.0 + term₀ + term₁ + …` in ascending
  *     subspace order, then `centroid-dot + Σ` — the HOF
  *     `aggregate`'s exact IEEE op sequence.
  */
private[graft] object IvfCore {

  /** Spark SQL total-order compare for doubles (NaN largest,
    * NaN == NaN, -0.0 == 0.0) — `nanSafeCompareDoubles`.
    */
  def cmp(x: Double, y: Double): Int =
    if (x == y) 0 // covers -0.0 == 0.0
    else if (java.lang.Double.isNaN(x) && java.lang.Double.isNaN(y)) 0
    else if (java.lang.Double.isNaN(x)) 1
    else if (java.lang.Double.isNaN(y)) -1
    else if (x < y) -1 else 1

  def dotArr(v: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < c.length) { s += v.getDouble(j) * c(j); j += 1 }
    s
  }

  def normOf(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var j = 0
    while (j < n) { val x = v.getDouble(j); s += x * x; j += 1 }
    math.sqrt(s)
  }

  /** cosine(v, cent) exactly as [[VectorFunctions.cosine]]. */
  def cosineTo(v: ArrayData, normV: Double, cent: Array[Double],
      normC: Double): Double = {
    val denom = normV * normC
    if (denom == 0.0) 0.0 else dotArr(v, cent) / denom
  }

  def centArrays(cents: Seq[Seq[Double]]): Array[Array[Double]] =
    cents.map(_.toArray).toArray

  /** norm via the same ascending `.sum` fold the literal path used. */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))
}

/** `array_max(cellScores(v)).getField("cell")` as one native loop:
  * the centroid index with the lexicographically largest
  * (cosine, index) pair.
  */
case class IvfBestCell(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val centsA = IvfCore.centArrays(cents)
  @transient private lazy val normsA = IvfCore.norms(centsA)

  override def nullSafeEval(a: Any): Any =
    IvfBestCell.compute(a.asInstanceOf[ArrayData], centsA, normsA)

  // codegen: reference this expression instance's tables via ctx
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsA, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normsA, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.IvfBestCell.compute($a, $centsRef, $normsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfBestCell =
    copy(child = newChild)

  override def prettyName: String = "graft_ivf_best_cell"
}

object IvfBestCell {
  import IvfCore._

  def compute(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double]): Int = {
    val nv = normOf(v)
    var best = 0
    var bestScore = cosineTo(v, nv, cents(0), norms(0))
    var i = 1
    while (i < cents.length) {
      val s = cosineTo(v, nv, cents(i), norms(i))
      // lexicographic (score, cell) max: later cell wins ties
      if (cmp(s, bestScore) >= 0) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  def bestCell(v: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(IvfBestCell(ColumnBridge.expression(v), cents))
}

/** `transform(slice(reverse(array_sort(cellScores(v))), 1, nProbe),
  * s -> s.cell)` as one native loop: the `nProbe` centroid indexes in
  * descending (cosine, index) order.
  */
case class IvfProbeCells(child: Expression, cents: Seq[Seq[Double]],
    nProbe: Int) extends UnaryExpression {

  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val centsA = IvfCore.centArrays(cents)
  @transient private lazy val normsA = IvfCore.norms(centsA)

  override def nullSafeEval(a: Any): Any =
    IvfProbeCells.compute(a.asInstanceOf[ArrayData], centsA, normsA, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsA, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normsA, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.IvfProbeCells.compute($a, $centsRef, $normsRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)

  override def prettyName: String = "graft_ivf_probe_cells"
}

object IvfProbeCells {
  import IvfCore._

  def compute(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], nProbe: Int): ArrayData = {
    val nv = normOf(v)
    val n = cents.length
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) { scores(i) = cosineTo(v, nv, cents(i), norms(i)); i += 1 }
    val order = Array.range(0, n)
    // descending (score, cell); cells are distinct so this is total
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val c = cmp(scores(b.intValue()), scores(a.intValue()))
      if (c != 0) c else Integer.compare(b.intValue(), a.intValue())
    })
    val k = math.min(nProbe, n)
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = boxed(j).intValue(); j += 1 }
    new GenericArrayData(out)
  }

  def probeCells(v: Column, cents: Seq[Seq[Double]], nProbe: Int): Column =
    ColumnBridge.column(IvfProbeCells(ColumnBridge.expression(v), cents, nProbe))
}

/** Unit-normalized vector and PQ encoding in one pass:
  * `struct(cell, codes)` for a RAW corpus vector — normalization
  * (`x / max(sqrt(Σx²), 1e-300)`), best-cell assignment, residual
  * against the cell centroid, and per-subspace argmax
  * (`dot(sub, cb) − halfNorm`, later code wins ties) — replacing the
  * `unit`/`bestCell`/`zip_with`-residual/`pqCodes` Column chain.
  */
case class IvfPqEncode(child: Expression, cents: Seq[Seq[Double]],
    books: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false))))

  @transient private lazy val centsA = IvfCore.centArrays(cents)
  @transient private lazy val normsA = IvfCore.norms(centsA)
  @transient private lazy val booksA = IvfPqEncode.bookArrays(books)
  @transient private lazy val halfA = IvfPqEncode.halfNorms(booksA)

  override def nullSafeEval(a: Any): Any =
    IvfPqEncode.compute(a.asInstanceOf[ArrayData], centsA, normsA,
      booksA, halfA)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsA, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normsA, "double[]")
    val booksRef = ctx.addReferenceObj("books", booksA, "double[][][]")
    val halfRef = ctx.addReferenceObj("half", halfA, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.IvfPqEncode.compute($a, $centsRef, $normsRef, $booksRef, $halfRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_ivf_pq_encode"
}

object IvfPqEncode {
  import IvfCore._
  import org.apache.spark.sql.catalyst.InternalRow

  def bookArrays(books: Seq[Seq[Seq[Double]]]): Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  /** `0.5 * cb.map(x => x*x).sum` — the literal table's exact fold. */
  def halfNorms(books: Array[Array[Array[Double]]]): Array[Array[Double]] =
    books.map(_.map(cb => 0.5 * cb.map(x => x * x).sum))

  def unitOf(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val arr = new Array[Double](n)
    var s = 0.0
    var j = 0
    while (j < n) { val x = v.getDouble(j); arr(j) = x; s += x * x; j += 1 }
    // greatest(sqrt(dot), 1e-300): norms are non-negative, and a NaN
    // norm propagates through the division exactly like `greatest`
    // (NaN sorts largest) would
    val nm = {
      val r = math.sqrt(s)
      if (java.lang.Double.isNaN(r)) r else math.max(r, 1e-300)
    }
    var i = 0
    while (i < n) { arr(i) = arr(i) / nm; i += 1 }
    arr
  }

  def bestCellOf(v: Array[Double], cents: Array[Array[Double]],
      norms: Array[Double]): Int = {
    // cosine over the already-unit vector: same expression tree as the
    // Column path, which normalized first and then ran cosine(nvh, c)
    var nv = 0.0
    var j = 0
    while (j < v.length) { nv += v(j) * v(j); j += 1 }
    val normV = math.sqrt(nv)
    var best = 0
    var bestScore = {
      val denom = normV * norms(0)
      if (denom == 0.0) 0.0 else {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * cents(0)(i); i += 1 }
        d / denom
      }
    }
    var ci = 1
    while (ci < cents.length) {
      val denom = normV * norms(ci)
      val s = if (denom == 0.0) 0.0 else {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * cents(ci)(i); i += 1 }
        d / denom
      }
      if (cmp(s, bestScore) >= 0) { bestScore = s; best = ci }
      ci += 1
    }
    best
  }

  def compute(raw: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], books: Array[Array[Array[Double]]],
      half: Array[Array[Double]]): InternalRow = {
    val v = unitOf(raw)
    val cell = bestCellOf(v, cents, norms)
    val cent = cents(cell)
    val nSub = books.length
    val subDim = if (nSub == 0) 0 else v.length / nSub
    val codes = new Array[Any](nSub)
    var mi = 0
    while (mi < nSub) {
      val base = mi * subDim
      val book = books(mi)
      val hn = half(mi)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var first = true
      var ki = 0
      while (ki < book.length) {
        val cb = book(ki)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          d += (v(base + j) - cent(base + j)) * cb(j)
          j += 1
        }
        val s = d - hn(ki)
        if (first || cmp(s, bestScore) >= 0) {
          bestScore = s; best = ki; first = false
        }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    InternalRow(cell, new GenericArrayData(codes))
  }

  def encode(v: Column, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(IvfPqEncode(ColumnBridge.expression(v), cents, books))
}

/** The ADC (asymmetric distance) score for one (query, index-row)
  * pair: `dot(qvh, cents[cell]) + Σ_mi dot(qvh_sub(mi),
  * books[mi][codes[mi]])`, left-assoc from 0.0 in ascending subspace
  * order — the `aggregate` HOF's exact IEEE sequence. Children:
  * (qvh, cell, codes).
  */
case class IvfPqAdc(qvh: Expression, cell: Expression, codes: Expression,
    cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = qvh
  override def second: Expression = cell
  override def third: Expression = codes

  override def dataType: DataType = DoubleType

  @transient private lazy val centsA = IvfCore.centArrays(cents)
  @transient private lazy val booksA = IvfPqEncode.bookArrays(books)

  override def nullSafeEval(q: Any, c: Any, k: Any): Any =
    IvfPqAdc.compute(q.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], k.asInstanceOf[ArrayData], centsA, booksA)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsA, "double[][]")
    val booksRef = ctx.addReferenceObj("books", booksA, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c, k) => {
      s"${ev.value} = graft.functions.IvfPqAdc.compute($q, $c, $k, $centsRef, $booksRef);"
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): IvfPqAdc =
    copy(qvh = newFirst, cell = newSecond, codes = newThird)

  override def prettyName: String = "graft_ivf_pq_adc"
}

object IvfPqAdc {
  import IvfCore._

  def compute(qvh: ArrayData, cell: Int, codes: ArrayData,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]]): Double = {
    val centDot = dotArr(qvh, cents(cell))
    val nSub = books.length
    val subDim = if (nSub == 0) 0 else cents(cell).length / nSub
    var acc = 0.0
    var mi = 0
    while (mi < nSub) {
      val cb = books(mi)(codes.getInt(mi))
      val base = mi * subDim
      var d = 0.0
      var j = 0
      while (j < subDim) { d += qvh.getDouble(base + j) * cb(j); j += 1 }
      acc = acc + d
      mi += 1
    }
    centDot + acc
  }

  def adc(qvh: Column, cell: Column, codes: Column, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(IvfPqAdc(ColumnBridge.expression(qvh),
      ColumnBridge.expression(cell), ColumnBridge.expression(codes),
      cents, books))
}
