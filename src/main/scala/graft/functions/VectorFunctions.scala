package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding
  * columns, built entirely from codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs, stays inside whole-stage
  * codegen, and the fold is sequential in index order so results are
  * bit-reproducible across engines.
  */
object VectorFunctions {

  /** Cast to array<double> so accumulation is double-precision. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — native codegen'd loop ([[VectorExpressions]]);
    * same ascending-index sum order as the HOF formulation it
    * replaced, so engine-vs-oracle comparisons are unchanged.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm guard: a degenerate (all-zero/padded) vector must
    * score 0 against everything, not NaN — Spark sorts NaN ABOVE
    * every double, so an unguarded 0/0 would rank the broken vector
    * as the #1 neighbor of every query it joins with.
    */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), norm(a), norm(b))

  /** [[cosine]] with the two side norms precomputed — for PAIRWISE
    * joins, where inlining `cosine(a.v, b.v)` recomputes
    * `sqrt(dot(v,v))` once per PAIR instead of once per ROW (two
    * thirds of the join's flops at any candidate count). Same IEEE
    * ops in the same order (`na * nb`, the zero-denominator guard,
    * one division), so scores are bit-identical to the inline form.
    */
  def cosineWithNorms(dotAB: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, 0.0).otherwise(dotAB / denom)
  }

  /** Signed bit of a deterministic random hyperplane: sign of
    * sum_i v_i * r_{p,i} with pseudo-random ±1 weights derived from
    * xxhash64(dim, plane) — no stored plane matrix, reproducible on
    * any cluster, and cheap enough to fuse into the scan.
    */
  def hyperplaneBit(v: Column, plane: Int): Column = {
    val signed = zip_with(
      v,
      transform(sequence(lit(0), size(v) - 1),
        i => when(pmod(xxhash64(i, lit(plane)), lit(2)) === 0, 1.0).otherwise(-1.0)),
      (x, s) => x * s)
    val s = aggregate(signed, lit(0.0), (acc, x) => acc + x)
    when(s >= 0, 1L).otherwise(0L)
  }

  /** LSH bucket id from `nPlanes` hyperplane bits packed into a long —
    * native one-pass expression ([[VectorExpressions.lshBucketNative]]);
    * bit-identical to [[lshBucketHof]], which it replaced in the hot
    * path (VectorFunctionsSpec pins the equivalence).
    */
  def lshBucket(v: Column, nPlanes: Int): Column =
    VectorExpressions.lshBucketNative(v, nPlanes)

  /** Reference HOF formulation of [[lshBucket]], kept as the
    * executable spec of the bucket function.
    */
  def lshBucketHof(v: Column, nPlanes: Int): Column =
    (0 until nPlanes)
      .map(p => hyperplaneBit(v, p) * lit(1L << p))
      .reduce(_ + _)
}
