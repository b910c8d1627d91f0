package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query
  * set against the corpus, rank by cosine. The corpus side streams —
  * no shuffle of the 100 TB side at all; per-query top-k is a window
  * over query_id (query-count-bounded cardinality).
  *
  * `lshTopK` is the scale path: hyperplane-LSH bucket both sides and
  * only score within matching buckets (multi-probe = exact-match
  * probing here), trading recall for a corpus-×-queries → bucket-
  * local join.
  */
object Ann {

  def bruteForce(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    // norms once per ROW before the pair join (cosineWithNorms doc)
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .withColumn("_nn", norm(col("nv")))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("_qn", norm(col("qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosineWithNorms(dot(col("qv"), col("nv")),
          col("_qn"), col("_nn")).as("sim"))
    topK(scored, k)
  }

  /** IVF (inverted-file) ANN — the second scale path next to
    * hyperplane LSH. Coarse quantizer: `nCentroids` vectors picked
    * deterministically by hash order (a k-means refinement would
    * drop in here; the plumbing is identical) and collected to the
    * driver — the quantizer is metadata-scale BY DESIGN, exactly as
    * IVF indexes ship their centroid table everywhere. Assignment is
    * then a pure projection (argmax over literal-centroid dot
    * products — codegen'd, zero shuffle over the corpus); queries
    * probe their `nProbe` best cells and only score corpus rows in
    * those cells (join key = cell id).
    */
  /** Best cell for one vector against the current centroid set —
    * the local mirror of the `array_max(cellScoresFor(...))`
    * assignment projection: max cosine, ties resolved to the LARGER
    * cell index exactly as `array_max` over `struct(score, cell)`
    * compares lexicographically.
    */
  private def bestCellLocal(v: Array[Double], nv: Double,
      cents: Array[Array[Double]], cnorms: Array[Double]): Int = {
    var best = 0; var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      var d = 0.0; var j = 0; val c = cents(i)
      while (j < v.length) { d += v(j) * c(j); j += 1 }
      val s = d / (nv * cnorms(i))
      if (s >= bestScore) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  /** Driver-local Lloyd refinement of the IVF quantizer over the
    * collected train sample: assign each sample vector to its best
    * cell by cosine, recompute centroids as per-dimension means,
    * stop when no centroid moves more than `tol` (L2) or after
    * `maxIters`. Then split over-populated cells (any cell holding
    * more than `splitFactor`× the mean donates its farthest member
    * as a new centroid — hot cells are where IVF recall and probe
    * cost degrade) and briefly re-converge.
    *
    * Local BY DESIGN: a quantizer is metadata (nCentroids × dim
    * doubles) and its training set is a bounded sample — the same
    * shape as any production IVF build, which trains the coarse
    * quantizer in memory and only ASSIGNS at corpus scale. Running
    * Lloyd as Spark jobs (the previous formulation) cost one
    * cluster-wide aggregation per iteration to compute what is,
    * after sampling, a driver-sized reduction.
    */
  private[graft] def trainQuantizer(sample: Array[Array[Double]],
      seeds: Array[Seq[Double]], maxIters: Int, tol: Double = 5e-3,
      splitFactor: Double = 4.0): Array[Seq[Double]] = {
    val norms = sample.map(v => math.sqrt(v.map(x => x * x).sum).max(1e-300))
    def lloyd(init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
      var cur = init
      var it = 0
      var moved = Double.MaxValue
      while (it < iters && moved > tol) {
        val cnorms = cur.map(c => math.sqrt(c.map(x => x * x).sum).max(1e-300))
        val sums = Array.fill(cur.length)(new Array[Double](sample.head.length))
        val counts = new Array[Long](cur.length)
        var r = 0
        while (r < sample.length) {
          val cell = bestCellLocal(sample(r), norms(r), cur, cnorms)
          counts(cell) += 1
          val s = sums(cell); val v = sample(r)
          var j = 0
          while (j < v.length) { s(j) += v(j); j += 1 }
          r += 1
        }
        // empty cells keep their previous centroid
        val next = cur.indices.map { i =>
          if (counts(i) == 0) cur(i) else sums(i).map(_ / counts(i))
        }.toArray
        moved = cur.zip(next).map { case (a, b) =>
          math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        }.max
        cur = next
        it += 1
      }
      cur
    }
    val refined = lloyd(seeds.map(_.toArray), maxIters)
    // split pass: per-cell population + farthest (min-cosine) member
    val cnorms = refined.map(c => math.sqrt(c.map(x => x * x).sum).max(1e-300))
    val counts = new Array[Long](refined.length)
    val farScore = Array.fill(refined.length)(Double.MaxValue)
    val farVec = new Array[Array[Double]](refined.length)
    var r = 0
    while (r < sample.length) {
      val cell = bestCellLocal(sample(r), norms(r), refined, cnorms)
      counts(cell) += 1
      var d = 0.0; var j = 0; val v = sample(r); val c = refined(cell)
      while (j < v.length) { d += v(j) * c(j); j += 1 }
      val s = d / (norms(r) * cnorms(cell))
      if (s < farScore(cell)) { farScore(cell) = s; farVec(cell) = v }
      r += 1
    }
    val meanN = counts.sum.toDouble / refined.length.max(1)
    val extra = refined.indices
      .filter(i => counts(i) > splitFactor * meanN).map(farVec)
    val split =
      if (extra.nonEmpty) lloyd(refined ++ extra, math.min(maxIters, 3))
      else refined
    split.map(_.toSeq)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      refineIters: Int = 8, trainFraction: Double = 1.0,
      maxTrainVectors: Int = 1 << 17): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    // quantizer TRAINING runs on a bounded sample — the standard IVF
    // build (a quantizer is a coarse partitioner; its quality is
    // statistical, not per-row). At 100 TB you train on a fixed-seed
    // sample capped at `maxTrainVectors` and assign the full corpus
    // once. The cap is enforced distributed (TakeOrdered on the
    // deterministic hash order — bounded memory everywhere), so ONE
    // job collects the whole training set and the only other
    // full-corpus pass is the final assignment projection.
    val train =
      if (trainFraction < 1.0) corpus.sample(false, trainFraction, 42L)
      else corpus
    val sample = train
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .orderBy(xxhash64(col("nid")), col("nid"))
      .limit(maxTrainVectors)
      .select(col("nv")).collect()
      .map(_.getSeq[Double](0).toArray)
    // seeds = first nCentroids in the same hash order (unchanged)
    val seeds = sample.take(nCentroids).map(_.toSeq: Seq[Double])
    val centroidRows =
      if (refineIters > 0 && sample.nonEmpty)
        trainQuantizer(sample, seeds, refineIters)
      else seeds
    // best-cell assignment and probe list as NATIVE expressions
    // ([[graft.functions.IvfBestCell]]/[[graft.functions.IvfProbeCells]]
    // — the centroid table rides as a plain parameter, ONE plan node
    // instead of a per-centroid struct/cosine literal tree; argmax and
    // probe-order tie-breaks replicate the array_max /
    // reverse(array_sort) forms exactly, AnnSpec pins it)
    val centSeq: Seq[Seq[Double]] = centroidRows.toSeq
    val assigned = c.withColumn("cell",
      graft.functions.IvfBestCell.bestCell(col("nv"), centSeq))
    val probed = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(graft.functions.IvfProbeCells.probeCells(
          col("qv"), centSeq, nProbe)))
    // no pair dedup needed: each corpus row sits in exactly ONE cell
    // and the probe list is distinct per query, so (qid, nid) can
    // match at most once — a dropDuplicates here would add a second
    // corpus-scale exchange for zero semantic effect
    val scored = assigned.withColumn("_nn", norm(col("nv")))
      .join(broadcast(probed.withColumn("_qn", norm(col("qv")))), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosineWithNorms(dot(col("qv"), col("nv")),
          col("_qn"), col("_nn")).as("sim"))
    topK(scored, k)
  }

  /** Driver-local L2 Lloyd for the PQ codebooks: one independent
    * k-means per subspace over the residual subvectors. Assignment
    * ties resolve to the LATER code (`>=` walk), mirroring the Spark
    * `array_max(struct(score, code))` assignment so training and
    * corpus encoding agree. Empty codes keep their previous centroid.
    */
  private[graft] def trainPqCodebooks(resid: Array[Array[Double]],
      nSub: Int, codebookSize: Int, iters: Int = 10): Array[Array[Array[Double]]] = {
    val dim = resid.head.length
    require(dim % nSub == 0,
      s"PQ needs dim ($dim) divisible by nSub ($nSub)")
    val subDim = dim / nSub
    Array.tabulate(nSub) { mi =>
      val subs = resid.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
      // value-level dedup (Array equals is reference equality): seed
      // from distinct subvectors so duplicate samples can't produce
      // twin centroids that starve each other under the >= tie rule
      var cur = subs.map(_.toVector).distinct.take(codebookSize)
        .map(_.toArray)
      if (cur.isEmpty) cur = Array(new Array[Double](subDim))
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cur.length)(new Array[Double](subDim))
        val counts = new Array[Long](cur.length)
        var r = 0
        while (r < subs.length) {
          val v = subs(r)
          // argmax (v·cb − |cb|²/2) ≡ argmin L2; >= keeps the later
          // code on ties, matching array_max's lexicographic struct
          var best = 0; var bestScore = Double.NegativeInfinity
          var ki = 0
          while (ki < cur.length) {
            val cb = cur(ki)
            var d = 0.0; var n2 = 0.0; var j = 0
            while (j < subDim) { d += v(j) * cb(j); n2 += cb(j) * cb(j); j += 1 }
            val s = d - 0.5 * n2
            if (s >= bestScore) { bestScore = s; best = ki }
            ki += 1
          }
          counts(best) += 1
          val s = sums(best)
          var j = 0
          while (j < subDim) { s(j) += v(j); j += 1 }
          r += 1
        }
        cur = cur.indices.map { ki =>
          if (counts(ki) == 0) cur(ki) else sums(ki).map(_ / counts(ki))
        }.toArray
        it += 1
      }
      cur
    }
  }

  /** IVF-PQ — the MEMORY-scale ANN path (the IndexIVFPQ design of
    * Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the stored index row is one cell id plus
    * `nSub` small codes (nSub bytes at codebookSize ≤ 256) instead
    * of D floats — ~50× smaller than the raw vectors, which is what
    * makes the scan side of ANN affordable at 100 TB. Vectors are
    * unit-normalized so cosine = inner product; each vector's
    * RESIDUAL against its cell centroid is product-quantized with
    * per-subspace codebooks (residual PQ — the faiss default,
    * tighter than raw-vector PQ because residual norms are small).
    *
    * Search is two-stage, both stages shuffle-free on the corpus:
    * 1. ADC (asymmetric distance computation): for corpus rows in
    *    the query's `nProbe` best cells, approx similarity =
    *    q·centroid[cell] + Σ_m q_m·codebook_m[code_m] — every
    *    lookup a literal-array index, fully codegen'd; the per-query
    *    top `rerank` candidates survive (one bounded window).
    * 2. Exact re-score of just those candidates (queries × rerank
    *    rows) against the raw vectors via a broadcast join back by
    *    id — the point-lookup fetch a production index does.
    * With `rerank` ≥ a few × k, PQ's quantization error affects only
    * candidate ORDER inside probed cells, and the exact stage
    * restores true cosine ranking.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      nSub: Int = 8, codebookSize: Int = 16, rerank: Int = 0,
      refineIters: Int = 8, trainFraction: Double = 1.0,
      maxTrainVectors: Int = 1 << 17): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    // --- train (bounded sample, driver-local — the ivfTopK contract)
    val train =
      if (trainFraction < 1.0) corpus.sample(false, trainFraction, 42L)
      else corpus
    val sample = train
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .orderBy(xxhash64(col("nid")), col("nid"))
      .limit(maxTrainVectors)
      .select(col("nv")).collect()
      .map { r =>
        val v = r.getSeq[Double](0).toArray
        val n = math.sqrt(v.map(x => x * x).sum).max(1e-300)
        v.map(_ / n)
      }
    val seeds = sample.take(nCentroids).map(_.toSeq: Seq[Double])
    val cents =
      if (refineIters > 0 && sample.nonEmpty)
        trainQuantizer(sample, seeds, refineIters)
      else seeds
    val centsA = cents.map(_.toArray)
    val cnorms = centsA.map(cv => math.sqrt(cv.map(x => x * x).sum).max(1e-300))
    val resid = sample.map { v =>
      val cell = bestCellLocal(v, 1.0, centsA, cnorms)
      v.indices.map(j => v(j) - centsA(cell)(j)).toArray
    }
    val books =
      if (resid.nonEmpty) trainPqCodebooks(resid, nSub, codebookSize)
      else Array.fill(nSub)(Array(new Array[Double](1)))
    // --- index-side NATIVE expressions (zero shuffle). The centroid
    // and codebook tables ride as plain parameters of single-node
    // expressions ([[graft.functions.IvfPqEncode]] /
    // [[graft.functions.IvfPqAdc]]) instead of nested literals walked
    // by HOF lambdas: the per-row loops are identical arithmetic in
    // identical order (AnnSpec pins the equivalence), but the plan
    // carries a handful of nodes instead of thousands — Catalyst and
    // AQE re-optimization stop dominating the stage, and the loops
    // run compiled instead of per-element interpreted dispatch.
    val centSeq: Seq[Seq[Double]] = cents.toSeq
    val bookSeq: Seq[Seq[Seq[Double]]] = books.map(_.map(_.toSeq).toSeq).toSeq
    // index build: ONE corpus pass ending in (id, cell, codes) — the
    // persisted form at scale; raw vectors stay behind in the table
    val assigned = c
      .withColumn("_enc",
        graft.functions.IvfPqEncode.encode(col("nv"), centSeq, bookSeq))
      .select(col("nid"), col("_enc.cell").as("cell"),
        col("_enc.codes").as("codes"))
    // --- search (queries are broadcast-scale: the HOF normalization
    // stays, it runs once per query row)
    val qN = q
      .withColumn("_n", greatest(sqrt(dot(col("qv"), col("qv"))), lit(1e-300)))
      .withColumn("qvh", transform(col("qv"), x => x / col("_n")))
    val probed = qN.withColumn("cell",
        explode(graft.functions.IvfProbeCells.probeCells(
          col("qvh"), centSeq, nProbe)))
      .select(col("qid"), col("qvh"), col("cell"))
    val adc = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("approx", graft.functions.IvfPqAdc.adc(
        col("qvh"), col("cell"), col("codes"), centSeq, bookSeq))
    val rr = if (rerank > 0) rerank else 8 * k
    val wc = Window.partitionBy("qid").orderBy(col("approx").desc, col("nid"))
    val cand = adc.withColumn("_cr", row_number().over(wc))
      .filter(col("_cr") <= rr)
      .select("qid", "nid")
    val exact = c.withColumn("_nn", norm(col("nv")))
      .join(broadcast(cand), Seq("nid"))
      .join(broadcast(q.withColumn("_qn", norm(col("qv")))), Seq("qid"))
      .select(col("qid"), col("nid"),
        cosineWithNorms(dot(col("qv"), col("nv")),
          col("_qn"), col("_nn")).as("sim"))
    topK(exact, k)
  }

  /** Per-query top-k with a cross-engine-deterministic order: rank on
    * the 6-dp-rounded similarity (immune to last-ulp fp differences)
    * with the neighbor id as total-order tiebreak.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(round(col("sim"), 6).desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Bucketed ANN. `multiProbe=true` additionally probes every
    * 1-bit-flip neighbor of each query's bucket — the standard
    * multi-probe LSH recall boost. The expansion happens on the
    * (small, broadcast) query side only: the 100 TB corpus is still
    * scanned once and joined bucket-local, so recall costs nothing
    * on the big side.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nPlanes: Int = 8,
      multiProbe: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"),
      lshBucket(asDouble(col(vecCol)), nPlanes).as("bucket"))
    val q0 = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
      lshBucket(asDouble(col(vecCol)), nPlanes).as("bucket"))
    val q =
      if (!multiProbe) q0
      else q0.select(col("qid"), col("qv"),
          explode(array((col("bucket") +: (0 until nPlanes).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("bucket"))
        .dropDuplicates("qid", "bucket")
    // no pair dedup needed: each corpus row has exactly ONE bucket
    // and the probed (qid, bucket) side is distinct, so (qid, nid)
    // matches at most once — dropping duplicates would re-shuffle
    // the corpus-scale join output for nothing
    val scored = c.withColumn("_nn", norm(col("nv")))
      .join(broadcast(q.withColumn("_qn", norm(col("qv")))), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosineWithNorms(dot(col("qv"), col("nv")),
          col("_qn"), col("_nn")).as("sim"))
    topK(scored, k)
  }
}
