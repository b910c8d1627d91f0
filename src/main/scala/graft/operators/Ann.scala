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
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
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
  /** Per-row array of (cosine-to-centroid, cell id) for a centroid
    * set baked in as literals — the zero-shuffle assignment
    * projection shared by refinement, splitting, and probing.
    */
  private def cellScoresFor(cents: Array[Seq[Double]])(v: Column): Column =
    array(cents.zipWithIndex.map { case (cv, i) =>
      struct(cosine(v, typedLit(cv)).as("score"), lit(i).as("cell"))
    }: _*)

  /** Lloyd refinement of an IVF quantizer: assign every corpus
    * vector to its best cell (the same zero-shuffle argmax projection
    * ivfTopK uses), then recompute each centroid as the per-dimension
    * mean of its cell — one posexplode + (cell, dim) aggregation per
    * iteration, collected at centroid×dim (metadata) scale. Exactly
    * the distributed k-means step a production IVF build runs.
    *
    * Runs at most `maxIters` iterations but stops as soon as no
    * centroid moves more than `tol` (L2) — convergence-based, no
    * hand-tuned iteration count.
    */
  def refineCentroids(corpus: DataFrame, vecCol: String,
      centroids: Array[Seq[Double]], maxIters: Int,
      tol: Double = 5e-3): Array[Seq[Double]] = {
    var cur = centroids
    val v = corpus.select(asDouble(col(vecCol)).as("nv"))
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIters && moved > tol) {
      val means = v
        .withColumn("cell", array_max(cellScoresFor(cur)(col("nv"))).getField("cell"))
        .select(col("cell"), posexplode(col("nv")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cell").agg(map_from_arrays(
          collect_list(col("dim")), collect_list(col("m"))).as("dims"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getMap[Int, Double](1).toSeq.sortBy(_._1).map(_._2).toSeq)
        .toMap
      // empty cells keep their previous centroid
      val next = cur.indices.map(i => means.getOrElse(i, cur(i))).toArray
      moved = cur.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      cur = next
      it += 1
    }
    cur
  }

  /** Split over-populated IVF cells: any cell holding more than
    * `factor`× the mean population donates its farthest member (the
    * lowest-cosine vector — found with one min_by aggregation, no
    * sort) as an additional centroid. Oversized cells are where IVF
    * recall and probe cost degrade — a hot cell means its members
    * compete with too many neighbors under one key at query time.
    */
  def splitOversizedCells(corpus: DataFrame, vecCol: String,
      centroids: Array[Seq[Double]],
      factor: Double = 4.0): Array[Seq[Double]] = {
    val v = corpus.select(asDouble(col(vecCol)).as("nv"))
    val stats = v
      .withColumn("best", array_max(cellScoresFor(centroids)(col("nv"))))
      .select(col("best.cell").as("cell"), col("best.score").as("score"), col("nv"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), expr("min_by(nv, score)").as("far"))
      .collect()
    val meanN = stats.map(_.getLong(1)).sum.toDouble / centroids.length.max(1)
    val extra = stats.filter(_.getLong(1) > factor * meanN)
      .map(_.getSeq[Double](2).toSeq)
    centroids ++ extra
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      refineIters: Int = 8, trainFraction: Double = 1.0): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    // quantizer TRAINING can run on a sample — the standard IVF
    // build (a quantizer is a coarse partitioner; its quality is
    // statistical, not per-row). At 100 TB you train on a fixed-seed
    // sample and assign the full corpus once. Seeds come from the
    // SAME sample: before this the only full-corpus passes are the
    // single assignment projection at the end.
    val train =
      if (trainFraction < 1.0) corpus.sample(false, trainFraction, 42L)
      else corpus
    val seeds = train
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .orderBy(xxhash64(col("nid")), col("nid"))
      .limit(nCentroids)
      .select(col("nv")).collect()
      .map(_.getSeq[Double](0).toSeq)
    // converge Lloyd (refineIters is a CAP, the tol stop usually
    // fires first), split hot cells, then a short re-converge — the
    // split centroids only need local settling
    val centroidRows =
      if (refineIters > 0) {
        val refined = refineCentroids(train, vecCol, seeds, refineIters)
        val split = splitOversizedCells(train, vecCol, refined)
        if (split.length > refined.length)
          refineCentroids(train, vecCol, split, math.min(refineIters, 3))
        else refined
      } else seeds
    // per-row array of (cosine-to-centroid, cell); array_max gives the
    // best cell, sorted+sliced gives the probe list — all codegen'd
    def cellScores(v: Column): Column = cellScoresFor(centroidRows)(v)
    def bestCell(v: Column): Column = array_max(cellScores(v)).getField("cell")
    val assigned = c.withColumn("cell", bestCell(col("nv")))
    val probed = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(transform(
          slice(reverse(array_sort(cellScores(col("qv")))), 1, nProbe),
          s => s.getField("cell"))))
    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
      .dropDuplicates("qid", "nid")
    topK(scored, k)
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
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
      .dropDuplicates("qid", "nid")
    topK(scored, k)
  }
}
