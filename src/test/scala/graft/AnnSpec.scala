package graft

import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForce ranks by cosine, excludes self") {
    val out = Ann.bruteForce(corpus, corpus.filter($"vec_id" === 0L),
        "embedding", "vec_id", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L))) // nid by rank
  }

  test("lshTopK returns only bucket-local neighbors, ranked") {
    val out = Ann.lshTopK(corpus, corpus.filter($"vec_id" === 0L),
        "embedding", "vec_id", k = 3, nPlanes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // whatever shares vec 0's bucket must be ranked; result is a
    // subset of bruteForce's and contains no self-pair
    assert(out.forall { case (q, n) => q == 0L && n != 0L })
  }

  test("multi-probe LSH recall on real embeddings beats a floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Ann.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val single = topSet(Ann.lshTopK(emb, queries, "embedding", "vec_id", 10,
      nPlanes = 4))
    val multi = topSet(Ann.lshTopK(emb, queries, "embedding", "vec_id", 10,
      nPlanes = 4, multiProbe = true))
    val recallSingle = (single & exact).size.toDouble / exact.size
    val recallMulti = (multi & exact).size.toDouble / exact.size
    info(f"recall single-probe=$recallSingle%.2f multi-probe=$recallMulti%.2f")
    assert(recallMulti >= recallSingle)
    assert(recallMulti > 0.5) // 4 planes + 1-bit probes on 500 vectors
  }

  test("IVF recall on real embeddings beats a floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Ann.bruteForce(emb, queries, "embedding", "vec_id", 10))
    // these synthetic embeddings are near-uniform on the sphere — the
    // IVF worst case — so probe half the cells for a meaningful floor
    val ivf = topSet(Ann.ivfTopK(emb, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 8))
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"IVF recall (16 cells, 8 probes) = $recall%.2f")
    assert(recall > 0.5)
  }

  test("k-means refinement keeps IVF recall at least competitive") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Ann.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val refined = topSet(Ann.ivfTopK(emb, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 8, refineIters = 2))
    val recall = (refined & exact).size.toDouble / exact.size
    info(f"IVF recall after 2 Lloyd iters = $recall%.2f")
    assert(recall > 0.5)
  }

  test("IVF-PQ with exact rerank matches plain IVF's recall gate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Ann.bruteForce(emb, queries, "embedding", "vec_id", 10))
    // same cells/probes as the plain-IVF gate test: with rerank = 8k
    // the PQ codes only pick CANDIDATES (the exact stage restores
    // true cosine order), so quantization must not cost the gate
    val pq = topSet(Ann.ivfPqTopK(emb, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 8, nSub = 16, codebookSize = 16))
    val recall = (pq & exact).size.toDouble / exact.size
    info(f"IVF-PQ recall (16 cells, 8 probes, 16x16 codes, rerank 80) = $recall%.2f")
    assert(recall >= 0.85)
  }

  test("PQ codebooks: assignment round-trip beats the zero-code baseline") {
    // reconstruction error with trained codebooks must beat
    // quantizing every residual to the subspace mean (1-code PQ) —
    // the sanity floor that catches a broken Lloyd loop
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sample = emb.limit(200).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .map { v => val n = math.sqrt(v.map(x => x * x).sum).max(1e-300); v.map(_ / n) }
    val books = Ann.trainPqCodebooks(sample, nSub = 8, codebookSize = 16)
    val base = Ann.trainPqCodebooks(sample, nSub = 8, codebookSize = 1)
    def mse(bks: Array[Array[Array[Double]]]): Double = {
      val subDim = sample.head.length / 8
      sample.map { v =>
        (0 until 8).map { mi =>
          val sv = v.slice(mi * subDim, (mi + 1) * subDim)
          val best = bks(mi).map(cb =>
            sv.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum).min
          best
        }.sum
      }.sum / sample.length
    }
    val m16 = mse(books); val m1 = mse(base)
    info(f"PQ reconstruction MSE: k=16 $m16%.5f vs k=1 $m1%.5f")
    assert(m16 < m1 * 0.8)
  }

  test("converged quantizer with cell splitting reaches the recall gate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Ann.bruteForce(emb, queries, "embedding", "vec_id", 10))
    // default refineIters: convergence-stopped Lloyd + hot-cell split,
    // nothing hand-tuned per corpus
    val ivf = topSet(Ann.ivfTopK(emb, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 8))
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"IVF recall, converged + split = $recall%.2f")
    assert(recall >= 0.85)
  }

  test("native IVF expressions ≡ the literal/HOF Column formulations") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{asDouble, cosine, dot}
    // randomized vectors incl. a zero vector (the cosine 0-denominator
    // guard) and duplicate-score ties within reach of the tie rules
    val rnd = new scala.util.Random(99)
    val dim = 16
    val vecs = (0 until 200).map { i =>
      if (i == 0) (i.toLong, Seq.fill(dim)(0.0))
      else (i.toLong, Seq.fill(dim)(rnd.nextInt(5).toDouble))
    }.toDF("id", "v").select(col("id"), asDouble(col("v")).as("v"))
    val cents: Seq[Seq[Double]] =
      (0 until 6).map(_ => Seq.fill(dim)(rnd.nextInt(5).toDouble))
    val nSub = 4
    val books: Seq[Seq[Seq[Double]]] = (0 until nSub).map(_ =>
      (0 until 5).map(_ => Seq.fill(dim / nSub)(rnd.nextDouble() - 0.5)))
    val halfNorms = books.map(_.map(cb => 0.5 * cb.map(x => x * x).sum))
    val subDim = dim / nSub

    // the original Column formulations, reconstructed verbatim
    def cellScores(v: org.apache.spark.sql.Column) =
      array(cents.zipWithIndex.map { case (cv, i) =>
        struct(cosine(v, typedLit(cv)).as("score"), lit(i).as("cell"))
      }: _*)
    val centsLit = typedLit(cents)
    val booksLit = typedLit(books)
    val halfLit = typedLit(halfNorms)
    def subAt(v: org.apache.spark.sql.Column, mi: org.apache.spark.sql.Column) =
      slice(v, mi * subDim + 1, lit(subDim))
    def pqCodesHof(r: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(nSub - 1)), mi =>
        array_max(transform(sequence(lit(0), lit(4)), ki =>
          struct(
            (dot(subAt(r, mi), element_at(element_at(booksLit, mi + 1), ki + 1)) -
              element_at(element_at(halfLit, mi + 1), ki + 1)).as("score"),
            ki.as("code")))).getField("code"))

    val both = vecs
      .withColumn("_n", greatest(sqrt(dot(col("v"), col("v"))), lit(1e-300)))
      .withColumn("nvh", transform(col("v"), x => x / col("_n")))
      .withColumn("cell_hof", array_max(cellScores(col("nvh"))).getField("cell"))
      .withColumn("probe_hof", transform(
        slice(reverse(array_sort(cellScores(col("nvh")))), 1, 3),
        s => s.getField("cell")))
      .withColumn("_resid", zip_with(col("nvh"),
        element_at(centsLit, col("cell_hof") + 1), (a, b) => a - b))
      .withColumn("codes_hof", pqCodesHof(col("_resid")))
      .withColumn("adc_hof",
        dot(col("nvh"), element_at(centsLit, col("cell_hof") + 1)) +
          aggregate(sequence(lit(0), lit(nSub - 1)), lit(0.0), (acc, mi) =>
            acc + dot(subAt(col("nvh"), mi),
              element_at(element_at(booksLit, mi + 1),
                element_at(col("codes_hof"), mi + 1) + 1))))
      .withColumn("cell_nat",
        graft.functions.IvfBestCell.bestCell(col("nvh"), cents))
      .withColumn("probe_nat",
        graft.functions.IvfProbeCells.probeCells(col("nvh"), cents, 3))
      .withColumn("_enc",
        graft.functions.IvfPqEncode.encode(col("v"), cents, books))
      .withColumn("adc_nat", graft.functions.IvfPqAdc.adc(
        col("nvh"), col("cell_hof"), col("codes_hof"), cents, books))
    val mism = both.filter(
      col("cell_hof") =!= col("cell_nat") ||
        col("probe_hof") =!= col("probe_nat") ||
        col("cell_hof") =!= col("_enc.cell") ||
        col("codes_hof") =!= col("_enc.codes") ||
        col("adc_hof") =!= col("adc_nat")).count()
    assert(mism == 0L)
  }
}
