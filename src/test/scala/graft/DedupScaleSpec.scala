package graft.operators

import org.apache.spark.sql.functions._

/** Scale guards for the banded (LSH) self-joins: exact-dup collapse
  * + bucket caps. The adversarial corpus is the duplicate-heavy one —
  * a 1000-copy exact-dup cluster that shares every band and would be
  * a 500k-pair-per-band cartesian in an unguarded join.
  */
class DedupScaleSpec extends graft.SparkSpec {
  import spark.implicits._

  private val cluster =
    (1L to 1000L).map(i => (i, "all work and no play makes jack a dull boy"))
  private val others = Seq(
    (2001L, "the quick brown fox jumps over the lazy dog"),
    (2002L, "the quick brown fox jumps over the lazy cat"), // near dup of 2001
    (2003L, "completely different text with zero overlap xyz"))
  private lazy val docs = (cluster ++ others).toDF("doc_id", "text")

  test("capBuckets drops oversized buckets, keeps the rest") {
    val banded = ((1 to 100).map(i => (i.toLong, 0, 7L)) ++
      Seq((500L, 1, 9L), (501L, 1, 9L), (502L, 1, 9L)))
      .toDF("doc_id", "band", "key")
    val capped = Dedup.capBuckets(banded, Seq("band", "key"), 10, "t_drops")
    assert(capped.count() == 3)
    assert(capped.filter(col("band") === 0).count() == 0)
  }

  test("minHashLsh: 1000-dup cluster yields all member pairs at est 1.0") {
    val out = Dedup.minHashLsh(docs, "text", "doc_id", n = 3, k = 32, bands = 8)
    val intra = out.filter(col("id_a") <= 1000 && col("id_b") <= 1000)
    assert(intra.count() == 1000L * 999 / 2)
    assert(intra.filter(col("est_jaccard") =!= 1.0).count() == 0)
    // recall on non-dup near-pairs is unchanged by the guards
    assert(out.filter(col("id_a") === 2001 && col("id_b") === 2002).count() == 1)
  }

  test("minHashLsh: bucketCap=1 proves banding happens at rep level") {
    // with cap 1 every bucket holding >=2 DISTINCT contents is
    // dropped, so the only surviving pairs are the expanded
    // exact-dup cluster — which must be untouched by the cap because
    // it enters banding as a single representative
    val out = Dedup.minHashLsh(docs, "text", "doc_id", n = 3, k = 32,
      bands = 8, bucketCap = 1)
    assert(out.count() == 1000L * 999 / 2)
    assert(out.filter(col("id_b") > 2000).count() == 0)
  }

  test("ngramJaccard: a dup cluster larger than dfCap keeps its pairs") {
    // with per-document df, every shingle of the 1000-copy cluster
    // has df >= 1000 > dfCap and the cluster's pairs would vanish;
    // distinct-content df keeps them
    val out = Dedup.ngramJaccard(docs, "text", "doc_id",
      n = 3, threshold = 0.8, dfCap = 100)
    val intra = out.filter(col("id_a") <= 1000 && col("id_b") <= 1000)
    assert(intra.count() == 1000L * 999 / 2)
    assert(intra.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("simHashNearDup: dup cluster expands at hamming 0, near-dup kept") {
    val out = Dedup.simHashNearDup(docs, "text", "doc_id",
      maxHamming = 16, nBands = 4)
    val intra = out.filter(col("id_a") <= 1000 && col("id_b") <= 1000)
    assert(intra.count() == 1000L * 999 / 2)
    assert(intra.filter(col("hamming") =!= 0).count() == 0)
    assert(out.filter(col("id_a") === 2001 && col("id_b") === 2002).count() == 1)
  }

  test("embeddingNearDupLsh: vector-value collapse + cap") {
    val base = Array(3.0f, 1.0f, 4.0f, 1.0f, 5.0f)
    val dups = (1L to 12L).map(i => (i, base))
    val near = (101L to 108L).map { i =>
      (i, base.clone().updated(0, base(0) + (i - 100) * 1e-6f))
    }
    val vecs = (dups ++ near).toDF("vec_id", "embedding")
    val open = Dedup.embeddingNearDupLsh(vecs, "embedding", "vec_id",
      threshold = 0.9, nPlanes = 2)
    val intra = open.filter(col("id_a") <= 12 && col("id_b") <= 12)
    assert(intra.count() == 12L * 11 / 2)
    assert(intra.filter(col("cos_sim") =!= 1.0).count() == 0)
    // near-identical distinct vectors all pair up through their bucket
    assert(open.count() > 12L * 11 / 2)
    // with a tiny cap the shared bucket (9 distinct contents) is
    // dropped; the exact-dup cluster must survive via its single rep
    val capped = Dedup.embeddingNearDupLsh(vecs, "embedding", "vec_id",
      threshold = 0.9, nPlanes = 2, bucketCap = 5)
    assert(capped.count() == 12L * 11 / 2)
  }

  // local union-find reference for the connected-components checks
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def sparkComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.clusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clusters: chain graph collapses to one component in O(log n) rounds") {
    // a 64-node path is the worst case for naive min-propagation
    // (diameter 63); alternating star must still converge inside the
    // default round cap and label everything 0
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = sparkComponents(chain)
    assert(got.size == 64)
    assert(got.values.forall(_ == 0L))
  }

  test("clusters: matches union-find on a random pair soup") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    assert(sparkComponents(pairs) == ufComponents(pairs))
  }

  test("clusters: disjoint cliques keep distinct labels") {
    val cliqueA = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- i + 1 to 13L) yield (i, j)
    val got = sparkComponents(cliqueA ++ cliqueB)
    assert((0L to 3L).forall(got(_) == 0L))
    assert((10L to 13L).forall(got(_) == 10L))
  }

  test("clusters: M-copy cluster emits M rows, not M^2/2") {
    // the output-contract fix: a 40-member component is 40 rows
    val star = (1L to 39L).map(i => (0L, i))
    val out = Dedup.clusters(star.toDF("id_a", "id_b"))
    assert(out.count() == 40L)
  }
}
