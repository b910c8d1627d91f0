package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different text with zero overlap xyz")
  ).toDF("doc_id", "text")

  test("exact dedup ranks identical content") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 1 && out(2L) == 2) // same hash, ranked by id
    assert(out(3L) == 1 && out(4L) == 1)
  }

  test("ngramJaccard finds near-dups and respects threshold") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id", n = 3,
        threshold = 0.5, dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L))) // exact dup → jaccard 1.0
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L))) // near dups
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 1.0)
  }

  test("cappedShingles drops hot shingles before any join") {
    val sh = Dedup.cappedShingles(docs, "text", "doc_id", n = 3, dfCap = 2)
    val dfs = sh.groupBy("shingle").count().agg(max("count")).head.getLong(0)
    assert(dfs <= 2)
  }

  test("native minHash signature is bit-identical to the SQL aggregate form") {
    // the old formulation: explode occurrences, groupBy(id), k
    // min-aggregates over pmod(xxhash64(shingle)·a+b, P). The native
    // per-row expression must reproduce it EXACTLY — this pins the
    // XXH64(seed 42) replication and the affine chain.
    import org.apache.spark.sql.functions.{pmod, xxhash64, min => fmin, lit}
    val P = graft.functions.MinHashSignature.MersennePrime
    val k = 16
    val sh = Dedup.shingleOccurrences(docs, "text", "doc_id", 3)
    val base = pmod(xxhash64(col("shingle")), lit(P))
    val aggs = (0 until k).map { i =>
      val (a, b) = graft.functions.MinHashSignature.perm(i)
      fmin(pmod(base * a + b, lit(P))).as(s"h$i")
    }
    val expect = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    val got = Dedup.minHashSignatures(docs, "text", "doc_id", 3, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    assert(got == expect)
  }

  test("minHash signature similarity tracks exact jaccard") {
    val est = Dedup.minHashLsh(docs, "text", "doc_id", n = 3, k = 32, bands = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est((1L, 2L)) == 1.0)           // identical docs, identical sigs
    assert(est((1L, 3L)) > 0.5)            // near dup → high estimate
    assert(!est.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHashNearDup composes LSH candidates with exact verify") {
    val out = Dedup.minHashNearDup(docs, "text", "doc_id", n = 3, k = 32,
        bands = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L))) // only the exact dup survives 0.9
  }

  test("native simhash is bit-identical to the 64-aggregate vote form") {
    // reference formulation: explode tokens, 64 independent
    // sum(bit_j(xxhash64(tok))) aggregates, bit set iff 2*ones > n —
    // pins the XXH64 replication and the vote rule, and that
    // zero-token docs produce no row in either form
    import org.apache.spark.sql.functions.{explode, xxhash64, shiftright, sum => fsum, count => fcount, lit, when}
    val docsWithEmpty = docs.unionByName(
      Seq((99L, "... ...")).toDF("doc_id", "text")) // punctuation-only: 0 tokens
    val toks = docsWithEmpty.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val aggs = (0 until 64).map(j =>
      fsum(shiftright(col("h"), j).bitwiseAND(1)).as(s"o$j")) :+
      fcount(lit(1)).as("_n")
    val expect = toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"o$j") * 2 > col("_n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.simHash(docsWithEmpty, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(!got.contains(99L))
  }

  test("simHashNearDup pairs identical docs at hamming 0") {
    val out = Dedup.simHashNearDup(docs, "text", "doc_id",
        maxHamming = 3, nBands = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out.get((1L, 2L)).contains(0))
  }

  test("embeddingNearDup thresholds on cosine") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("decontaminate flags only training docs overlapping the benchmark") {
    val train = Seq(
      (1L, "the secret benchmark answer is forty two exactly"),
      (2L, "completely unrelated training document text here"),
      (3L, "contains the secret benchmark answer is forty two and more")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the secret benchmark answer is forty two")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "text", "doc_id", n = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L)) // doc 2 shares no 24-gram
    assert(out.values.forall(_ >= 1L))
    // count is DISTINCT shared shingles: doc 1 contains the benchmark
    // text fully, so every benchmark shingle hits
    assert(out(1L) == bench.select(
      explode(graft.functions.NgramShingles.ngramShingleSet(col("text"), 24)))
      .distinct().count())
  }

  test("CC star rounds are hub-proof: two-stage aggregation, no window") {
    // a power-law hub ships every edge of one node through m(u); the
    // aggregation form partial-aggregates it map-side and leaves the
    // edge-side join AQE-skew-splittable, where a window form would
    // buffer the hub's whole edge list in ONE task (r12 verdict #6)
    val hub = (1 to 5000).map(i => (0L, i.toLong))
    val chain = (5001 to 5050).map(i => (i.toLong, i.toLong + 1))
    val edges = (hub ++ chain).toDF("src", "dst")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.sparkPlan.toString
    val ls = Dedup.largeStar(edges)
    val ss = Dedup.smallStar(ls)
    Seq(planOf(ls), planOf(ss)).foreach { p =>
      assert(!p.contains("Window"), s"star round plans a window:\n$p")
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"star round lost its two-stage aggregation:\n$p")
    }
    // and the full algorithm labels the hub star + the chain correctly
    val out = Dedup.clusters(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 to 5000).foreach(i => assert(out(i.toLong) == 0L))
    (5001 to 5051).foreach(i => assert(out(i.toLong) == 5001L))
  }

  test("largeStar without its distinct feeds smallStar identically") {
    // largeStar emits duplicated (dst, m) rows by design now; the
    // composed round's edge SET must equal the deduplicated form's
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
    val composed = Dedup.smallStar(Dedup.largeStar(edges))
      .collect().map(_.toSeq).toSet
    val viaDistinct = Dedup.smallStar(Dedup.largeStar(edges).distinct())
      .collect().map(_.toSeq).toSet
    assert(composed == viaDistinct)
  }
}
