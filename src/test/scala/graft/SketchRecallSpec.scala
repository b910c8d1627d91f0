package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Quantified recall contracts for the rows-only sketch family —
  * turns "rows-only by design" into pinned numbers.
  *
  *  (a) SimHash banding is EXACT for hamming < nBands (pigeonhole:
  *      a pair below that distance shares at least one intact band),
  *      verified against brute-force hamming over the fingerprints.
  *  (b) MinHash banded candidates reach pinned recall against
  *      exact-Jaccard truth at the 0.8 gate threshold on the real
  *      sf0.01 documents corpus.
  */
class SketchRecallSpec extends SparkSpec {
  import spark.implicits._

  test("simhash banded candidates = brute-force pairs for hamming < nBands") {
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight").split(" ")
    // 60 docs: doc i mutates (i mod 5) words — a spread of hamming
    // distances, plus exact duplicates at i ≡ 0 (mod 5)
    val docs = (0 until 60).map { i =>
      val words = base.clone()
      (0 until (i % 5)).foreach { m =>
        words((i + m * 3) % words.length) = s"tok${i}_$m"
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

    val nBands = 4
    val maxH = nBands - 1 // pigeonhole-exact regime
    val fp = Dedup.simHash(docs, "text", "doc_id")
    val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= maxH)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSet

    val banded = Dedup.simHashNearDup(docs, "text", "doc_id",
        maxHamming = maxH, nBands = nBands)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(brute.nonEmpty, "test corpus must produce close pairs")
    assert(banded == brute,
      s"banding must be exact below nBands: missing ${brute -- banded}, " +
        s"spurious ${banded -- brute}")
  }

  test("minhash banding reaches 90% recall vs exact jaccard at 0.8 on sf0.01") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // exact truth over the SAME shingle universe the verify step
    // uses (uncapped): all-pairs via the df-capped inverted index
    // with a cap high enough to be effectively uncapped for 500 docs
    val truth = Dedup.ngramJaccard(docs, "text", "doc_id",
        n = 4, threshold = 0.8, dfCap = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "sf0.01 corpus must contain near-dup pairs")

    val candidates = Dedup.minHashLsh(docs, "text", "doc_id",
        n = 4, k = 32, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val candRecall = (candidates & truth).size.toDouble / truth.size
    info(f"banded-candidate recall = $candRecall%.3f over ${truth.size} true pairs")
    assert(candRecall >= 0.9)

    // the full pipeline (banding → estimate pre-filter → exact
    // verify) must keep that recall: the verify stage can only drop
    // false positives, not true ones
    val pipeline = Dedup.minHashNearDup(docs, "text", "doc_id",
        n = 4, k = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pipeRecall = (pipeline & truth).size.toDouble / truth.size
    info(f"full-pipeline recall = $pipeRecall%.3f")
    assert(pipeRecall >= 0.9)
  }
}
