package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Property check: the distributed [[Dedup.substringDedup]] agrees
  * with a straightforward single-machine reference implementation of
  * the same contract (canonical = lexicographic min (doc, pos) per
  * duplicated k-gram; remove the union of non-canonical [p, p+k)
  * windows; rebuild from the original text) on random small corpora.
  * Small vocabularies + short docs force dense duplicate structure —
  * the regime where an off-by-one in gram positions, tie-breaks or
  * window unions would actually show.
  */
class SubstringDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference: brute-force maps, no Spark. */
  private def reference(docs: Seq[(Long, String)],
      k: Int): Map[Long, (Int, Int, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val occ = scala.collection.mutable.LinkedHashMap
      .empty[Vector[String], List[(Long, Int)]]
    for ((id, ws) <- toks; p <- 0 to ws.length - k if ws.length >= k)
      occ(ws.slice(p, p + k)) =
        occ.getOrElse(ws.slice(p, p + k), Nil) :+ (id -> p)
    val removed = scala.collection.mutable.Map
      .empty[Long, Set[Int]].withDefaultValue(Set.empty)
    for ((_, os) <- occ if os.size >= 2) {
      val canon = os.minBy(identity)
      for ((id, p) <- os if (id, p) != canon)
        removed(id) = removed(id) ++ (p until p + k)
    }
    toks.map { case (id, ws) =>
      val cov = removed(id)
      val kept = ws.indices.filterNot(cov.contains).map(ws)
      id -> ((ws.length, cov.size, kept.mkString(" ")))
    }.toMap
  }

  private val vocab = Vector("a", "b", "c", "d", "e")
  private def corpusGen(nDocs: Int): Gen[Seq[(Long, String)]] =
    Gen.sequence[Seq[(Long, String)], (Long, String)](
      (0 until nDocs).map { i =>
        Gen.chooseNum(1, 14).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf(vocab))
            .map(ws => (i.toLong, ws.mkString(" "))))
      })

  test("distributed substringDedup == brute-force reference on random corpora") {
    val params = Gen.Parameters.default
    for (trial <- 0 until 25) {
      val docs = corpusGen(8).apply(params, Seed(1000L + trial)).get
      for (k <- Seq(2, 3, 4)) {
        val expected = reference(docs, k)
        val got = Dedup
          .substringDedup(docs.toDF("doc_id", "text"), "text", "doc_id", k)
          .collect()
          .map(r => r.getLong(0) ->
            ((r.getInt(1), r.getInt(2), r.getString(3))))
          .toMap
        assert(got == expected,
          s"trial=$trial k=$k corpus=${docs.mkString("; ")}")
      }
    }
  }
}
