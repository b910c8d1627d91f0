package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Semantics of [[Dedup.substringDedup]] — the corpus-rewriting
  * substring dedup (duplicated token spans ≥ k excised, corpus-wide
  * first occurrence kept). Each test pins one corner of the
  * published heuristic's contract.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int): Map[Long, (Int, Int, String)] =
    Dedup.substringDedup(rows.toDF("doc_id", "text"), "text", "doc_id", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("cross-doc duplicate span: first occurrence kept, second removed") {
    val out = run(Seq(
      (1L, "licensed under apache two see file for details"),
      (2L, "my program licensed under apache two is great")
    ), k = 4)
    assert(out(1L)._3 === "licensed under apache two see file for details")
    // "licensed under apache two" = 4-gram at doc2 pos 2, duplicated;
    // canonical is (1, 0) -> doc2 loses tokens 2..5
    assert(out(2L)._3 === "my program is great")
    assert(out(2L)._2 === 4)
  }

  test("within-doc repeat: second occurrence removed") {
    val out = run(Seq(
      (1L, "a b c d x y a b c d")
    ), k = 4)
    // "a b c d" at pos 0 (canonical) and pos 6 (removed)
    assert(out(1L)._3 === "a b c d x y")
    assert(out(1L)._2 === 4)
  }

  test("overlapping duplicated grams merge into one maximal span") {
    val out = run(Seq(
      (1L, "p q r s t u v"),
      (2L, "z z p q r s t u v z")
    ), k = 4)
    // doc2 contains the whole 7-token span: duplicated 4-gram starts
    // at pos 2,3,4,5 -> union covers tokens 2..8, one maximal span
    assert(out(2L)._3 === "z z z")
    assert(out(2L)._2 === 7)
    assert(out(1L)._2 === 0)
  }

  test("canonical tie-break is lexicographic (doc, pos): lowest doc id wins") {
    val out = run(Seq(
      (5L, "m n o p tail"),
      (2L, "m n o p other")
    ), k = 4)
    assert(out(2L)._3 === "m n o p other")
    assert(out(5L)._3 === "tail")
  }

  test("docs shorter than k pass through untouched, with n_removed = 0") {
    val out = run(Seq(
      (1L, "a b c"),
      (2L, "a b c")
    ), k = 4)
    assert(out(1L) === ((3, 0, "a b c")))
    assert(out(2L) === ((3, 0, "a b c")))
  }

  test("no duplicated k-gram anywhere: corpus unchanged") {
    val rows = Seq(
      (1L, "one two three four five"),
      (2L, "six seven eight nine ten"))
    val out = run(rows, k = 3)
    rows.foreach { case (id, t) =>
      assert(out(id)._3 === t); assert(out(id)._2 === 0)
    }
  }

  test("a fully duplicated document empties (cleaned_text = empty string)") {
    val out = run(Seq(
      (1L, "w x y z"),
      (2L, "w x y z")
    ), k = 4)
    assert(out(1L)._3 === "w x y z")
    assert(out(2L)._3 === "")
    assert(out(2L)._2 === 4)
  }

  test("hashGramKey (the petabyte shuffle-width config) is output-identical on the gate corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.substringDedup(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect().toSeq
    val hashed = Dedup.substringDedup(docs, "text", "doc_id", k = 8,
        hashGramKey = true)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == exact)
  }

  test("hashGramKey ≡ exact on a high-cardinality synthetic corpus") {
    // ~40k docs of 12 tokens, mostly-unique vocabulary with planted
    // cross-doc duplicate spans every 7th doc — tens of thousands of
    // distinct 3-grams push far past the gate corpus' cardinality
    // while staying collision-free for the 128-bit key by design
    import spark.implicits._
    val docs = spark.range(40000).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 12).map(j =>
          when(col("id") % 7 === 0 && j >= 4 && j < 9,
            concat(lit("dup"), lit(j)))
          .otherwise(concat(lit("w"), col("id") * 12 + j))): _*)
        .as("text"))
    val exact = Dedup.substringDedup(docs, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect().toSeq
    val hashed = Dedup.substringDedup(docs, "text", "doc_id", k = 3,
        hashGramKey = true)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == exact)
    // sanity: the planted spans actually deduplicated
    val removed = exact.map(r => r.getAs[Int]("n_removed").toLong).sum
    assert(removed > 20000)
  }
}
