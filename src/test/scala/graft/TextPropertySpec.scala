package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextFunctions

/** Property-based checks with raw ScalaCheck generators (fixed seeds
  * for reproducibility): the Catalyst column implementations agree
  * with straightforward Scala reference implementations on random
  * ASCII inputs.
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', ';', ':', '!', '?')))
      .map(_.mkString.take(200))

  private def samples(n: Int): List[String] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i =>
      asciiText.apply(params, Seed(42L + i))).toList
  }

  test("fingerprint matches the reference fold on random strings") {
    val texts = samples(60) :+ "" :+ "a"
    val expected = texts.map(t =>
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L))
    val got = texts.toDF("text")
      .select(TextFunctions.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toList
    assert(got == expected)
  }

  test("tokenCount matches the reference regex count on random strings") {
    val texts = samples(60)
    val expected = texts.map(t =>
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).length)
    val got = texts.toDF("text")
      .select(TextFunctions.tokenCount(col("text")))
      .collect().map(_.getInt(0)).toList
    assert(got == expected)
  }

  test("native shingles match a codepoint-sliding reference on random strings") {
    // includes multi-byte codepoints: boundary walking must slice on
    // codepoints, never mid-UTF8-sequence
    val texts = (samples(40) :+ "" :+ "a" :+ "héllö wörld ✓✓" :+ "ab").distinct
    def ref(s: String, n: Int): Seq[String] = {
      val cps = s.codePoints().toArray.toSeq
      if (cps.length < n) Seq(s)
      else cps.sliding(n).map(w => new String(w.toArray, 0, w.length)).toSeq
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .shingleOccurrences(df, "text", "doc_id", 3)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t, 3), s"text <$t>")
    }
    // set mode = distinct, first occurrence order
    val setGot = graft.operators.Dedup.shingles(df, "text", "doc_id", 3)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(setGot(i.toLong) == ref(t, 3).distinct, s"set of <$t>")
    }
  }

  test("simhash of a doc equals simhash of its token-permuted self") {
    // simhash is a bag-of-tokens sketch: token order must not matter
    val doc = samples(1).headOption.getOrElse("the quick brown fox") + " alpha beta"
    val shuffled = doc.split(' ').reverse.mkString(" ")
    val out = graft.operators.Dedup.simHash(
        Seq((1L, doc), (2L, shuffled)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(_.getLong(1)).toSet
    assert(out.size == 1)
  }
}
