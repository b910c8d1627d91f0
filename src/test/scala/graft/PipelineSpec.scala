package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // a ~25-word English period repeated 6× clears the quality gate
  // (≥100 tokens, stopword-rich, no punctuation) and gives a wide
  // shingle set so a one-word swap stays above jaccard 0.8
  private val period = "the cat sat on the mat and the dog ran to " +
    "the park while a bird flew over the house in the morning light "
  private val good = period * 6
  private val near = (period.replaceFirst("cat", "fox") + period * 5)
  private val german = ("der hund und die katze und das haus " +
    "und der baum und die tür und das licht und der nicht ein ") * 6

  private val docs = Seq(
    (1L, good),                 // kept: unique, en, high quality
    (2L, good),                 // dropped: exact dup of 1
    (3L, near),                 // dropped: near-dup of 1, cluster rep = 1
    (4L, "!!! ??? ... !!!"),    // dropped: quality gate
    (5L, german),               // dropped: lang gate (de)
    (6L, "a completely different story where the wizard walked " +
      "through the forest of silver trees to find the hidden city " +
      "and the river of glass in the valley of the old kings " * 3)
      // kept: unique, en, high quality
  ).toDF("doc_id", "text")

  test("corpusClean keeps exactly the unique high-quality in-lang reps") {
    val out = Pipeline.corpusClean(docs, "text", "doc_id").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 6L))
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getString(1) == "en")
    assert(r1.getDouble(2) >= 0.5)
    assert(r1.getLong(3) > 100L)
  }

  test("each gate drops for its own reason") {
    // lang gate: the german doc classifies de
    val lang = docs.select(col("doc_id"),
        graft.functions.TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(5L) == "de")
    assert(lang(1L) == "en")
    // quality gate: punctuation-only doc scores low
    val q = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(4L) < 0.5)
    assert(q(1L) >= 0.5 && q(3L) >= 0.5 && q(6L) >= 0.5)
    // near-dup gate: 1-3 really is a verified pair at 0.8
    val pairs = graft.operators.Dedup
      .ngramJaccard(docs.filter(col("doc_id").isin(1L, 3L, 6L)),
        "text", "doc_id", n = 4, threshold = 0.8, dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 3L)))
  }

  test("a non-English run scores quality against its own stopwords") {
    // the German doc must survive lang="de" cleaning: its quality
    // gate uses the GERMAN stopword list (an English list would zero
    // the stopword component and could drop well-formed German text)
    val out = Pipeline.corpusClean(docs, "text", "doc_id", lang = "de")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(5L))
  }

  test("the minhash scale path keeps the same documents as the ngram path") {
    val ngram = Pipeline.corpusClean(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    val minhash = Pipeline
      .corpusClean(docs, "text", "doc_id", nearDupMethod = "minhash")
      .collect().map(_.getLong(0)).toSet
    assert(minhash == ngram)
    intercept[IllegalArgumentException] {
      Pipeline.corpusClean(docs, "text", "doc_id", nearDupMethod = "simhash")
    }
  }

  test("sampleMix: deterministic, stratified, nesting, rate-accurate") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val n = 20000
    val docs = (1L to n).toDF("doc_id")
      .withColumn("stratum",
        when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")))
    val half = Pipeline.sampleMix(docs, "doc_id", "stratum",
      Map("a" -> 0.5, "b" -> 1.0))
    // determinism + partition independence: same keep-set again on a
    // different partition count
    val ids1 = half.collect().map(_.getLong(0)).toSet
    val ids2 = Pipeline.sampleMix(docs.repartition(13), "doc_id", "stratum",
      Map("a" -> 0.5, "b" -> 1.0)).collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // stratified: every b kept, a's rate within 3σ of 0.5
    val bKept = ids1.count(_ % 2 == 1)
    assert(bKept == n / 2)
    val aKept = ids1.count(_ % 2 == 0)
    assert(math.abs(aKept - n / 4.0) < 3 * math.sqrt(n / 2 * 0.25))
    // nesting: 0.5 of 0.5 (same salt) == 0.25
    val nested = Pipeline.sampleMix(
        Pipeline.sampleMix(docs, "doc_id", "stratum", Map("a" -> 0.5),
          defaultRate = 0.5),
        "doc_id", "stratum", Map("a" -> 0.25), defaultRate = 0.25)
      .collect().map(_.getLong(0)).toSet
    val quarter = Pipeline.sampleMix(docs, "doc_id", "stratum",
        Map("a" -> 0.25), defaultRate = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(nested == quarter)
    // defaultRate 0 drops unknown strata entirely
    assert(Pipeline.sampleMix(docs, "doc_id", "stratum",
      Map("zzz" -> 1.0)).count() == 0L)
  }

  test("tokenChunks cuts overlapping fixed windows covering every token") {
    // 10 tokens, maxLen 4, overlap 1 → stride 3 → starts 0,3,6,9
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Pipeline.tokenChunks(d, "doc_id", "text", maxLen = 4,
        overlap = 1)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9"),
      (3L, 9L, 1L, "t9"))) // short tail chunk
    // consecutive chunks share exactly `overlap` tokens
    assert(out(0)._4.split(" ").last == out(1)._4.split(" ").head)
  }

  test("tokenChunks: doc shorter than maxLen is one whole chunk") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Pipeline.tokenChunks(d, "doc_id", "text", maxLen = 16,
      overlap = 4).collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == 3L && out.head.getString(4) == "a b c")
    intercept[IllegalArgumentException] {
      Pipeline.tokenChunks(d, "doc_id", "text", maxLen = 4, overlap = 4)
    }
  }

  test("packSequences: exact coverage, full sequences, boundary spans") {
    import spark.implicits._
    // token counts 3,5,2,4 in one shard (ids 0,8,16,24 ≡ 0 mod 8) +
    // one 7-token doc in shard 1; maxLen 4 → shard-0 stream of 14
    // tokens cuts at 4/8/12; doc 8 (offset 3..8) must span seqs 0-1
    val docs = Seq(
      (0L, "a b c"), (8L, "d e f g h"), (16L, "i j"), (24L, "k l m n"),
      (1L, "p q r s t u v"), (9L, "")
    ).toDF("doc_id", "text")
    val out = graft.operators.Pipeline
      .packSequences(docs, "doc_id", "text", maxLen = 4, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // every token of every non-empty doc covered exactly once
    val perDoc = out.groupBy(_._3).view.mapValues(_.map(s => s._5 - s._4).sum)
    assert(perDoc.toMap == Map(0L -> 3L, 8L -> 5L, 16L -> 2L, 24L -> 4L,
      1L -> 7L))
    // spans within a doc never overlap and are contiguous
    out.groupBy(_._3).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4)
        case _ => ()
      }
    }
    // every sequence holds exactly maxLen tokens except the shard's last
    val perSeq = out.groupBy(s => (s._1, s._2)).view
      .mapValues(_.map(s => s._5 - s._4).sum).toMap
    val lastSeq = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    perSeq.foreach { case ((shard, seq), tot) =>
      if (seq < lastSeq(shard)) assert(tot == 4L, s"shard $shard seq $seq")
      else assert(tot <= 4L)
    }
    // doc 8 spans the 4-token boundary: seq 0 gets [0,1), seq 1 [1,5)
    assert(out.filter(_._3 == 8L).sortBy(_._2).toSeq ==
      Seq((0L, 0L, 8L, 0L, 1L), (0L, 1L, 8L, 1L, 5L)))
  }

  test("packSequences coverage is shard-count-invariant; default sizes from input partitions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (8L, "d e f g h"), (16L, "i j"), (24L, "k l m n"),
      (1L, "p q r s t u v"), (9L, ""), (5L, "w x y"), (13L, "z")
    ).toDF("doc_id", "text")
    // the per-shard coverage contract holds for ANY shard count —
    // only the (shard, seq_id) labeling changes: every non-empty
    // doc's tokens covered exactly once by contiguous spans, every
    // sequence full except each shard's last. nShards ≤ 0 (default)
    // sizes from the input's partition count, so the contract must
    // hold there without naming a count at all.
    for (n <- Seq(1, 3, 5, 0)) {
      val out = graft.operators.Pipeline
        .packSequences(docs, "doc_id", "text", maxLen = 4, nShards = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val perDoc = out.groupBy(_._3).view
        .mapValues(_.map(s => s._5 - s._4).sum)
      assert(perDoc.toMap == Map(0L -> 3L, 8L -> 5L, 16L -> 2L,
        24L -> 4L, 1L -> 7L, 5L -> 3L, 13L -> 1L), s"nShards=$n coverage")
      out.groupBy(_._3).foreach { case (_, spans) =>
        val sorted = spans.sortBy(_._4)
        assert(sorted.head._4 == 0L)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._5 == b._4)
          case _ => ()
        }
      }
      val perSeq = out.groupBy(s => (s._1, s._2)).view
        .mapValues(_.map(s => s._5 - s._4).sum).toMap
      val lastSeq = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      perSeq.foreach { case ((shard, seq), tot) =>
        if (seq < lastSeq(shard)) assert(tot == 4L, s"nShards=$n shard $shard seq $seq")
        else assert(tot <= 4L)
      }
      // shard ids stay inside [0, effective shard count)
      if (n > 0) assert(out.map(_._1).forall(s => s >= 0 && s < n))
    }
  }

  test("a near-dup chain collapses to its smallest member") {
    // 10 ~ 11 ~ 12 via one-word edits: component rep = 10
    val chain = Seq(
      (10L, period * 6),
      (11L, period.replaceFirst("cat", "fox") + period * 5),
      (12L, period.replaceFirst("cat", "owl") + period * 5)
    ).toDF("doc_id", "text")
    val out = Pipeline.corpusClean(chain, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(10L))
  }
}
