package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("RegexSetMatchRewrite plans hard-anchored literal alternations as IN") {
    if (!spark.experimental.extraOptimizations.contains(RegexSetMatchRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RegexSetMatchRewrite
    import org.apache.spark.sql.functions.col
    val path = "/tmp/graft_setmatch_spec"
    Seq("click", "view", "drag", "click\n").toDF("l")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val q = df.filter(col("l").rlike("""\A(?:click|view)\z"""))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains(" IN ") && !optimized.toUpperCase.contains("RLIKE"))
    // the rewritten IN reaches the parquet scan's pushed filters —
    // the whole point: RLike never pushes down, In does
    assert(q.queryExecution.executedPlan.toString.contains("In(l, [click,view])"))
    assert(q.collect().map(_.getString(0)).toSet == Set("click", "view"))
    // soft anchors must NOT rewrite: Java's $ matches before a
    // trailing newline, so ^(?:…)$ is not IN-equivalent
    val soft = df.filter(col("l").rlike("^(?:click|view)$"))
    assert(soft.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("RLIKE"))
    assert(soft.collect().map(_.getString(0)).toSet ==
      Set("click", "view", "click\n"))
    // unanchored and non-literal patterns keep RLike too
    val open = df.filter(col("l").rlike("""\A(?:cli.k)\z"""))
    assert(open.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("RLIKE"))
    // empty alternative keeps its "" member
    Seq("a", "", "b").toDF("l").write.mode("overwrite").parquet(path + "_e")
    val withEmpty = spark.read.parquet(path + "_e")
      .filter(col("l").rlike("""\A(?:a|)\z"""))
    assert(withEmpty.collect().map(_.getString(0)).toSet == Set("a", ""))
  }

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val out = spark.sql("SELECT graft_dot(a, b) AS d FROM vec_pairs")
      .head.getDouble(0)
    assert(out == 11.0)
  }

  test("graft_dot rejects wrong arity") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("2 arguments") ||
      e.getMessage.toLowerCase.contains("requirement"))
  }

  test("graft_shingles is callable from SQL with occurrence and set modes") {
    GraftFunctions.register(spark)
    val occ = spark.sql("SELECT graft_shingles('abab', 2) AS s")
      .head.getSeq[String](0)
    assert(occ == Seq("ab", "ba", "ab"))
    val set = spark.sql("SELECT graft_shingles('abab', 2, true) AS s")
      .head.getSeq[String](0)
    assert(set == Seq("ab", "ba"))
    // short doc: one shingle = the whole text
    assert(spark.sql("SELECT graft_shingles('x', 4) AS s")
      .head.getSeq[String](0) == Seq("x"))
    // multi-byte codepoints slice on codepoint boundaries
    assert(spark.sql("SELECT graft_shingles('héllö', 2, true) AS s")
      .head.getSeq[String](0) == Seq("hé", "él", "ll", "lö"))
  }

  test("graft_minhash_signature and graft_simhash are callable from SQL") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT graft_minhash_signature(graft_shingles('hello world', 4, true), 8) AS s")
      .head.getSeq[Long](0)
    assert(sig.length == 8 && sig.forall(_ != Long.MaxValue))
    // SQL result == Column-API result
    import org.apache.spark.sql.functions.col
    val viaCol = Seq("hello world").toDF("t")
      .select(graft.functions.MinHashSignature.minhashSignature(
        graft.functions.NgramShingles.ngramShingleSet(col("t"), 4), 8))
      .head.getSeq[Long](0)
    assert(sig == viaCol)
    val fp = spark.sql(
      "SELECT graft_simhash(array('the', 'quick', 'fox')) AS f").head.getLong(0)
    val fpCol = Seq(Seq("the", "quick", "fox")).toDF("toks")
      .select(graft.functions.SimHashFingerprint.simhash(col("toks")))
      .head.getLong(0)
    assert(fp == fpCol)
  }

  test("graft_chunk_encode/decode roundtrip from SQL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT s.ts, s.value FROM (
        |  SELECT explode(graft_chunk_decode(
        |    graft_chunk_encode(
        |      array(named_struct('ts', 1000L, 'value', 1.5D),
        |            named_struct('ts', 2000L, 'value', 2.5D),
        |            named_struct('ts', 3000L, 'value', 2.5D)), 2),
        |    0L, 9999L)) AS s)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1000L, 1.5), (2000L, 2.5), (3000L, 2.5)))
    // the mint/maxt frame filter is live from SQL too: samplesPerChunk
    // 2 put ts=3000 in its own chunk, which a [0, 2500] query skips
    val filtered = spark.sql(
      """SELECT s.ts FROM (
        |  SELECT explode(graft_chunk_decode(
        |    graft_chunk_encode(
        |      array(named_struct('ts', 1000L, 'value', 1.5D),
        |            named_struct('ts', 2000L, 'value', 2.5D),
        |            named_struct('ts', 3000L, 'value', 2.5D)), 2),
        |    0L, 2500L)) AS s)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(filtered == Seq(1000L, 2000L))
  }
}
