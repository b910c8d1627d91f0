package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level repetition statistics — the Gopher-style quality
  * signals (Rae et al. 2021, "Scaling Language Models", table A1)
  * a training-data pipeline computes per document to drop
  * low-quality repetitive text: duplicate-word fraction and
  * most-frequent-word-bigram fraction.
  *
  * Shape at 100 TB: the duplicate-word fraction is a pure narrow map
  * (per-row `array_distinct`, no shuffle). The top-bigram fraction
  * keys its one aggregation shuffle on (doc id, bigram) — cardinality
  * scales with the corpus, no hot keys — and immediately re-aggregates
  * at doc grain; both aggregations partial-aggregate map-side.
  */
object TextStats {

  /** Per-document repetition signals over whitespace-split words:
    * (id, n_words, dup_word_frac, top_bigram_frac). Documents with a
    * single word have no bigrams — their top_bigram_frac is 0.
    */
  def repetition(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val base = df.select(
      col(idCol),
      size(words).cast("long").as("n_words"),
      round((size(words) - size(array_distinct(words))).cast("double") /
        size(words), 4).as("dup_word_frac"),
      words.as("_words"))
    // sequence(1, 0) DESCENDS in Spark rather than being empty —
    // single-word docs must not reach the bigram builder
    val bigrams = base.filter(size(col("_words")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("_words")) - 1),
          i => concat(element_at(col("_words"), i), lit(" "),
            element_at(col("_words"), i + 1)))).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(round(max(col("_c")).cast("double") / sum(col("_c")), 4)
        .as("top_bigram_frac"))
    base.drop("_words")
      .join(bigrams, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** CROSS-document duplicated-n-gram coverage — the MassiveText /
    * RefinedWeb inter-document repetition signal: for each document,
    * the fraction of its DISTINCT word n-grams that occur in at
    * least one OTHER document. High values mark boilerplate and
    * templated text that exact/near dedup at whole-document grain
    * misses ([[repetition]] is the within-document counterpart).
    *
    * Returns (id, n_grams, n_dup, dup_ngram_frac); documents with
    * fewer than `n` words have no n-grams and report 0.
    *
    * Shape at 100 TB: per-doc distinct n-grams explode narrow
    * (≈ one per word); the document frequency is ONE hash
    * aggregation keyed on the gram (corpus cardinality, partial
    * map-side); the df join is gram-keyed at the same cardinality
    * (never a pair expansion) and the per-doc roll-up re-aggregates
    * at doc grain. Cost is linear in corpus token count.
    */
  def dupNgramCoverage(df: DataFrame, textCol: String, idCol: String,
      n: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val words = split(col(textCol), " ")
    // sequence(1, 0) DESCENDS in Spark rather than being empty —
    // short docs must not reach the gram builder
    val grams = df.filter(size(words) >= n)
      .select(col(idCol),
        explode(array_distinct(
          transform(sequence(lit(1), size(words) - (n - 1)),
            i => concat_ws(" ", slice(words, i, lit(n)))))).as("gram"))
    val gramDf = grams.groupBy("gram")
      .agg(count(lit(1)).as("_df")) // grams are distinct per doc
    val perDoc = grams.join(gramDf, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ngram_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 4))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("dup_ngram_frac"), lit(0.0)).as("dup_ngram_frac"))
  }
}
