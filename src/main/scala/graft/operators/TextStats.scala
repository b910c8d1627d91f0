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
}
