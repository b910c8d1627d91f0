package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming front half of the corpus-cleaning pipeline
  * ([[graft.operators.Pipeline.corpusClean]]) for continuous
  * document ingest: annotate (language ID, quality, token count are
  * narrow maps — they stream as-is) → lang+quality gate → exact
  * dedup within the watermark horizon.
  *
  * The dedup state (`dropDuplicatesWithinWatermark` keyed on the
  * content hash) holds one row per DISTINCT content seen inside the
  * watermark window, so state is bounded by arrival-window
  * cardinality, not stream history — the same eviction contract the
  * windowed aggregates use. The near-dup cluster collapse stays a
  * batch job over the accumulated manifest (connected components is
  * iterative; it has no single-pass streaming form) — this split is
  * the standard ingest design: cheap gates + exact dedup on the
  * stream, periodic batch near-dup compaction downstream.
  */
object DocStream {

  def cleanIngest(docs: DataFrame, textCol: String, idCol: String,
      tsCol: String, watermark: String,
      lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    val scored = docs.select(col(idCol), col(tsCol), col(textCol),
      TextFunctions.langId(col(textCol)).as("lang"),
      TextFunctions.qualityScore(col(textCol), lang).as("quality"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    scored.filter(col("lang") === lang && col("quality") >= minQuality)
      .withColumn("content_hash", Dedup.contentKey(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col(idCol), col(tsCol), col("lang"), col("quality"),
        col("n_tokens"))
  }
}
