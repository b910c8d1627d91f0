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

  /** Streaming benchmark decontamination — the continuous-ingest
    * form of [[graft.operators.Dedup.decontaminate]]: drop any
    * streamed document sharing a character n-gram with the (static,
    * small) benchmark shingle set. Each document carries its own
    * shingle SET from the native one-pass expression, and the check
    * is a stream-static LEFT ANTI join on `array_contains` — the
    * benchmark side broadcasts, the join is STATELESS (re-evaluated
    * per micro-batch, no watermark, no state store), and the stream
    * side never shuffles. Semantics are identical to the batch
    * operator's keep-set (spec-pinned).
    *
    * `benchShingles`: one `shingle` string column — build it once
    * with [[graft.operators.Dedup.shingles]] over the benchmark
    * corpus and it serves every micro-batch.
    */
  def decontaminate(docs: DataFrame, benchShingles: DataFrame,
      textCol: String, n: Int): DataFrame =
    docs.withColumn("_sh",
        graft.functions.NgramShingles.ngramShingleSet(col(textCol), n))
      .join(broadcast(benchShingles.select(col("shingle"))),
        array_contains(col("_sh"), col("shingle")), "left_anti")
      .drop("_sh")
}
