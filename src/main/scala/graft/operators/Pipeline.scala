package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** End-to-end corpus cleaning — the composition a training-data
  * ingest job actually runs, built entirely from this library's own
  * operators so each stage keeps its audited 100 TB shape:
  *
  *   1. annotate: language ID + quality score + token count
  *      ([[graft.functions.TextFunctions]]) — one narrow map fused
  *      into the scan;
  *   2. gate: keep `lang` documents with quality ≥ `minQuality` —
  *      the filter sits directly on the scan stage;
  *   3. exact dedup ([[Dedup.exact]]): keep the smallest id per
  *      content hash — one hash shuffle;
  *   4. near-dup collapse: verified ngram-Jaccard pairs
  *      ([[Dedup.ngramJaccard]]) → connected components
  *      ([[Dedup.clusters]]) → drop every member whose component
  *      has a smaller id, keeping one representative per cluster.
  *
  * Output: one row per surviving document with its annotations —
  * the manifest the next pipeline stage (tokenize/train) consumes.
  */
object Pipeline {

  /** `nearDupMethod`: `"ngram"` scores every candidate pair with the
    * exact inverted-index Jaccard (SQL-oracle-able — the gate runs
    * this); `"minhash"` swaps in the banded MinHash → estimate →
    * exact-verify composition ([[Dedup.minHashNearDup]]) — the
    * 100 TB configuration, where an inverted index over all shingles
    * is no longer affordable but banding + candidate-only
    * verification is. Both verify candidates with the SAME exact
    * Jaccard at the same threshold, so they agree wherever banding
    * recall holds (spec-pinned on the test corpus).
    */
  def corpusClean(df: DataFrame, textCol: String, idCol: String,
      lang: String = "en", minQuality: Double = 0.5,
      n: Int = 4, threshold: Double = 0.8, dfCap: Int = 100,
      nearDupMethod: String = "ngram"): DataFrame = {
    val scored = df.select(col(idCol), col(textCol),
      TextFunctions.langId(col(textCol)).as("lang"),
      TextFunctions.qualityScore(col(textCol), lang).as("quality"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val gated = scored.filter(col("lang") === lang &&
      col("quality") >= minQuality)
    // identical text ⇒ identical annotations, so gating before the
    // dedup stages drops whole duplicate groups consistently
    // materialize the gated+deduped manifest ONCE: it is referenced
    // by the pair pipeline, the cluster join, and the final output,
    // and its lineage (8 regex scans per doc for lang+quality, plus
    // the dedup window) would otherwise re-run per reference. At
    // 100 TB this cut is the temp-table write between the annotate
    // and near-dup stages of a real ingest job.
    val uniq = Dedup.exactCollapse(gated, textCol, idCol)
      .localCheckpoint() // eager: one materialization job, no AQE race (see Dedup.ngramJaccard)
    val pairs = nearDupMethod match {
      case "ngram" =>
        Dedup.ngramJaccard(uniq, textCol, idCol, n, threshold, dfCap)
      case "minhash" =>
        // `uniq` is content-distinct by construction (exact dedup one
        // stage up): skip the rep-collapse shuffle + member expansion
        Dedup.minHashNearDup(uniq, textCol, idCol, n = n,
          threshold = threshold, assumeDistinct = true)
      case other => throw new IllegalArgumentException(
        s"nearDupMethod must be ngram or minhash, got $other")
    }
    val comp = Dedup.clusters(pairs)
    val drops = comp.filter(col("cluster_id") < col("doc_id"))
      .select(col("doc_id").as(idCol))
    uniq.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("lang"), col("quality"), col("n_tokens"))
  }

  /** The 8-hex-digit keep threshold for a sampling rate: a row is
    * kept iff the first 8 hex digits of sha256(id:salt) compare
    * lexicographically below it (fixed-width lowercase hex, so
    * string order == numeric order). rate ≥ 1 returns "g", which is
    * greater than every hex string — keep all. Shared by the
    * operator and the oracle SQL so both engines run the identical
    * selection.
    */
  private[graft] def sampleThreshold(rate: Double): String = {
    require(rate >= 0.0, s"rate must be ≥ 0, got $rate")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296L).toLong}%08x"
  }

  /** Deterministic stratified sampling — the training-mix
    * construction step run after cleaning: keep each document with
    * its stratum's probability, decided by a content-independent
    * hash of the document id. Properties a distributed pipeline
    * needs and `DataFrame.sampleBy` does not give:
    *   - DETERMINISTIC and partition-independent: the keep decision
    *     is `substr(sha256(id:salt), 1, 8) < threshold(stratum)` —
    *     no RNG state, same verdict on any cluster size, any retry,
    *     any engine (the gate's DuckDB oracle replays it verbatim);
    *   - NESTED mixes compose: a rate-0.5 sample of a rate-0.5
    *     sample (same salt) equals the rate-0.25 sample, because
    *     thresholds nest;
    *   - a pure narrow map: no shuffle, no sort, pushes down past
    *     nothing it shouldn't (the filter sits on the scan).
    * Strata absent from `rates` fall back to `defaultRate`.
    */
  def sampleMix(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(sampleThreshold(defaultRate))) { case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit(sampleThreshold(r))).otherwise(acc)
    }
    df.filter(
      substring(sha2(concat(col(idCol).cast("string"), lit(":" + salt)), 256),
        1, 8) < thr)
  }

  /** Fixed-window token chunking — the training-sequence prep step
    * after cleaning/sampling: each document's whitespace tokens cut
    * into windows of `maxLen` tokens starting every
    * `maxLen - overlap` tokens (consecutive chunks share `overlap`
    * tokens of context, the packing convention sequence builders
    * use). Emits one row per (doc, chunk): start offset, token
    * count, and the chunk text.
    *
    * Chunk starts are `k·stride` for `k in [0, ⌊(n-1)/stride⌋]` —
    * every token lands in ≥1 chunk, the last chunk may be short.
    * Pure narrow map (split + bounded explode, ≈ n/stride rows per
    * doc): NO shuffle at any scale — chunking 100 TB is
    * embarrassingly parallel and this plan keeps it that way.
    */
  /** Concat-and-chunk SEQUENCE PACKING — the step that turns a
    * cleaned corpus into fixed-length training sequences with no
    * padding waste: documents are laid head-to-tail into one token
    * stream per shard and the stream is cut every `maxLen` tokens;
    * a document spanning a cut contributes spans to both
    * neighboring sequences. (Best-fit bin packing needs a
    * sequential pass; concat-and-chunk is what large pipelines run
    * because it is order-deterministic and embarrassingly parallel
    * BY SHARD.)
    *
    * `shard = id % nShards` (replayable by any SQL engine;
    * production would hash). Each shard packs independently: ONE
    * per-shard running-offset window in id order, then a bounded
    * explode (⌈n/maxLen⌉+1 rows max per doc) emits each document's
    * span per overlapped sequence. The only data movement at any
    * corpus size is the per-shard sort the window needs — no joins,
    * no corpus-wide sequence, shard count = write parallelism.
    *
    * Output: (shard, seq_id, doc_id, tok_from, tok_to) — within-doc
    * token offsets [tok_from, tok_to) landing in `seq_id` of the
    * doc's shard. Every token of every non-empty document is
    * covered exactly once; every sequence holds exactly `maxLen`
    * tokens except each shard's last (spec-pinned).
    *
    * `nShards ≤ 0` (the default) sizes the shard count from the
    * input's partition count — i.e. the job's write parallelism —
    * so the per-shard window sort never funnels a 1000-executor
    * corpus through a fixed handful of tasks. Per-shard coverage
    * properties are shard-count-invariant (spec-pinned): any shard
    * count yields full single-coverage and all-full-but-last
    * sequences; only the (shard, seq_id) labeling changes.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int, nShards: Int = 0): DataFrame = {
    require(maxLen > 0, s"need maxLen > 0, got maxLen=$maxLen")
    val shards =
      if (nShards > 0) nShards else math.max(1, df.rdd.getNumPartitions)
    val L = lit(maxLen.toLong)
    val base = df
      .select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
    val off = base
      .withColumn("_end",
        sum(col("_n")).over(Window.partitionBy("shard").orderBy(col(idCol))))
      .withColumn("_start", col("_end") - col("_n"))
    off
      .withColumn("seq_id", explode(sequence(
        floor(col("_start") / L).cast("long"),
        floor((col("_end") - 1) / L).cast("long"))))
      .select(col("shard"), col("seq_id"), col(idCol),
        (greatest(col("_start"), col("seq_id") * L) - col("_start"))
          .as("tok_from"),
        (least(col("_end"), (col("seq_id") + 1) * L) - col("_start"))
          .as("tok_to"))
  }

  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int, overlap: Int): DataFrame = {
    require(maxLen > 0 && overlap >= 0 && overlap < maxLen,
      s"need 0 <= overlap < maxLen, got maxLen=$maxLen overlap=$overlap")
    val stride = maxLen - overlap
    val words = split(col(textCol), " ")
    val lastK = floor((size(col("_w")) - 1).cast("double") / stride)
      .cast("long")
    df.select(col(idCol), words.as("_w"))
      .filter(size(col("_w")) >= 1)
      .select(col(idCol), col("_w"),
        explode(sequence(lit(0L), lastK)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(maxLen),
          size(col("_w")) - col("chunk_idx") * stride).cast("long")
          .as("n_tok"),
        concat_ws(" ",
          slice(col("_w"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(maxLen))).as("chunk_text"))
  }
}
