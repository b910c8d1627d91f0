package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up: replicate the driver-generated sf0.1 tables
  * `factor`× with key-space shifts, producing a synthetic "sf1"
  * under /tmp for the SCALE-SLOPE measurement (BENCH sf1 column).
  * This is measurement harness, not test data — correctness gates
  * always run on the driver's own parquet.
  *
  * Replica semantics (what a 10× corpus plausibly looks like):
  *   - every keyed table shifts its keys (and intra-replica FKs) by
  *     k·OFFSET, so replica rows are NEW entities — 10× customers,
  *     orders, series, documents, vectors;
  *   - `events.user_id` shifts → 10× SERIES over the same time
  *     window, the monitoring scale-up shape;
  *   - `documents.text` is re-sequenced per replica with a
  *     deterministic PER-DOCUMENT, PER-POSITION word permutation
  *     (sort by xxhash64(word, position, shifted doc_id)): token
  *     statistics (df counts, lengths, languages) scale like a real
  *     corpus while shingle sets diverge across replicas AND across
  *     documents — i.e. replicas are NEW content. Two rejected
  *     designs, both measured as pathological duplicate densities no
  *     real 10× corpus has: (a) a per-replica sort key canonicalizes
  *     every document in the replica onto one shared word ordering,
  *     degenerating the replica into a single giant near-dup
  *     cluster; (b) a per-document key WITHOUT the position
  *     (xxhash64(word, doc_id)) gives equal words equal keys, so
  *     repeated words sort ADJACENT — documents collapse into
  *     degenerate run-shingles ("the the the the") whose tiny
  *     homogeneous sets overlap across unrelated docs (348× the
  *     linear candidate-pair count at ×10, est-Jaccard inflated
  *     with no true similarity behind it). Seeding each POSITION
  *     scatters repeats like a real Fisher–Yates shuffle. On top of
  *     the permutation, 30% of word occurrences mutate into a
  *     per-replica novel vocabulary (Heaps' law: real corpora grow
  *     vocabulary ~corpus^β, so random-pair similarity stays ~0 as
  *     the corpus grows; the driver's 31-word synthetic vocabulary
  *     otherwise makes char-gram Jaccard between UNRELATED long
  *     docs creep toward the LSH threshold at 10× density, turning
  *     the true candidate set itself quadratic — a property of the
  *     data, which no engine can scan around, not of the plan).
  *     Replica 0 stays pristine, so the natural dup/near-dup
  *     structure of the source corpus is retained once; and 20% of
  *     replica docs keep their source text verbatim, because scaled
  *     crawls are exact-duplicate-heavy — the slope measurement
  *     must exercise the exact-dup-collapse guards, not dodge them;
  *   - `region`/`nation` are dimension tables and stay single-copy
  *     (their keys remain valid FK targets).
  */
object ScaleUp {

  /** Marker file: generation is atomic-enough for the bench (the
    * marker is written last; a half-built dir without it is
    * regenerated). The marker CONTENT is a fingerprint of (generator
    * version, source dir, factor): a dir built by an older generator
    * design, from a different source, or at a different factor is
    * stale and silently reusing it would attribute the measured
    * slopes to data this code no longer produces — bump
    * [[GenVersion]] on ANY change to the synthesis. */
  private val Marker = "_GRAFT_SCALEUP_DONE"

  /** v3: positional permutation + Heaps mutation + verbatim layer
    * (v1 per-replica sort and v2 per-doc word sort were rejected —
    * see the scaladoc). */
  private val GenVersion = 3

  private def fingerprint(src: String, factor: Int): String =
    s"v$GenVersion src=$src factor=$factor"

  def ensure(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val root = new java.io.File(dst)
    val marker = new java.io.File(root, Marker)
    if (marker.isFile && new String(
        java.nio.file.Files.readAllBytes(marker.toPath),
        "UTF-8") == fingerprint(src, factor)) return
    if (root.exists()) Fs.deleteRecursively(root)
    root.mkdirs()
    val t0 = System.nanoTime()

    def reps(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(
        spark.range(factor.toLong).toDF("_k")))

    def shift(c: String, offset: Long): Column =
      col(c) + col("_k") * offset

    def write(name: String, df: DataFrame): Unit =
      df.drop("_k").write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dimension tables: single copy
    Seq("region", "nation").foreach(n => write(n, tbl(n)))

    write("customer", reps(tbl("customer"))
      .withColumn("c_custkey", shift("c_custkey", 10_000_000L)))
    write("supplier", reps(tbl("supplier"))
      .withColumn("s_suppkey", shift("s_suppkey", 1_000_000L)))
    write("part", reps(tbl("part"))
      .withColumn("p_partkey", shift("p_partkey", 10_000_000L)))
    write("orders", reps(tbl("orders"))
      .withColumn("o_orderkey", shift("o_orderkey", 100_000_000L))
      .withColumn("o_custkey", shift("o_custkey", 10_000_000L)))
    write("lineitem", reps(tbl("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey", 100_000_000L))
      .withColumn("l_partkey", shift("l_partkey", 10_000_000L))
      .withColumn("l_suppkey", shift("l_suppkey", 1_000_000L)))
    write("events", reps(tbl("events"))
      .withColumn("event_id", shift("event_id", 100_000_000L))
      .withColumn("user_id", shift("user_id", 1_000_000L)))
    write("embeddings", reps(tbl("embeddings"))
      .withColumn("vec_id", shift("vec_id", 10_000_000L)))

    // documents: per-document, per-position word permutation plus
    // Heaps-law vocabulary growth (see scaladoc). The shifted doc_id
    // is unique per (doc, replica) and the position term scatters
    // repeated words instead of letting equal sort keys pile them
    // into adjacent runs; 30% of word occurrences mutate into a
    // per-replica novel vocabulary so cross-replica char-gram
    // similarity decays the way a real growing corpus's does.
    val docs = reps(tbl("documents"))
      .withColumn("doc_id", shift("doc_id", 10_000_000L))
      .withColumn("text",
        // 20% of replica docs keep their source text verbatim:
        // scaled crawls are exact-duplicate-heavy (the reason dedup
        // exists at 100 TB), and the exact-dup-collapse guards
        // should be exercised by the slope measurement, not dodged
        when(col("_k") === 0 ||
            pmod(xxhash64(col("doc_id"), lit(13)), lit(100)) < 20,
          col("text")).otherwise(
          array_join(
            transform(
              array_sort(zip_with(
                split(col("text"), " "),
                sequence(lit(0),
                  greatest(size(split(col("text"), " ")) - 1, lit(0))),
                (w, i) => {
                  val h = xxhash64(w, i, col("doc_id"))
                  struct(h.as("k"),
                    when(pmod(h, lit(100)) < 30,
                      concat(lit("v"), col("_k"), lit("w"),
                        pmod(xxhash64(w, i, col("doc_id"), lit(7)),
                          lit(300))))
                      .otherwise(w).as("w"))
                })),
              s => s.getField("w")),
            " ")))
    write("documents", docs)

    java.nio.file.Files.write(marker.toPath,
      fingerprint(src, factor).getBytes("UTF-8"))
    System.err.println(
      f"[scaleup] $src ×$factor → $dst in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure(spark, src, dst, factor)
    spark.stop()
  }
}
