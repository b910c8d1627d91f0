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
  *     deterministic PER-DOCUMENT word permutation (sort by
  *     xxhash64(word, shifted doc_id)): token statistics (df
  *     counts, lengths, languages) scale like a real corpus while
  *     shingle sets diverge both across replicas AND across
  *     documents — i.e. replicas are NEW content. (A per-replica
  *     sort key was tried first and rejected: one shared sort order
  *     CANONICALIZES every document in the replica onto the same
  *     word ordering, so any two docs with overlapping vocabulary
  *     share long sorted runs and the whole replica degenerates
  *     into one giant near-dup cluster — a pathological duplicate
  *     density no real 10× corpus has.) Replica 0 stays pristine,
  *     so the natural dup/near-dup structure of the source corpus
  *     is retained once;
  *   - `region`/`nation` are dimension tables and stay single-copy
  *     (their keys remain valid FK targets).
  */
object ScaleUp {

  /** Marker file: generation is atomic-enough for the bench (the
    * marker is written last; a half-built dir without it is
    * regenerated). */
  private val Marker = "_GRAFT_SCALEUP_DONE"

  def ensure(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val root = new java.io.File(dst)
    if (new java.io.File(root, Marker).isFile) return
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
    }
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

    // documents: per-document word permutation (see scaladoc — the
    // shifted doc_id is unique per (doc, replica), so it is the
    // whole permutation seed)
    val docs = reps(tbl("documents"))
      .withColumn("doc_id", shift("doc_id", 10_000_000L))
      .withColumn("text",
        when(col("_k") === 0, col("text")).otherwise(
          array_join(
            array_sort(split(col("text"), " "), (l, r) => {
              val hl = xxhash64(l, col("doc_id"))
              val hr = xxhash64(r, col("doc_id"))
              when(hl < hr, -1).when(hl > hr, 1).otherwise(0)
            }), " ")))
    write("documents", docs)

    java.nio.file.Files.write(
      new java.io.File(root, Marker).toPath, Array.emptyByteArray)
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
