package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine. Designed
  * shuffle-first: every variant keys its one shuffle on a
  * high-cardinality column (content hash, shingle, LSH bucket) so
  * there are no hot keys at 100 TB; nothing collects to the driver.
  */
object Dedup {

  /** Exact dedup: rank rows within identical-content groups so
    * `dup_rank > 1` rows can be dropped. One hash-shuffle.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.select(col(idCol), h.as("content_hash"),
      row_number().over(w).as("dup_rank"))
  }

  /** Distinct character n-gram shingles per document: one row per
    * (id, shingle). The inverted-index building block shared by the
    * Jaccard and MinHash paths.
    */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))))
          .as("pos"),
        col(textCol))
      .select(col(idCol), expr(s"substring(`$textCol`, pos, $n)").as("shingle"))
      .distinct()

  /** n-gram Jaccard near-duplicate pairs above `threshold`.
    *
    * Exact form: inverted index on shingle → per-pair intersection
    * count → |A∩B| / (|A|+|B|-|A∩B|). The shingle join is the only
    * shuffle and its key (the shingle) has corpus-scale cardinality.
    * At 100 TB you don't run this on all pairs — you run
    * [[minHashLsh]] to get candidates and this as the verify step on
    * the (tiny) candidate set; the math is identical.
    */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, textCol, idCol, n).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // Fixed affine permutation constants for MinHash, generated once
  // from a splitmix-style scramble of the function index (pure data,
  // no RNG at runtime — reproducible everywhere).
  private val MersennePrime = 2147483647L // 2^31-1
  private def perm(i: Int): (Long, Long) = {
    var z = (i + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (MersennePrime - 1) + 1
    val b = math.abs(z * 31) % MersennePrime
    (a, b)
  }

  /** MinHash signature: for each of `k` affine permutations of the
    * base shingle hash, the per-document minimum. One shuffle
    * (groupBy id) with full map-side partial aggregation.
    */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int): DataFrame = {
    val sh = shingles(df, textCol, idCol, n)
    val base = pmod(xxhash64(col("shingle")), lit(MersennePrime))
    val mins = (0 until k).map { i =>
      val (a, b) = perm(i)
      min(pmod(base * a + b, lit(MersennePrime))).as(s"h$i")
    }
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH candidate pairs: split the k-wide signature into
    * `bands` bands, bucket by (band, hash(band slice)), emit pairs
    * sharing any bucket, with the signature-estimated Jaccard.
    * Shuffle key (band, bandHash) has corpus-scale cardinality —
    * this is the 100 TB near-dup path.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
      n: Int = 4, k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val sigs = minHashSignatures(df, textCol, idCol, n, k)
      .withColumn("sig", array((0 until k).map(i => col(s"h$i")): _*))
      .select(col(idCol), col("sig"))
      .cache()
    val banded = sigs.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bhash"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bhash"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k, 4))
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word tokens: per-bit signed vote weighted
    * by token frequency, packed into a long. Pure aggregation —
    * one shuffle, no joins.
    */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
    val h = xxhash64(col("tok"))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map { j =>
          when(col(s"b$j") > 0, lit(1L) << j).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` over a
    * (small) corpus: all-pairs form for correctness; the scale path
    * buckets by [[graft.functions.VectorFunctions.lshBucket]] first.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
    v.as("a").join(v.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
