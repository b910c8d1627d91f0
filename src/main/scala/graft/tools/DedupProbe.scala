package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage timing for the minhash near-dup path. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("shingles.count")(Dedup.shingles(docs, "text", "doc_id", 4).count())
    time("capped.count")(
      Dedup.cappedShingles(docs, "text", "doc_id", 4, 100).count())
    val n1 = time("ngram.count")(
      Dedup.ngramJaccard(docs, "text", "doc_id", 4, 0.8, 100).count())
    println(s"[probe] ngram pairs = $n1")
    time("signatures.count")(
      Dedup.minHashSignatures(docs, "text", "doc_id", 4, 32).count())
    val cand = Dedup.minHashLsh(docs, "text", "doc_id", 4, 32, 8)
    val nCand = time("lsh_candidates.count")(cand.count())
    println(s"[probe] candidates = $nCand")
    time("verify.count")(
      Dedup.jaccardVerify(cand, docs, "text", "doc_id", 4).count())
    time("neardup.count")(
      Dedup.minHashNearDup(docs, "text", "doc_id", 4, 32, 8, 0.8).count())
    spark.stop()
  }
}
