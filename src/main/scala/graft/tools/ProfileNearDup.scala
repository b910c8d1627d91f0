package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash near-dup pipeline stages. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    for (i <- 1 to 3) {
      val n = time(s"full minHashNearDup #$i") {
        graft.operators.Dedup.minHashNearDup(docs, "text", "doc_id",
          threshold = 0.8).count()
      }
      System.err.println(s"  pairs=$n")
    }
    for (i <- 1 to 3) {
      val n = time(s"minHashLsh #$i") {
        graft.operators.Dedup.minHashLsh(docs, "text", "doc_id").count()
      }
      System.err.println(s"  lsh pairs=$n")
    }
    // stage breakdown
    for (i <- 1 to 3) {
      val (repPairs, memberOf) = graft.operators.Dedup
        .minHashLshReps(docs, "text", "doc_id", 4, 32, 8, 10000)
      val cands = time(s"cands checkpoint #$i") {
        repPairs.filter(col("est_jaccard") >= 0.6)
          .select(col("rid_a").as("id_a"), col("rid_b").as("id_b"))
          .localCheckpoint()
      }
      System.err.println(s"  cands=${cands.count()}")
      val v = time(s"verify #$i") {
        graft.operators.Dedup.jaccardVerify(cands, docs, "text", "doc_id", 4)
          .filter(col("jaccard") >= 0.8).count()
      }
      System.err.println(s"  verified=$v")
      val m = time(s"memberOf count #$i") { memberOf.count() }
      System.err.println(s"  members=$m")
    }
    spark.stop()
  }
}
