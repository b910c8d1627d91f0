package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch profiler for the corpusClean stages (minhash variant). */
object ProfilePipeline {
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
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    for (i <- 1 to 3) {
      System.err.println(s"--- pass $i ---")
      val scored = docs.select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.qualityScore(col("text"), "en").as("quality"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val gated = scored.filter(col("lang") === "en" && col("quality") >= 0.5)
      val uniq = time("gate+exact+checkpoint") {
        gated.join(
          Dedup.exact(gated, "text", "doc_id").filter(col("dup_rank") === 1)
            .select(col("doc_id")),
          Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val pairs = time("minhash pairs (count)") {
        val p = Dedup.minHashNearDup(uniq, "text", "doc_id", n = 4,
          threshold = 0.8, assumeDistinct = true)
        p.count(); p
      }
      val comp = time("clusters (count)") {
        val c = Dedup.clusters(pairs); c.count(); c
      }
      time("final anti-join count") {
        uniq.join(comp.filter(col("cluster_id") < col("doc_id"))
            .select(col("doc_id")), Seq("doc_id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
