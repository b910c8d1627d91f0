package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object NgramProbe {
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
    // warm
    Dedup.ngramJaccard(docs, "text", "doc_id", 4, 0.8, 100).count()
    val occ = Dedup.shingleOccurrences(docs, "text", "doc_id", 4)
    time("occ.count")(occ.count())
    time("occ.count2")(occ.count())
    time("occ.distinct.count")(occ.distinct().count())
    val keyed = docs.select(sha2(col("text"),256).as("_ck"), col("doc_id"), col("text"))
    val reps = keyed.groupBy(col("_ck")).agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
    time("occ_reps.count")(Dedup.shingleOccurrences(reps, "text", "doc_id", 4).count())
    time("shingles_reps.count")(Dedup.shingles(reps, "text", "doc_id", 4).count())
    time("capped")(Dedup.cappedShingles(reps, "text", "doc_id", 4, 100).count())
    time("full_1")(Dedup.ngramJaccard(docs, "text", "doc_id", 4, 0.8, 100).count())
    time("clusters")(Dedup.clusters(Dedup.ngramJaccard(docs, "text", "doc_id", 4, 0.8, 100)).count())
    spark.stop()
  }
}
