package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the minhash near-dup SCALE SLOPE: per-stage
  * row counts and wall times at an arbitrary documents dir, to localize
  * where a 10× input turns into a >10× runtime. Dev tool, not a gate.
  */
object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}  dir=$dir")

    // stage 1: signatures (narrow)
    val sigs = graft.operators.Dedup
      .minHashSignatureArrays(docs, "text", "doc_id", 4, 32)
    time("signatures count")(println(s"  sigs=${sigs.count()}"))

    // stage 2: banding + bucket histogram (pre-cap)
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, 4)).as("bhash"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bhash"))
    val hist = banded.groupBy("band", "bhash").count().cache()
    time("bucket histogram") {
      val top = hist.orderBy(desc("count")).limit(12)
        .collect().map(_.getLong(2))
      // coalesce: sum over zero rows is NULL (empty/short-doc dirs
      // are exactly what a slope investigation may feed this tool)
      val pairs = hist.agg(coalesce(
        sum(col("count") * (col("count") - 1) / 2).cast("long"),
        lit(0L))).first().getLong(0)
      println(s"  buckets=${hist.count()}  top=${top.mkString(",")}")
      println(s"  implied pre-cap candidate pairs=$pairs")
    }
    hist.unpersist()

    // stage 3: full pipeline pieces, timed separately
    val (repPairs, memberOf) = graft.operators.Dedup
      .minHashLshReps(docs, "text", "doc_id", 4, 32, 8, 10000,
        minEst = 0.6)
    val cands = time("rep candidates (est>=0.6)") {
      val c = repPairs
        .select(col("rid_a").as("id_a"), col("rid_b").as("id_b"))
        .localCheckpoint()
      println(s"  cands=${c.count()}")
      c
    }
    time("jaccard verify") {
      val v = graft.operators.Dedup
        .jaccardVerify(cands, docs, "text", "doc_id", 4)
        .filter(col("jaccard") >= 0.8)
      println(s"  verified=${v.count()}")
    }
    val _ = memberOf
    spark.stop()
  }
}
