package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Invariants of the scale-slope replica generator
  * ([[graft.tools.ScaleUp]]). The ×10 bench column is only as
  * meaningful as the replica corpus is realistic, and two generator
  * designs were rejected this round after MEASURING pathological
  * duplicate densities (RESULTS_r09.md §scale-slope) — these specs
  * pin the properties that made the third design sound, so a future
  * edit cannot silently regress the slope measurement's validity.
  */
class ScaleUpSpec extends SparkSpec {
  import ScaleUpSpec._

  private lazy val (src, dst, factor) = buildOnce(spark)

  private def srcDocs = spark.read.parquet(s"$src/documents.parquet")
  private def dstDocs = spark.read.parquet(s"$dst/documents.parquet")

  test("row counts scale by the factor; dimension tables stay single-copy") {
    assert(dstDocs.count() === srcDocs.count() * factor)
    val ev = spark.read.parquet(s"$src/events.parquet").count()
    assert(spark.read.parquet(s"$dst/events.parquet").count() === ev * factor)
    assert(spark.read.parquet(s"$dst/region.parquet").count() ===
      spark.read.parquet(s"$src/region.parquet").count())
  }

  test("replica 0 is pristine: (doc_id, text) identical to the source") {
    val orig = dstDocs.filter(col("doc_id") < Offset)
      .select("doc_id", "text")
    assert(orig.exceptAll(srcDocs.select("doc_id", "text")).isEmpty)
    assert(srcDocs.select("doc_id", "text").exceptAll(orig).isEmpty)
  }

  test("~20% of replica docs keep their source text verbatim (exact-dup layer)") {
    val joined = dstDocs.filter(col("doc_id") >= Offset)
      .select((col("doc_id") % Offset).as("doc_id"), col("text").as("rt"))
      .join(srcDocs.select(col("doc_id"), col("text").as("st")), "doc_id")
    val n = joined.count()
    val verbatim = joined.filter(col("rt") === col("st")).count()
    val frac = verbatim.toDouble / n
    // binomial p=.2 over (factor-1)*|docs| draws; generous band
    assert(frac > 0.12 && frac < 0.28,
      s"verbatim fraction $frac outside [0.12, 0.28]")
  }

  test("permuted replicas preserve token count and scale the vocabulary (Heaps)") {
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("w"))
    // token count per doc preserved: permutation + 1:1 mutation
    val badLen = dstDocs.filter(col("doc_id") >= Offset)
      .select((col("doc_id") % Offset).as("doc_id"),
        size(split(col("text"), " ")).as("rn"))
      .join(srcDocs.select(col("doc_id"),
        size(split(col("text"), " ")).as("sn")), "doc_id")
      .filter(col("rn") =!= col("sn")).count()
    assert(badLen === 0L)
    val v0 = toks(srcDocs).distinct().count()
    val v1 = toks(dstDocs).distinct().count()
    assert(v1 > v0 * 2,
      s"replica vocabulary $v1 did not grow over source $v0 — " +
        "novel-vocab mutation regressed; random-pair similarity will " +
        "creep toward the LSH threshold at scale")
  }

  test("no degenerate run-shingles: adjacent-equal-word rate stays near the source's") {
    def runRate(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select(split(col("text"), " ").as("ws"))
        .select(
          aggregate(
            zip_with(col("ws"), slice(col("ws"), 2, 1000000),
              (a, b) => when(a === b, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).as("eq"),
          (size(col("ws")) - 1).as("n"))
        .agg(sum("eq").cast("double") / sum("n")).head.getDouble(0)
      r
    }
    val srcRate = runRate(srcDocs)
    val repRate = runRate(dstDocs.filter(col("doc_id") >= Offset))
    // the rejected word-keyed sort produced rates an order of
    // magnitude above the source's natural repeat rate
    assert(repRate < srcRate * 2 + 0.01,
      s"replica adjacent-repeat rate $repRate vs source $srcRate — " +
        "repeated words are piling into runs again")
  }

  test("replicas still pass the pipeline's language gate") {
    val rep = dstDocs.filter(col("doc_id") >= Offset)
    val n = rep.count()
    val en = rep.filter(TextFunctions.langId(col("text")) === "en").count()
    assert(en.toDouble / n > 0.95,
      s"only $en/$n replica docs classify en — the corpusClean slope " +
        "measurement would silently drop the replicas at its first gate")
  }
}

object ScaleUpSpec {
  private val Offset = 10000000L

  /** Build one factor-3 replica of the smallest testdata SF into a
    * temp dir, once per JVM. */
  private def buildOnce(
      spark: org.apache.spark.sql.SparkSession): (String, String, Int) = {
    val src = "/root/testdata/sf0.001"
    val dstFile = java.nio.file.Files
      .createTempDirectory("graft_scaleup_spec").toFile
    // a full replica corpus per test run must not accumulate in /tmp
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => graft.tools.Fs.deleteRecursively(dstFile)))
    val factor = 3
    graft.tools.ScaleUp.ensure(spark, src, dstFile.toString, factor)
    (src, dstFile.toString, factor)
  }
}
