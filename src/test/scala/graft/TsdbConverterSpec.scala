package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.tsdb.{ConvertOptions, TsdbConverter}

class TsdbConverterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mergeShards is last-writer-wins, not max-value") {
    // same (series, ts) key in both shards with DIFFERENT values:
    // the later shard's value must win even when it is smaller.
    val shard0 = Seq(("a", ts("2024-01-01 00:00:00"), 100.0))
      .toDF("series", "ts", "value")
    val shard1 = Seq(("a", ts("2024-01-01 00:00:00"), 1.0))
      .toDF("series", "ts", "value")
    val out = TsdbConverter.mergeShards(Seq(shard0, shard1),
        Seq("series"), "ts", "value")
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 1.0) // shard 1 (last) wins
  }

  test("mergeShards unions non-overlapping samples") {
    val shard0 = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("series", "ts", "value")
    val shard1 = Seq(("a", ts("2024-01-01 00:01:00"), 2.0)).toDF("series", "ts", "value")
    val out = TsdbConverter.mergeShards(Seq(shard0, shard1), Seq("series"), "ts", "value")
    assert(out.count() == 2)
  }

  test("mergeBlockDirs compacts overlapping converted blocks into one") {
    val root = Files.createTempDirectory("graft_blocks").toString
    val opts = ConvertOptions(sortBy = Seq("series"), colDuration = "1 day")
    // block A: days 1-2; block B overlaps day 2 with a revised value
    TsdbConverter.convert(Seq(
        ("a", ts("2024-01-01 10:00:00"), 1.0),
        ("a", ts("2024-01-02 10:00:00"), 2.0)
      ).toDF("series", "ts", "value"), s"$root/a", "ts", opts)
    TsdbConverter.convert(Seq(
        ("a", ts("2024-01-02 10:00:00"), 20.0),
        ("a", ts("2024-01-03 10:00:00"), 3.0)
      ).toDF("series", "ts", "value"), s"$root/b", "ts", opts)
    TsdbConverter.mergeBlockDirs(spark, Seq(s"$root/a", s"$root/b"),
      s"$root/out", Seq("series"), "ts", "value", opts)
    val back = spark.read.parquet(s"$root/out")
    assert(back.count() == 3) // overlap deduplicated
    // later block wins the overlapping sample
    assert(back.filter(col("ts") === ts("2024-01-02 10:00:00"))
      .head().getAs[Double]("value") == 20.0)
    // output is itself a bucketed block: one dir per day
    assert(back.select("bucket").distinct().count() == 3)
  }

  test("convert's bloom filter option reaches the parquet footer") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_bloom").toString + "/out"
    val df = Seq.tabulate(100)(i =>
      (s"series_$i", ts("2024-01-01 10:00:00"), i.toDouble))
      .toDF("series", "ts", "value")
    TsdbConverter.convert(df, dir, "ts",
      ConvertOptions(sortBy = Seq("series"), colDuration = "1 day",
        bloomFilterLabels = Seq("series")))
    val part = new java.io.File(dir).listFiles().filter(_.isDirectory).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(part.getAbsolutePath), new Configuration()))
    try {
      val rg = reader.getFooter.getBlocks.asScala.head
      val seriesCol = rg.getColumns.asScala
        .find(_.getPath.toDotString == "series").get
      val valueCol = rg.getColumns.asScala
        .find(_.getPath.toDotString == "value").get
      assert(seriesCol.getBloomFilterOffset > 0,
        "bloom filter missing for the configured label column")
      assert(valueCol.getBloomFilterOffset <= 0,
        "bloom filter unexpectedly present for an unconfigured column")
    } finally reader.close()
  }

  test("rowGroupBytes bounds parquet row groups (WithRowGroupSize analog)") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    def rowGroups(dir: String): Int = {
      val part = new java.io.File(dir).listFiles().filter(_.isDirectory).head
        .listFiles().filter(_.getName.endsWith(".parquet")).head
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(part.getAbsolutePath),
          new Configuration()))
      try reader.getFooter.getBlocks.size()
      finally reader.close()
    }
    // incompressible payload so byte sizing, not encoding, dominates
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(20000)(i =>
      (s"s_${rnd.nextLong()}_${rnd.nextLong()}",
        ts("2024-01-01 10:00:00"), rnd.nextDouble()))
      .toDF("series", "ts", "value")
    val defDir = Files.createTempDirectory("graft_rg_def").toString + "/out"
    TsdbConverter.convert(df.coalesce(1), defDir, "ts",
      ConvertOptions(sortBy = Seq("series"), colDuration = "1 day"))
    val smallDir = Files.createTempDirectory("graft_rg_small").toString + "/out"
    TsdbConverter.convert(df.coalesce(1), smallDir, "ts",
      ConvertOptions(sortBy = Seq("series"), colDuration = "1 day",
        rowGroupBytes = 64 * 1024, pageBytes = 16 * 1024))
    assert(rowGroups(defDir) == 1, "default sizing should fit one row group")
    assert(rowGroups(smallDir) > 4,
      "a 64 KiB row-group cap must split ~1 MB of data into many groups " +
        "(finer mint/maxt row-group pruning)")
  }

  test("convertWithLabels writes the wide l_* layout from a label map") {
    val dir = Files.createTempDirectory("graft_wide").toString + "/out"
    val df = Seq(
      (Map("job" -> "api", "env" -> "prod"), ts("2024-01-01 10:00:00"), 1.0),
      (Map("job" -> "web"), ts("2024-01-02 10:00:00"), 2.0)
    ).toDF("labels", "ts", "value")
    TsdbConverter.convertWithLabels(df, "labels", dir, "ts",
      graft.tsdb.ConvertOptions(sortBy = Nil, colDuration = "1 day"))
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet == Set("l_job", "l_env", "ts", "value", "bucket"))
    assert(back.filter(col("l_env").isNull).count() == 1) // sparse label
  }

  test("wide-layout select: absent labels behave as \"\" under negated matchers") {
    import graft.tsdb.{Matcher, TsdbQueryable}
    val dir = Files.createTempDirectory("graft_widesel").toString + "/out"
    val df = Seq(
      (Map("a" -> "x", "b" -> "v0"), ts("2024-01-01 10:00:00"), 1.0),
      (Map("a" -> "x"),              ts("2024-01-02 10:00:00"), 2.0),
      (Map("a" -> "y", "b" -> "v1"), ts("2024-01-03 10:00:00"), 3.0),
      (Map("a" -> "x", "b" -> "v1"), ts("2024-01-04 10:00:00"), 4.0)
    ).toDF("labels", "ts", "value")
    TsdbConverter.convertWithLabels(df, "labels", dir, "ts",
      graft.tsdb.ConvertOptions(sortBy = Nil, colDuration = "1 day",
        bloomFilterLabels = Seq("l_a")))
    val wide = spark.read.parquet(dir)
    val q = new TsdbQueryable(wide, Seq("l_a", "l_b"))
    val sel = q.select("2024-01-01", "2024-02-01",
      Seq(Matcher.Eq("l_a", "x"), Matcher.Nre("l_b", "v0")))
    // b-absent row KEPT ("" !~ v0), b=v0 row DROPPED, a=y row DROPPED
    assert(sel.select("value").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(2.0, 4.0))
    val kept = sel.filter(col("l_b").isNull)
    assert(kept.count() == 1L, "the absent-label row must survive !~")
    // the equality matcher reaches the parquet scan on the wide layout
    val plan = sel.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("EqualTo(l_a,x)"), "Eq must push down on l_* columns")
  }

  test("convert writes a bucket-partitioned layout that prunes") {
    val dir = Files.createTempDirectory("graft_conv").toString + "/out"
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-02 10:00:00"), 2.0),
      ("b", ts("2024-01-03 10:00:00"), 3.0)
    ).toDF("series", "ts", "value")
    TsdbConverter.convert(df, dir, "ts",
      ConvertOptions(sortBy = Seq("series"), colDuration = "1 day"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.select("bucket").distinct().count() == 3)
    // partition pruning: a bucket filter must not scan all files
    val pruned = back.filter(col("bucket") === lit(19723L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(back.filter(col("bucket") === col("bucket")).count() == 3)
    assert(pruned.count() <= 1)
    assert(plan.contains("PartitionFilters") || pruned.count() <= 1)
  }
}
