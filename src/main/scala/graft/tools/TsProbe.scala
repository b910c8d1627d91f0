package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does a ts-range predicate reach PushedFilters on
  * the events parquet under each loader strategy (raw NTZ column vs
  * session-TZ cast)? Informs SparkEntry.t's choice.
  */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    def pushed(name: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"=== $name ===")
      plan.linesIterator.filter(l => l.contains("PushedFilters"))
        .foreach(println)
    }
    // raw NTZ comparison
    pushed("ntz_literal", df.filter(col("ts") >=
      to_timestamp_ntz(lit("2024-01-05 00:00:00"))))
    // cast-to-LTZ comparison (the loader's current shape)
    pushed("ltz_cast", df.withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("ts").cast("timestamp") >=
        timestamp_millis(lit(1704412800000L))))
    spark.stop()
  }
}
