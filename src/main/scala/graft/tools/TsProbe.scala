package graft.tools
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    df.selectExpr("ts", "unix_millis(ts)", "cast(ts as string)").show(3, false)
    spark.stop()
  }
}
