package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val out = spark.sql("SELECT graft_dot(a, b) AS d FROM vec_pairs")
      .head.getDouble(0)
    assert(out == 11.0)
  }

  test("graft_dot rejects wrong arity") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("2 arguments") ||
      e.getMessage.toLowerCase.contains("requirement"))
  }
}
