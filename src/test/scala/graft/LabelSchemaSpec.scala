package graft

import org.apache.spark.sql.functions._
import graft.tsdb.LabelSchema

class LabelSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Map("job" -> "api", "env" -> "prod"), 1.0),
    (Map("job" -> "web"), 2.0) // sparse: no env label
  ).toDF("labels", "value")

  test("spread discovers the label universe and pivots to l_* columns") {
    val wide = LabelSchema.spread(df, "labels")
    assert(wide.columns.toSet == Set("value", "l_job", "l_env"))
    val rows = wide.orderBy("l_job").collect()
    assert(rows(0).getString(wide.columns.indexOf("l_job")) == "api")
    assert(rows(1).isNullAt(wide.columns.indexOf("l_env"))) // absent → null
  }

  test("gather inverts spread, omitting absent labels") {
    val back = LabelSchema.gather(LabelSchema.spread(df, "labels"), "labels")
    val maps = back.orderBy("value").collect()
      .map(_.getMap[String, String](back.columns.indexOf("labels")).toMap)
    assert(maps(0) == Map("job" -> "api", "env" -> "prod"))
    assert(maps(1) == Map("job" -> "web")) // null env dropped
  }

  test("absent labels match empty-string matchers after spread") {
    val wide = LabelSchema.spread(df, "labels")
    val p = graft.tsdb.Matcher.Eq("l_env", "").toPredicate.get
    assert(wide.filter(p).count() == 1)
  }
}
