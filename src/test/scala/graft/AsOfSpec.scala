package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private def left = Seq(
    (1L, "u1", ts(1000L), 10.0),
    (2L, "u1", ts(5000L), 20.0),
    (3L, "u2", ts(3000L), 30.0), // u2 has no right rows at all
    (4L, "u1", ts(2000L), 40.0)  // exactly at a right timestamp
  ).toDF("id", "user", "ts", "value")

  private def right = Seq(
    ("u1", ts(500L), 1.5),
    ("u1", ts(2000L), 2.5),
    ("u1", ts(4999L), 3.5),
    ("u1", ts(9999L), 9.5)  // after every left row
  ).toDF("user", "ts", "price")

  test("asofJoin carries the latest right row at or before each left row") {
    val out = AsOf.asofJoin(left, right, Seq("user"), "ts", "ts",
        Seq("ts", "price"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[Timestamp]("asof_ts")),
        Option(r.getAs[Any]("asof_price"))))
      .toMap
    assert(out(1L) == (Some(ts(500L)), Some(1.5)))
    assert(out(2L) == (Some(ts(4999L)), Some(3.5)))
    // equal timestamps qualify (<= semantics)
    assert(out(4L) == (Some(ts(2000L)), Some(2.5)))
    // no preceding right row → NULL carries (left-join semantics)
    assert(out(3L) == (None, None))
  }

  test("asofJoin preserves left schema/rows and the carry types") {
    val out = AsOf.asofJoin(left, right, Seq("user"), "ts", "ts",
      Seq("price"))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("id", "user", "ts", "value",
      "asof_price"))
    assert(out.schema("asof_price").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("asofJoin breaks right-side ties on the payload total order") {
    val dupRight = Seq(
      ("u1", ts(500L), 1.0),
      ("u1", ts(500L), 7.0) // same (key, ts): larger payload wins
    ).toDF("user", "ts", "price")
    val out = AsOf.asofJoin(left.filter($"id" === 1L), dupRight,
        Seq("user"), "ts", "ts", Seq("price"))
      .collect().head
    assert(out.getAs[Double]("asof_price") == 7.0)
  }
}
