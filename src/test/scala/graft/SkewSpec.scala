package graft

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    // skewed fact: key 1 dominates
    val fact = ((1 to 100).map(i => (1L, i.toLong)) ++
      Seq((2L, 101L), (3L, 102L))).toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "warm"), (4L, "unjoined")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", "row_id", nSalts = 8)
      .select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.size == 101)
  }
}
