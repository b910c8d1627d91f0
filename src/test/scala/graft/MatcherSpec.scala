package graft

import org.apache.spark.sql.functions._
import graft.tsdb.Matcher

/** Prometheus matcher semantics (reference search/constraint.go):
  * absent label == "", negations must keep null-labelled rows,
  * `.*` matches everything, `.+` excludes empty/absent, literal
  * alternations become IN-lists.
  */
class MatcherSpec extends SparkSpec {
  import spark.implicits._

  // rows: (id, job) with one absent (null) label value and one empty
  private def df = Seq(
    (1, Some("api")), (2, Some("web")), (3, Some("")), (4, None)
  ).toDF("id", "job")

  private def ids(m: Matcher): Set[Int] =
    m.toPredicate.map(df.filter).getOrElse(df)
      .select("id").collect().map(_.getInt(0)).toSet

  test("Eq matches value") { assert(ids(Matcher.Eq("job", "api")) == Set(1)) }

  test("Eq empty matches absent and empty (constraint.go null-page semantics)") {
    assert(ids(Matcher.Eq("job", "")) == Set(3, 4))
  }

  test("Neq keeps rows where the label is absent") {
    assert(ids(Matcher.Neq("job", "api")) == Set(2, 3, 4))
  }

  test("Re .* matches all rows including absent") {
    assert(Matcher.Re("job", ".*").toPredicate.isEmpty)
    assert(ids(Matcher.Re("job", ".*")) == Set(1, 2, 3, 4))
  }

  test("Re .+ excludes empty and absent") {
    assert(ids(Matcher.Re("job", ".+")) == Set(1, 2))
  }

  test("Re literal alternation compiles to IN and matches") {
    assert(ids(Matcher.Re("job", "api|web")) == Set(1, 2))
  }

  test("Re alternation containing empty matches absent") {
    assert(ids(Matcher.Re("job", "api|")) == Set(1, 3, 4))
  }

  test("Re general regex is fully anchored") {
    assert(ids(Matcher.Re("job", "a.*")) == Set(1))
    assert(ids(Matcher.Re("job", "p")) == Set.empty[Int]) // not substring
  }

  test("Nre keeps rows where the label is absent") {
    assert(ids(Matcher.Nre("job", "a.*")) == Set(2, 3, 4))
  }

  test("Nre .* matches nothing") {
    assert(ids(Matcher.Nre("job", ".*")) == Set.empty[Int])
  }

  test("Nre .+ matches only empty/absent") {
    assert(ids(Matcher.Nre("job", ".+")) == Set(3, 4))
  }

  test("regex matching empty string also matches absent labels") {
    assert(ids(Matcher.Re("job", "(api)?")) == Set(1, 3, 4))
  }

  test("compile ANDs matchers") {
    val p = Matcher.compile(Seq(Matcher.Re("job", ".+"), Matcher.Neq("job", "api")))
    assert(df.filter(p.get).select("id").collect().map(_.getInt(0)).toSet == Set(2))
  }
}
