package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.Matcher
import graft.tsdb.promql.{Expr, PromQLParseException, PromQLParser}
import graft.tsdb.promql.Expr._

class PromQLParserSpec extends AnyFunSuite {

  private def p(q: String): Expr = PromQLParser.parse(q)

  test("bare metric and matcher selectors") {
    assert(p("http_requests_total") == Selector("http_requests_total", Nil))
    assert(p("""m{job="api", code!="500", path=~"/v1/.*", env!~"dev|test"}""") ==
      Selector("m", Seq(
        Matcher.Eq("job", "api"), Matcher.Neq("code", "500"),
        Matcher.Re("path", "/v1/.*"), Matcher.Nre("env", "dev|test"))))
    assert(p("""{job="api"}""") == Selector("", Seq(Matcher.Eq("job", "api"))))
  }

  test("selector without metric or matchers is rejected") {
    intercept[PromQLParseException](p("{}"))
  }

  test("range selectors lex compound durations") {
    assert(p("m[5m]") == Range(Selector("m", Nil), 300000L))
    assert(p("m[1h30m]") == Range(Selector("m", Nil), 5400000L))
    assert(p("m[90s]") == Range(Selector("m", Nil), 90000L))
    assert(p("m[2w]") == Range(Selector("m", Nil), 1209600000L))
  }

  test("offset applies to vector and range selectors") {
    assert(p("m offset 1d") == Selector("m", Nil, 86400000L))
    assert(p("m[5m] offset 1h") == Range(Selector("m", Nil, 3600000L), 300000L))
    assert(p("m offset -5m") == Selector("m", Nil, -300000L))
  }

  test("arithmetic precedence and associativity") {
    // * binds tighter than +
    assert(p("a + b * c") ==
      Bin("+", Selector("a", Nil), Bin("*", Selector("b", Nil), Selector("c", Nil))))
    // ^ is right-associative: 2^3^2 = 2^(3^2)
    assert(p("2 ^ 3 ^ 2") == Bin("^", Num(2), Bin("^", Num(3), Num(2))))
    // same-precedence operators associate left
    assert(p("a - b + c") ==
      Bin("+", Bin("-", Selector("a", Nil), Selector("b", Nil)), Selector("c", Nil)))
    // comparison binds looser than arithmetic
    assert(p("a + b > c") ==
      Bin(">", Bin("+", Selector("a", Nil), Selector("b", Nil)), Selector("c", Nil)))
    // set operators loosest; or looser than and
    assert(p("a and b or c") ==
      Bin("or", Bin("and", Selector("a", Nil), Selector("b", Nil)), Selector("c", Nil)))
  }

  test("parentheses override precedence") {
    assert(p("(a + b) * c") ==
      Bin("*", Bin("+", Selector("a", Nil), Selector("b", Nil)), Selector("c", Nil)))
  }

  test("unary minus and scientific/special numbers") {
    assert(p("-3") == Neg(Num(3)))
    assert(p("1e3") == Num(1000.0))
    assert(p("2.5e-2") == Num(0.025))
    assert(p("Inf") == Num(Double.PositiveInfinity))
    assert(p("NaN").asInstanceOf[Num].v.isNaN)
  }

  test("aggregations with by/without in both positions") {
    val expected = Agg("sum", None, Selector("m", Nil),
      Some(Grouping(by = true, Seq("job", "instance"))))
    assert(p("sum by (job, instance) (m)") == expected)
    assert(p("sum(m) by (job, instance)") == expected)
    assert(p("avg without (pod) (m)") ==
      Agg("avg", None, Selector("m", Nil), Some(Grouping(by = false, Seq("pod")))))
    assert(p("count(m)") == Agg("count", None, Selector("m", Nil), None))
  }

  test("parameterized aggregations") {
    assert(p("topk(3, m)") == Agg("topk", Some(Num(3)), Selector("m", Nil), None))
    assert(p("quantile(0.9, m) by (job)") ==
      Agg("quantile", Some(Num(0.9)), Selector("m", Nil),
        Some(Grouping(by = true, Seq("job")))))
    assert(p("""count_values("code", m)""") ==
      Agg("count_values", Some(Str("code")), Selector("m", Nil), None))
  }

  test("function calls") {
    assert(p("rate(m[5m])") == Call("rate", Seq(Range(Selector("m", Nil), 300000L))))
    assert(p("clamp(m, 0, 10)") ==
      Call("clamp", Seq(Selector("m", Nil), Num(0), Num(10))))
    assert(p("""label_replace(m, "dst", "$1", "src", "(.*)")""") ==
      Call("label_replace", Seq(Selector("m", Nil),
        Str("dst"), Str("$1"), Str("src"), Str("(.*)"))))
  }

  test("vector matching modifiers") {
    assert(p("a / on(instance) b") ==
      Bin("/", Selector("a", Nil), Selector("b", Nil),
        matching = Some(Matching(on = true, Seq("instance")))))
    assert(p("a * ignoring(job) b") ==
      Bin("*", Selector("a", Nil), Selector("b", Nil),
        matching = Some(Matching(on = false, Seq("job")))))
    assert(p("a * on(instance) group_left(role) b") ==
      Bin("*", Selector("a", Nil), Selector("b", Nil),
        matching = Some(Matching(on = true, Seq("instance"), side = -1, include = Seq("role")))))
    assert(p("a * on(instance) group_right() b") ==
      Bin("*", Selector("a", Nil), Selector("b", Nil),
        matching = Some(Matching(on = true, Seq("instance"), side = 1))))
    assert(p("a and on(x) b") ==
      Bin("and", Selector("a", Nil), Selector("b", Nil),
        matching = Some(Matching(on = true, Seq("x")))))
  }

  test("bool modifier on comparisons only") {
    assert(p("a > bool b") ==
      Bin(">", Selector("a", Nil), Selector("b", Nil), boolMod = true))
    intercept[PromQLParseException](p("a + bool b"))
  }

  test("malformed input is rejected loudly") {
    intercept[PromQLParseException](p("a +"))
    intercept[PromQLParseException](p("a b"))          // trailing input
    intercept[PromQLParseException](p("""m{job=api}""")) // unquoted value
    intercept[PromQLParseException](p(""""unterminated"""))
    intercept[PromQLParseException](p("m[5m"))
    intercept[PromQLParseException](p("m[17]"))        // number, not duration
    intercept[PromQLParseException](p("rate(m)[5m]"))  // range on non-selector
    intercept[PromQLParseException](p("by(x)"))        // keyword misuse
    intercept[PromQLParseException](p("m offset 5"))   // offset needs duration
  }

  test("string escapes") {
    assert(p("""f("a\"b", 'c\'d', "e\nf")""") ==
      Call("f", Seq(Str("a\"b"), Str("c'd"), Str("e\nf"))))
  }

  test("identifiers may carry colons (recording-rule names)") {
    assert(p("job:http_requests:rate5m") ==
      Selector("job:http_requests:rate5m", Nil))
  }
}
