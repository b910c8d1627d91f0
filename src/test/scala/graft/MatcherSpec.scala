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

  // ===== RE2 parity (reference compiles matchers with Go RE2,
  // search/constraint.go:639; Spark rlike is java.util.regex) =====

  test("Java-only constructs RE2 rejects are rejected loudly") {
    val re2Invalid = Seq(
      """(a)\1""",    // backreference
      "a(?=b)",       // lookahead
      "a(?!b)",       // negative lookahead
      "(?<=a)b",      // lookbehind
      "(?<!a)b",      // negative lookbehind
      "(?>ab)c",      // atomic group
      "a*+b",         // possessive quantifiers
      "a++",
      "a?+",
      "a{2,3}+",
      """\Gab""",     // \G anchor
      """ab\Z""",     // \Z (RE2 spells it \z)
      "(?P<x>a)(?P=x)") // named backreference
    re2Invalid.foreach { p =>
      assertThrows[IllegalArgumentException](Matcher.Re("job", p).toPredicate)
      assertThrows[IllegalArgumentException](Matcher.Nre("job", p).toPredicate)
    }
  }

  test("RE2-only spellings Java rejects are translated") {
    // (?P<name>...) named group (the RE2 spelling)
    assert(ids(Matcher.Re("job", "(?P<x>api|web)")) == Set(1, 2))
    // POSIX classes
    assert(ids(Matcher.Re("job", "[[:alpha:]]+")) == Set(1, 2))
    assert(ids(Matcher.Re("job", "[[:^digit:]]+")) == Set(1, 2))
    assert(ids(Matcher.Re("job", "[[:word:]]+")) == Set(1, 2))
    // RE2 treats a non-repetition brace as a literal; Java errors on it
    val braces = Seq((1, Some("a{b")), (2, Some("ab"))).toDF("id", "job")
    val got = braces.filter(Matcher.Re("job", "a\\{?b|a{b").toPredicate.get)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2))
    // valid counted repetition still works
    assert(ids(Matcher.Re("job", "a{1}pi")) == Set(1))
    // escaped quantifier followed by + is one-or-more literal, not
    // possessive — must NOT be rejected
    val plus = Seq((1, Some("++")), (2, Some("a"))).toDF("id", "job")
    assert(plus.filter(Matcher.Re("job", """\++""").toPredicate.get)
      .collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("RE2 edge parity: trailing newline, class '&', named groups, [[:]") {
    // Go's '$' is hard end-of-text: "view\n" must NOT match =~"view"
    // (Java's '$' would match before the trailing newline)
    val nl = Seq((1, Some("view")), (2, Some("view\n"))).toDF("id", "job")
    assert(nl.filter(Matcher.Re("job", "view").toPredicate.get)
      .collect().map(_.getInt(0)).toSet == Set(1))
    // '&' inside a class is a literal in RE2; Java's "a&&b" would be
    // the empty intersection and match nothing
    val amp = Seq((1, Some("a")), (2, Some("&")), (3, Some("b")), (4, Some("c")))
      .toDF("id", "job")
    assert(amp.filter(Matcher.Re("job", "[a&&b]").toPredicate.get)
      .collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // RE2-valid group names Java's grammar rejects (underscore)
    assert(ids(Matcher.Re("job", "(?P<status_code>api|web)")) == Set(1, 2))
    assert(ids(Matcher.Re("job", "(?<status_code>api|web)")) == Set(1, 2))
    // malformed POSIX opener must fail the compile gate, not crash
    // with an index error
    intercept[IllegalArgumentException] {
      Matcher.Re("job", "[[:]").toPredicate
    }
  }

  test("property: safe-subset patterns match identically to anchored java full-match") {
    // within the syntax subset BOTH engines accept, boolean full-match
    // results agree engine-to-engine; this pins the graft compile
    // chain (anchoring + null handling + translation) to the
    // same-JVM reference for a generated corpus
    val rnd = new scala.util.Random(42)
    val atoms = Seq("a", "b", "c", "1", ".", "[ab]", "[^c]", """\d""", "(a|b)")
    val quants = Seq("", "", "*", "+", "?", "{1,2}", "*?")
    def pat(): String = {
      val k = 1 + rnd.nextInt(4)
      val parts = Seq.fill(k)(atoms(rnd.nextInt(atoms.size)) +
        quants(rnd.nextInt(quants.size)))
      if (rnd.nextBoolean()) parts.mkString else parts.mkString("|")
    }
    val alphabet = "abc1d"
    def str(): String =
      Seq.fill(rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val strings = (Seq("", "a", "abc") ++ Seq.fill(17)(str())).distinct
    val data = strings.zipWithIndex.map { case (s, i) => (i, Some(s)) }
      .toDF("id", "job")
    (0 until 120).foreach { _ =>
      val p = pat()
      val expect = strings.zipWithIndex.collect {
        case (s, i) if java.util.regex.Pattern.matches("^(?:" + p + ")$", s) => i
      }.toSet
      val got = Matcher.Re("job", p).toPredicate.map(data.filter).getOrElse(data)
        .select("id").collect().map(_.getInt(0)).toSet
      assert(got == expect, s"pattern <$p> diverged")
    }
  }
}
