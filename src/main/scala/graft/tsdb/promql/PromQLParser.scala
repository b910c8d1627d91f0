package graft.tsdb.promql

import graft.tsdb.Matcher

/** PromQL abstract syntax — the expression language evaluated by the
  * engines the reference feeds (its Queryable serves Prometheus /
  * Thanos / Cortex PromQL evaluators; the grammar is Prometheus's
  * public `promql/parser`). graft accepts the query STRING a
  * Prometheus user already has and lowers it onto the Spark-native
  * operators ([[graft.tsdb.PromOps]], [[graft.tsdb.Matcher]]) via
  * [[PromQL]].
  */
sealed trait Expr

object Expr {
  /** Scalar literal (also the folded result of scalar arithmetic). */
  final case class Num(v: Double) extends Expr
  /** String literal — only valid as a function/aggregation argument. */
  final case class Str(v: String) extends Expr
  /** `@` modifier target: a fixed epoch-ms instant, or the symbolic
    * `start()` / `end()` that resolve to the query range's bounds
    * (the evaluation time for an instant query).
    */
  sealed trait At
  final case class AtMs(ms: Long) extends At
  case object AtStart extends At
  case object AtEnd extends At

  /** Instant vector selector `metric{l="v", ...}` with optional
    * `offset` and `@` modifiers. The metric name resolves to a table
    * in the [[PromQLContext]]; matchers compile through [[Matcher]]
    * (same RE2 gate, set-match optimization and absent==""
    * convention as the direct API).
    */
  final case class Selector(metric: String, matchers: Seq[Matcher],
      offsetMs: Long = 0L, at: Option[At] = None) extends Expr
  /** Range vector selector `sel[5m]` — only valid as the range
    * argument of a range function.
    */
  final case class Range(sel: Selector, rangeMs: Long) extends Expr
  /** Subquery `expr[range:step]` — the inner expression evaluated
    * over a step grid within the trailing range, yielding a range
    * vector (one synthetic sample per inner step). `stepMs = 0`
    * means "use the context default" (Prometheus's empty-step form
    * `[1h:]`). Only valid as a range-function argument.
    */
  final case class Subquery(body: Expr, rangeMs: Long, stepMs: Long,
      offsetMs: Long = 0L, at: Option[At] = None) extends Expr
  /** Function call `rate(...)`, `clamp(v, 0, 1)`, ... */
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  /** Aggregation operator `sum by (a,b) (v)`, `topk(3, v)`, ...
    * `grouping=None` collapses everything to one element.
    */
  final case class Agg(op: String, param: Option[Expr], body: Expr,
      grouping: Option[Grouping]) extends Expr
  /** Binary operation with optional `bool` modifier (comparisons) and
    * vector matching.
    */
  final case class Bin(op: String, lhs: Expr, rhs: Expr,
      boolMod: Boolean = false, matching: Option[Matching] = None) extends Expr
  /** Unary minus. */
  final case class Neg(e: Expr) extends Expr

  /** `by (labels)` (by=true) or `without (labels)` (by=false). */
  final case class Grouping(by: Boolean, labels: Seq[String])
  /** `on(labels)` (on=true) / `ignoring(labels)` (on=false), with an
    * optional `group_left(include)` (side = -1) / `group_right`
    * (side = +1); side = 0 means one-to-one.
    */
  final case class Matching(on: Boolean, labels: Seq[String],
      side: Int = 0, include: Seq[String] = Nil)
}

final class PromQLParseException(msg: String) extends RuntimeException(msg)

/** Hand-rolled lexer + Pratt parser for the PromQL subset graft
  * evaluates. Precedence (loosest to tightest), exactly Prometheus's
  * published table: `or` < `and`/`unless` < comparisons < `+ -` <
  * `* / %` < `^` (right-associative) < unary < postfix
  * (`[range]`, `offset`).
  */
object PromQLParser {

  // ===== lexer =====

  private sealed trait Tok { def pos: Int }
  private final case class TIdent(s: String, pos: Int) extends Tok
  private final case class TNum(v: Double, pos: Int) extends Tok
  private final case class TStr(s: String, pos: Int) extends Tok
  private final case class TDur(ms: Long, pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok
  private final case class TEof(pos: Int) extends Tok

  private val unitMs: Map[String, Long] = Map(
    "ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L, "y" -> 31536000000L)

  private val durationRe =
    java.util.regex.Pattern.compile("([0-9]+)(ms|s|m|h|d|w|y)")

  private def err(msg: String, pos: Int): Nothing =
    throw new PromQLParseException(s"PromQL parse error at char $pos: $msg")

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = q.length
    var i = 0
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && q.charAt(i + 1).isDigit)) {
        // duration (1h30m) beats number (130): try the duration shape
        // first — one or more <int><unit> groups not followed by an
        // identifier char
        val m = durationRe.matcher(q)
        m.region(i, n)
        var durMs = 0L
        var j = i
        while (m.lookingAt()) {
          durMs += m.group(1).toLong * unitMs(m.group(2))
          j = m.end
          m.region(j, n)
        }
        // ':' is an ident char (recording-rule names) but a legal
        // boundary after a duration — the subquery form `[1h:10m]`
        if (j > i && (j >= n || !isIdentChar(q.charAt(j)) || q.charAt(j) == ':')
            && !(j < n && q.charAt(j) == '.')) {
          out += TDur(durMs, i); i = j
        } else {
          var k = i
          while (k < n && (q.charAt(k).isDigit || q.charAt(k) == '.')) k += 1
          if (k < n && (q.charAt(k) == 'e' || q.charAt(k) == 'E')) {
            k += 1
            if (k < n && (q.charAt(k) == '+' || q.charAt(k) == '-')) k += 1
            while (k < n && q.charAt(k).isDigit) k += 1
          }
          val txt = q.substring(i, k)
          val v = try txt.toDouble
            catch { case _: NumberFormatException => err(s"bad number '$txt'", i) }
          out += TNum(v, i); i = k
        }
      } else if (isIdentStart(c)) {
        var k = i + 1
        while (k < n && isIdentChar(q.charAt(k))) k += 1
        val s = q.substring(i, k)
        // Inf / NaN are numeric literals in PromQL
        if (s.equalsIgnoreCase("inf")) out += TNum(Double.PositiveInfinity, i)
        else if (s.equalsIgnoreCase("nan")) out += TNum(Double.NaN, i)
        else out += TIdent(s, i)
        i = k
      } else if (c == '"' || c == '\'') {
        val sb = new StringBuilder
        var k = i + 1
        var closed = false
        while (k < n && !closed) {
          val d = q.charAt(k)
          if (d == '\\' && k + 1 < n) {
            q.charAt(k + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case other => sb.append(other)
            }
            k += 2
          } else if (d == c) { closed = true; k += 1 }
          else { sb.append(d); k += 1 }
        }
        if (!closed) err("unterminated string", i)
        out += TStr(sb.toString, i); i = k
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        two match {
          case "==" | "!=" | ">=" | "<=" | "=~" | "!~" =>
            out += TOp(two, i); i += 2
          case _ =>
            c match {
              case '+' | '-' | '*' | '/' | '%' | '^' | '(' | ')' | '{' | '}' |
                   '[' | ']' | ',' | '=' | '>' | '<' | ':' | '@' =>
                out += TOp(c.toString, i); i += 1
              case other => err(s"unexpected character '$other'", i)
            }
        }
      }
    }
    out += TEof(n)
    out.result()
  }

  // ===== parser =====

  private val aggOps = Set("sum", "min", "max", "avg", "count", "group",
    "stddev", "stdvar", "topk", "bottomk", "quantile", "count_values",
    "limitk", "limit_ratio")
  private val paramAggOps = Set("topk", "bottomk", "quantile", "count_values",
    "limitk", "limit_ratio")
  private val setOps = Set("and", "or", "unless")
  private val keywords = aggOps ++ setOps ++
    Set("by", "without", "on", "ignoring", "group_left", "group_right",
      "offset", "bool")

  def parse(query: String): Expr = {
    val toks = lex(query)
    val p = new P(toks)
    val e = p.parseExpr(0)
    p.peek match {
      case TEof(_) => e
      case t => err(s"trailing input starting with '${tokText(t)}'", t.pos)
    }
  }

  private def tokText(t: Tok): String = t match {
    case TIdent(s, _) => s
    case TNum(v, _) => v.toString
    case TStr(s, _) => "\"" + s + "\""
    case TDur(ms, _) => s"<${ms}ms>"
    case TOp(s, _) => s
    case TEof(_) => "<end>"
  }

  private final class P(toks: Vector[Tok]) {
    private var i = 0
    def peek: Tok = toks(i)
    private def next(): Tok = { val t = toks(i); i += 1; t }
    private def expectOp(s: String): Unit = next() match {
      case TOp(`s`, _) => ()
      case t => err(s"expected '$s', got '${tokText(t)}'", t.pos)
    }
    private def at(s: String): Boolean = peek match {
      case TOp(`s`, _) => true
      case _ => false
    }
    private def atIdent(s: String): Boolean = peek match {
      case TIdent(`s`, _) => true
      case _ => false
    }
    private def eat(s: String): Boolean = { if (at(s)) { next(); true } else false }
    private def eatIdent(s: String): Boolean =
      { if (atIdent(s)) { next(); true } else false }

    // precedence levels: 1 or | 2 and/unless | 3 comparisons | 4 +- |
    // 5 */% | 6 ^ | then unary/postfix/atom
    private def prec(op: String): Int = op match {
      case "or" => 1
      case "and" | "unless" => 2
      case "==" | "!=" | ">" | "<" | ">=" | "<=" => 3
      case "+" | "-" => 4
      case "*" | "/" | "%" | "atan2" => 5 // atan2: word op, * precedence (Prometheus)
      case "^" => 6
      case _ => 0
    }

    def parseExpr(minPrec: Int): Expr = {
      var lhs = parseUnary()
      var continue = true
      while (continue) {
        val opTok = peek
        val op = opTok match {
          case TOp(s, _) if prec(s) > 0 => s
          case TIdent(s, _) if setOps(s) || s == "atan2" => s
          case _ => ""
        }
        if (op.isEmpty || prec(op) < minPrec) continue = false
        else {
          next()
          val boolMod = eatIdent("bool")
          if (boolMod && prec(op) != 3)
            err(s"bool modifier is only valid on comparison operators, not '$op'", opTok.pos)
          val matching = parseMatching(opTok.pos)
          // ^ is right-associative; everything else left-associative
          val rhs = parseExpr(if (op == "^") prec(op) else prec(op) + 1)
          lhs = Expr.Bin(op, lhs, rhs, boolMod, matching)
        }
      }
      lhs
    }

    private def parseMatching(pos: Int): Option[Expr.Matching] = {
      val on = eatIdent("on")
      val ignoring = !on && eatIdent("ignoring")
      if (!on && !ignoring) None
      else {
        val labels = parseLabelList()
        val left = eatIdent("group_left")
        val right = !left && eatIdent("group_right")
        val include = if ((left || right) && at("(")) parseLabelList() else Nil
        Some(Expr.Matching(on, labels, if (left) -1 else if (right) 1 else 0, include))
      }
    }

    private def parseLabelList(): Seq[String] = {
      expectOp("(")
      val out = Seq.newBuilder[String]
      if (!at(")")) {
        var more = true
        while (more) {
          next() match {
            case TIdent(s, _) => out += s
            case t => err(s"expected label name, got '${tokText(t)}'", t.pos)
          }
          more = eat(",")
        }
      }
      expectOp(")")
      out.result()
    }

    private def parseUnary(): Expr = peek match {
      case TOp("-", _) => next(); Expr.Neg(parseUnary())
      case TOp("+", _) => next(); parseUnary()
      case _ => parsePostfix(parseAtom())
    }

    private def parsePostfix(e: Expr): Expr = {
      var cur = e
      var continue = true
      while (continue) {
        if (at("[")) {
          val bracketPos = peek.pos
          next()
          val ms = next() match {
            case TDur(d, _) => d
            case t => err(s"expected duration in range selector, got '${tokText(t)}'", t.pos)
          }
          if (eat(":")) {
            // subquery `expr[range:step]` — empty step means the
            // context's default evaluation interval
            val stepMs = peek match {
              case TDur(d, _) => next(); d
              case _ => 0L
            }
            expectOp("]")
            cur = cur match {
              case _: Expr.Range | _: Expr.Subquery | _: Expr.Str =>
                err("subquery '[range:step]' needs an instant-vector expression", bracketPos)
              case body => Expr.Subquery(body, ms, stepMs)
            }
          } else {
            expectOp("]")
            cur = cur match {
              case s: Expr.Selector => Expr.Range(s, ms)
              case _ => err("range selector '[...]' is only valid on a vector selector (use [range:step] for a subquery)", toks(i - 1).pos)
            }
          }
        } else if (atIdent("offset")) {
          val pos = peek.pos
          next()
          val neg = eat("-")
          val ms0 = next() match {
            case TDur(d, _) => d
            case t => err(s"expected duration after offset, got '${tokText(t)}'", t.pos)
          }
          val ms = if (neg) -ms0 else ms0
          cur = cur match {
            case s: Expr.Selector => s.copy(offsetMs = ms)
            case Expr.Range(s, r) => Expr.Range(s.copy(offsetMs = ms), r)
            case sq: Expr.Subquery => sq.copy(offsetMs = ms)
            case _ => err("offset is only valid on a selector or subquery", pos)
          }
        } else if (at("@")) {
          val pos = peek.pos
          next()
          val at0: Expr.At = next() match {
            // epoch SECONDS (fractional allowed), Prometheus's unit
            case TNum(v, _) => Expr.AtMs((v * 1000.0).toLong)
            case TIdent("start", _) =>
              expectOp("("); expectOp(")"); Expr.AtStart
            case TIdent("end", _) =>
              expectOp("("); expectOp(")"); Expr.AtEnd
            case t => err(s"expected timestamp, start() or end() after @, got '${tokText(t)}'", t.pos)
          }
          cur = cur match {
            case s: Expr.Selector => s.copy(at = Some(at0))
            case Expr.Range(s, r) => Expr.Range(s.copy(at = Some(at0)), r)
            case sq: Expr.Subquery => sq.copy(at = Some(at0))
            case _ => err("@ is only valid on a selector or subquery", pos)
          }
        } else continue = false
      }
      cur
    }

    private def parseAtom(): Expr = next() match {
      case TNum(v, _) => Expr.Num(v)
      case TStr(s, _) => Expr.Str(s)
      case TOp("(", _) =>
        val e = parseExpr(1)
        expectOp(")")
        e
      case TOp("{", p0) =>
        i -= 1
        parseSelector("", p0)
      case TIdent(s, p0) if aggOps(s) => parseAgg(s, p0)
      case TIdent(s, p0) =>
        if (keywords(s)) err(s"unexpected keyword '$s'", p0)
        else if (at("(")) {
          next()
          val args = Seq.newBuilder[Expr]
          if (!at(")")) {
            var more = true
            while (more) { args += parseExpr(1); more = eat(",") }
          }
          expectOp(")")
          Expr.Call(s, args.result())
        } else parseSelector(s, p0)
      case t => err(s"unexpected '${tokText(t)}'", t.pos)
    }

    private def parseAgg(op: String, pos: Int): Expr = {
      var grouping = parseGrouping()
      expectOp("(")
      val param = if (paramAggOps(op)) {
        val p = parseExpr(1)
        expectOp(",")
        Some(p)
      } else None
      val body = parseExpr(1)
      expectOp(")")
      if (grouping.isEmpty) grouping = parseGrouping()
      Expr.Agg(op, param, body, grouping)
    }

    private def parseGrouping(): Option[Expr.Grouping] =
      if (eatIdent("by")) Some(Expr.Grouping(by = true, parseLabelList()))
      else if (eatIdent("without")) Some(Expr.Grouping(by = false, parseLabelList()))
      else None

    private def parseSelector(metric: String, pos: Int): Expr.Selector = {
      val matchers = Seq.newBuilder[Matcher]
      if (at("{")) {
        next()
        if (!at("}")) {
          var more = true
          while (more) {
            val name = next() match {
              case TIdent(s, _) => s
              case t => err(s"expected label name in matcher, got '${tokText(t)}'", t.pos)
            }
            val opTok = next()
            val value = next() match {
              case TStr(s, _) => s
              case t => err(s"expected quoted label value, got '${tokText(t)}'", t.pos)
            }
            opTok match {
              case TOp("=", _) => matchers += Matcher.Eq(name, value)
              case TOp("!=", _) => matchers += Matcher.Neq(name, value)
              case TOp("=~", _) => matchers += Matcher.Re(name, value)
              case TOp("!~", _) => matchers += Matcher.Nre(name, value)
              case t => err(s"expected matcher operator (=, !=, =~, !~), got '${tokText(t)}'", t.pos)
            }
            more = eat(",")
          }
        }
        expectOp("}")
      }
      val ms = matchers.result()
      if (metric.isEmpty && ms.isEmpty)
        err("selector needs a metric name or at least one matcher", pos)
      Expr.Selector(metric, ms)
    }
  }
}
