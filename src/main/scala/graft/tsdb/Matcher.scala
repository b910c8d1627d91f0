package graft.tsdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Label matchers in the style of Prometheus' four matcher types
  * (=, !=, =~, !~), compiled to Catalyst [[Column]] predicates.
  *
  * Mirrors the semantics of the reference's matcher→constraint
  * compilation (reference: search/constraint.go:55-102
  * MatchersToConstraints), including its fast paths:
  *   - `=~ ".*"`  matches everything → no predicate at all
  *   - `=~ ".+"`  → `col != ""`
  *   - a regex that is a literal alternation ("a|b|c") → IN-list
  *     (set-match optimization, constraint.go:73-76)
  *   - `!~ re` → NOT(simplified =~ re)
  *
  * NULL semantics: Prometheus treats an absent label as the empty
  * string (the reference matches null pages against "",
  * search/constraint.go:410-417). SQL three-valued logic would
  * instead silently DROP null rows from negated matchers, so every
  * compiled predicate here is null-safe: a null label value behaves
  * exactly like "".
  *
  * Pushdown: the hot paths stay parquet-pushable. `Eq(v≠"")` compiles
  * to a plain `col = v` (null rows can't match a non-empty literal,
  * so the null-safe form is equivalent) and set-matches without ""
  * compile to a plain IN — both reach `PushedFilters`. Only the
  * genuinely null-sensitive forms (negations, regexes matching "")
  * pay for a `coalesce`, mirroring the reference where only
  * equality/set constraints prune pages and regexes scan
  * dictionaries.
  */
sealed trait Matcher {
  def label: String
  /** Compile to a Catalyst predicate; None means "matches all rows". */
  def toPredicate: Option[Column]
}

object Matcher {
  /** Label column with Prometheus' absent=="" convention. */
  private def nn(label: String): Column = coalesce(col(label), lit(""))

  final case class Eq(label: String, value: String) extends Matcher {
    def toPredicate: Option[Column] =
      if (value.isEmpty) Some(col(label).isNull || col(label) === "")
      else Some(col(label) === value) // null ⇒ null ⇒ dropped == "" ≠ v. Pushes down.
  }
  final case class Neq(label: String, value: String) extends Matcher {
    // null-safe: foo!="bar" must keep rows where foo is absent.
    def toPredicate: Option[Column] = Some(nn(label) =!= value)
  }
  final case class Re(label: String, pattern: String) extends Matcher {
    def toPredicate: Option[Column] = regexPredicate(label, pattern)
  }
  final case class Nre(label: String, pattern: String) extends Matcher {
    // Negation sees nulls: `foo!~"bar"` must keep rows where foo is
    // absent ("" doesn't match bar), so negate the always-null-safe
    // form, not the pushdown-friendly one.
    def toPredicate: Option[Column] =
      regexPredicate(label, pattern, nullSafe = true) match {
        case Some(p) => Some(!p)
        case None    => Some(lit(false)) // !~ ".*" matches nothing
      }
  }

  /** A regex that is just an alternation of literals ("a|b|c"). */
  private val literalAlternation = "^[A-Za-z0-9_ |-]*$".r

  /** Does the (anchored) pattern match the empty string? Decided at
    * plan-build time so the null-safe coalesce is only paid when "" /
    * absent labels can actually match.
    */
  private def matchesEmpty(pattern: String): Boolean =
    try ("^(?:" + pattern + ")$").r.matches("") catch { case _: Exception => false }

  private[tsdb] def regexPredicate(label: String, pattern: String,
      nullSafe: Boolean = false): Option[Column] =
    pattern match {
      case ".*" => None
      case ".+" => Some(nn(label) =!= "")
      case p if literalAlternation.matches(p) =>
        // limit -1 keeps trailing empty alternatives: "api|" means
        // "api" OR "" and the "" must survive the split
        val set = p.split("\\|", -1).toSeq
        // plain IN pushes down; coalesce only when "" can match or a
        // negation needs nulls to evaluate (not just be dropped)
        val c = if (nullSafe || set.contains("")) nn(label) else col(label)
        if (set.size == 1) Some(c === set.head)
        else Some(c.isin(set: _*))
      case p =>
        // Prometheus regexes are fully anchored; null behaves as "".
        val c = if (nullSafe || matchesEmpty(p)) nn(label) else col(label)
        Some(c.rlike("^(?:" + p + ")$"))
    }

  /** AND of all matchers; None when every matcher matches all rows. */
  def compile(matchers: Seq[Matcher]): Option[Column] =
    matchers.flatMap(_.toPredicate).reduceOption(_ && _)
}
