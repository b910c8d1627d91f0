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
  * Everything here stays a plain Catalyst predicate so equality /
  * IN / null checks push down to the Parquet scan (row-group stats,
  * dictionary and bloom pruning — the Spark-native analog of the
  * reference's page/dictionary pruning in constraint.go).
  */
sealed trait Matcher {
  def label: String
  /** Compile to a Catalyst predicate; None means "matches all rows". */
  def toPredicate: Option[Column]
}

object Matcher {
  final case class Eq(label: String, value: String) extends Matcher {
    def toPredicate: Option[Column] = Some(col(label) === value)
  }
  final case class Neq(label: String, value: String) extends Matcher {
    def toPredicate: Option[Column] = Some(col(label) =!= value)
  }
  final case class Re(label: String, pattern: String) extends Matcher {
    def toPredicate: Option[Column] = regexPredicate(label, pattern)
  }
  final case class Nre(label: String, pattern: String) extends Matcher {
    def toPredicate: Option[Column] =
      regexPredicate(label, pattern) match {
        case Some(p) => Some(!p)
        case None    => Some(lit(false)) // !~ ".*" matches nothing
      }
  }

  /** A regex that is just an alternation of literals ("a|b|c"). */
  private val literalAlternation = "^[A-Za-z0-9_ |-]*$".r

  private[tsdb] def regexPredicate(label: String, pattern: String): Option[Column] =
    pattern match {
      case ".*" => None
      case ".+" => Some(col(label) =!= "")
      case p if literalAlternation.matches(p) =>
        val set = p.split('|').toSeq
        if (set.size == 1) Some(col(label) === set.head)
        else Some(col(label).isin(set: _*))
      case p =>
        // Prometheus regexes are fully anchored.
        Some(col(label).rlike("^(?:" + p + ")$"))
    }

  /** AND of all matchers; None when every matcher matches all rows. */
  def compile(matchers: Seq[Matcher]): Option[Column] =
    matchers.flatMap(_.toPredicate).reduceOption(_ && _)
}
