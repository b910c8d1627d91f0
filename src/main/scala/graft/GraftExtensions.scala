package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, NgramShingles}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")` and
  * `graft_shingles(text, 4[, true])` work.
  *
  * Wire-up: `spark.sql.extensions=graft.GraftExtensions` at session
  * build, or [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProduct)
    ext.injectFunction(GraftFunctions.shingles)
  }
}

object GraftFunctions {
  private[graft] val dotProduct: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an int literal")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be a boolean literal")
  }

  private[graft] val shingles: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[NgramShingles].getName, "graft_shingles"),
    (children: Seq[Expression]) => {
      require(children.length == 2 || children.length == 3,
        "graft_shingles(text, n[, distinct]) takes 2 or 3 arguments")
      NgramShingles(children.head, intLit(children(1), "n"),
        if (children.length == 3) boolLit(children(2), "distinct") else false)
    })

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    Seq(dotProduct, shingles).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
