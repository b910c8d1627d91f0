package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works.
  *
  * Wire-up: `spark.sql.extensions=graft.GraftExtensions` at session
  * build, or [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.dotProduct)
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

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = dotProduct
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
