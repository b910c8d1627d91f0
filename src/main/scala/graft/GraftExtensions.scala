package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashSignature, NgramShingles, SimHashFingerprint}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")`,
  * `graft_shingles(text, 4[, true])`,
  * `graft_minhash_signature(shingles, 32)` and
  * `graft_simhash(tokens)` work.
  *
  * Wire-up: `spark.sql.extensions=graft.GraftExtensions` at session
  * build, or [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
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

  private[graft] val minhashSignature: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_minhash_signature(shingles, k) takes exactly 2 arguments")
      MinHashSignature(children.head, intLit(children(1), "k"))
    })

  private[graft] val simhash: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashFingerprint].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_simhash(tokens) takes exactly 1 argument")
      SimHashFingerprint(children.head)
    })

  private[graft] val all = Seq(dotProduct, shingles, minhashSignature, simhash)

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
