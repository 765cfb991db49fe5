package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring for the engine's native expressions.
  * Usable both programmatically (GraftSession applies it) and via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on a
  * cluster, making `graft_cosine(a, b)` available to plain SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => new graft.plans.ChunkBucketPruning(session))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_cosine expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_langid"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "graft_langid"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_langid expects 1 argument, got ${children.length}")
        LangIdExpr(children.head)
      }))
  }
}
