package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{BloomMightContain, DotProduct, TopKByScore}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use (`SELECT graft_dot(a, b)`), the sanctioned
  * extension mechanism for a library (enable with
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getCanonicalName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_might_contain takes exactly 2 arguments")
        BloomMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getCanonicalName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_topk takes exactly 3 arguments (score, id, k)")
        TopKByScore(children.head, children(1), children(2))
      }))
  }
}
