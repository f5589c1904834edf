package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * SparkSessionExtensions entry point: installs the engine's native
 * functions at session build time —
 *
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
 *
 * (or `.withExtensions(new GraftExtensions)`). This is the (c)-tier
 * integration route from the build guidance: no per-session registration
 * call needed, and the functions resolve in pure SQL text.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("softmax_argmax"),
      new ExpressionInfo(classOf[SoftmaxArgmax].getName, "softmax_argmax"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SoftmaxArgmax(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs(0), exprs(1))))
  }
}
