package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library install path for graft's native functions: add
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and `float_dot` /
  * `rolling_hash` are available in SQL on every session. The harness's
  * plain sessions use the equivalent runtime registrations in
  * [[graft.functions.VectorExprs.register]] and
  * [[graft.functions.TextExprs.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[functions.FloatDot].getName, "float_dot"),
      functions.VectorExprs.build _))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[functions.RollingHash].getName, "rolling_hash"),
      functions.TextExprs.build _))
  }
}
