package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, L2Norm}

/** SparkSessionExtensions entry point: sessions created with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` get the
  * engine's native SQL functions injected at session build — no
  * imperative registration call needed. (`GraftFunctions.register`
  * remains for sessions the caller doesn't construct.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      es => DotProduct(es(0), es(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      es => L2Norm(es.head)))
  }
}
