package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDot
import graft.plans.AsofJoinStrategy

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`:
  * injects the as-of join planner strategy and registers the codegen'd
  * vector kernel as a SQL function, so a pure-SQL user gets
  * `SELECT vec_dot(a, b)` and as-of plans without touching the Scala
  * API. (The Scala API path registers the same pieces lazily per
  * session — see AsofJoin.register — so either route works.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectFunction(GraftExtensions.VecDotDescriptor)
  }
}

object GraftExtensions {

  /** `vec_dot(array, array)` SQL function backed by the codegen'd
    * Catalyst expression (no UDF indirection).
    */
  private[graft] val VecDotDescriptor = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDot].getCanonicalName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  /** Runtime registration for sessions built without the extensions
    * conf (static SQL confs cannot change after startup).
    */
  def registerSql(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (ident, info, builder) = VecDotDescriptor
    cs.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
