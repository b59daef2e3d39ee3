package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard shim pattern for extension libraries that define custom
  * Catalyst expressions with a typed Column API (the public alternative
  * is per-session FunctionRegistry registration + string `expr()`).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Test-only bridge to inspect what a SparkSessionExtensions hook
  * registered (the build* methods are `private[sql]`).
  */
object ExtensionsShim {
  import org.apache.spark.sql.SparkSessionExtensions
  import org.apache.spark.sql.classic.SparkSession
  import org.apache.spark.sql.execution.SparkStrategy

  def plannerStrategies(ext: SparkSessionExtensions,
      session: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(session)
}

/** Bridge to `Dataset.ofRows` for libraries that build custom logical
  * plans (the extension-library counterpart of what `spark.sql` does
  * internally).
  */
object DatasetShim {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
