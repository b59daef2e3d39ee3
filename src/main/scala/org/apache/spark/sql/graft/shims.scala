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

/** Explicit storage release for `localCheckpoint`'d DataFrames.
  * `Dataset.unpersist` consults the cache manager, which has no entry
  * for a checkpointed frame (its plan is a `LogicalRDD` over the
  * persisted checkpoint RDD), so without this the blocks linger until
  * the ContextCleaner GC-reaps the RDD — unbounded in a long-lived
  * session that regenerates shared pair-graph caches. Walking the
  * analyzed plan and unpersisting each `LogicalRDD`'s RDD drops the
  * block-manager storage deterministically.
  */
object CheckpointCleanupShim {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.LogicalRDD

  def unpersistBlocks(df: DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
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

/** Diagnostic-only bridge for [[graft.PlanProfile]]: block until the
  * shared listener bus has drained, so asynchronously-delivered
  * QueryExecutionListener events (the per-action plan captures) are
  * all recorded before the profiler attributes them to a query.
  */
object ListenerBusShim {
  def waitUntilEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)
}
