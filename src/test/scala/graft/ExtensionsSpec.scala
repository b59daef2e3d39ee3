package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.AsofJoinStrategy

/** GraftExtensions wiring: the SparkSessionExtensions hook registers
  * the planner strategy + SQL function, and the runtime-registration
  * path makes `vec_dot` usable from plain SQL in an existing session.
  */
class ExtensionsSpec extends SparkSpec {

  test("extensions hook injects the as-of strategy and vec_dot function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val strategies =
      org.apache.spark.sql.graft.ExtensionsShim.plannerStrategies(ext, cs)
    assert(strategies.contains(AsofJoinStrategy))
  }

  test("vec_dot is callable from SQL after runtime registration") {
    GraftExtensions.registerSql(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("SQL vec_dot participates in whole-stage codegen over a real scan") {
    GraftExtensions.registerSql(spark)
    // (an all-literal call constant-folds to a LocalTableScan — also
    // correct, but proves nothing about codegen; scan real data)
    val df = Tables(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "vec_dot(embedding, embedding) AS d")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"vec_dot fell out of codegen:\n$plan")
  }
}
