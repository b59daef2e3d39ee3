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

  test("word_shingles / cms_sketch / cms_query work from plain SQL") {
    GraftExtensions.registerSql(spark)
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 2) AS sh").head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    // one pure-SQL sketch round trip: build the aggregate, probe it —
    // the estimate can only over-count
    spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS k")
      .createOrReplaceTempView("ext_keys")
    val est = spark.sql(
      """SELECT cms_query(sk, '0') AS est FROM (
        |  SELECT cms_sketch(k) AS sk FROM ext_keys)""".stripMargin)
      .head().getLong(0)
    assert(est >= 15L, s"cms must not undercount key '0' (exact 15), got $est")
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
