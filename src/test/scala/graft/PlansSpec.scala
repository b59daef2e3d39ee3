package graft

import graft.operators.Relational

/** Scale-posture assertions on the physical plans: pushdown reaching
  * the parquet scan, broadcast joins for bounded dims, map-side partial
  * aggregation — the properties that decide whether these plans survive
  * a 100× scale-up (builder prompt: ".explain and iterate").
  */
class PlansSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("F1 theta filter is pushed into the parquet scan") {
    val p = plan(Relational.f1Where(Tables(spark, sf0001, "lineitem")))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThan(l_quantity,30"),
      s"filter not pushed:\n${p.take(2000)}")
  }

  test("P1 projection prunes the parquet ReadSchema to selected columns") {
    val p = plan(Relational.p1Projection(Tables(spark, sf0001, "customer")))
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"schema not pruned:\n${p.take(2000)}")
  }

  test("F2 watermark predicate is pushed (timestamp greater-than)") {
    val p = plan(Relational.f2Watermark(Tables(spark, sf0001, "orders"),
      "1998-06-01 00:00:00"))
    assert(p.contains("GreaterThan(o_orderdate"),
      s"watermark not pushed:\n${p.take(2000)}")
  }

  test("q5 star join broadcasts the bounded dimensions") {
    val p = plan(Relational.q5BroadcastJoin(
      Tables(spark, sf0001, "region"), Tables(spark, sf0001, "nation"),
      Tables(spark, sf0001, "customer")))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), "dims should not sort-merge")
  }

  test("q1 aggregate runs map-side partial aggregation before the shuffle") {
    val p = plan(Relational.q1Agg(Tables(spark, sf0001, "lineitem")))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), s"no partial agg:\n${p.take(2000)}")
  }

  test("whole-stage codegen covers the scan->filter->project pipeline") {
    val df = Relational.f1Where(Tables(spark, sf0001, "lineitem"))
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val p = plan(df)
    // the "*(n)" prefix is the WholeStageCodegen marker in final plans
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen span:\n${p.take(2000)}")
  }
}
