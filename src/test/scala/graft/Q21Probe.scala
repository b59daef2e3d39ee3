package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where q21's wall time goes (not a test). */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val li = Tables(spark, d, "lineitem")
    val orders = Tables(spark, d, "orders")
    val supplier = Tables(spark, d, "supplier")

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name%-28s ${ts.map(_._1).min}%7.3f s  rows=${ts.head._2}")
    }

    val flagged = li
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          1L).otherwise(0L).as("late"))
    time("join_flag_only")(flagged.count())
    val fold1 = flagged.groupBy("ok", "sk")
      .agg(sum(col("late")).as("late_lines"))
    time("join_fold1")(fold1.count())
    val fold2 = fold1.groupBy("ok")
      .agg(count(lit(1)).as("nsupp"),
        sum(when(col("late_lines") > 0, 1L).otherwise(0L)).as("nlate_supp"),
        min(when(col("late_lines") > 0, col("sk"))).as("sk"),
        sum(col("late_lines")).as("n_late_lines"))
      .filter(col("nlate_supp") === 1 && col("nsupp") >= 2)
    time("join_fold1_fold2")(fold2.count())
    time("full_q21")(graft.operators.Relational
      .q21WaitingSupplier(supplier, orders, li).count())

    // alternative: one fold on ok with two distinct aggregates
    // (Expand x3 on the line-scale frame, but a single exchange)
    val alt = flagged.groupBy("ok")
      .agg(countDistinct(col("sk")).as("nsupp"),
        countDistinct(when(col("late") > 0, col("sk"))).as("nlate_supp"),
        min(when(col("late") > 0, col("sk"))).as("sk2"),
        sum(col("late")).as("n_late_lines"))
      .filter(col("nlate_supp") === 1 && col("nsupp") >= 2)
    time("alt_single_fold_distinct")(alt.count())

    // alternative 2: fold1 keyed only by ok after pre-aggregating
    // map-side? (partial agg on (ok,sk) compresses ~nothing if groups
    // are near-unique; measure group counts to know)
    println("fold1 groups = " + fold1.count() + "  flagged rows = " +
      flagged.count() + "  F-orders = " +
      orders.filter(col("o_orderstatus") === "F").count())
    spark.stop()
  }
}
