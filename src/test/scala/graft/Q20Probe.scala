package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe: where q20's wall time goes (not a test). */
object Q20Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val li = Tables(spark, d, "lineitem")
    val nation = Tables(spark, d, "nation")
    val supplier = Tables(spark, d, "supplier")

    def time(name: String)(f: => Long): Unit = {
      // 3 passes, min
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name%-28s ${ts.map(_._1).min}%7.3f s  rows=${ts.head._2}")
    }

    val perPs = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
    time("agg_only")(perPs.count())
    time("agg_long_sum")(li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty")).count())
    val wp = Window.partitionBy(col("l_partkey"))
    val dom = perPs
      .withColumn("part_qty", sum(col("qty")).over(wp))
      .withColumn("k", count(lit(1)).over(wp))
      .filter(col("qty").cast("double") / col("part_qty").cast("double") *
        col("k").cast("double") > 3.0)
    time("agg_window_filter")(dom.count())
    time("full_q20")(graft.operators.Relational
      .q20DominantSupplier(nation, supplier, li).count())
    spark.stop()
  }
}
