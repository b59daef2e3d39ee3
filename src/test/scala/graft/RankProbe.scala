package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (not a test): the cost of pinning globalRowNumber's
  * range exchange with an eager localCheckpoint vs leaning on
  * ReuseExchange, over the a35/a60-shaped customer-grain rank
  * workloads at sf0.1. min-of-3 per variant, interleaved.
  */
object RankProbe {
  def grn(df: DataFrame, order: Seq[Column], out: String,
      pin: Boolean): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged0 = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val ranged = if (pin) ranged0.localCheckpoint() else ranged0
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        sum(col("__cnt")).over(Window.partitionBy(lit(0))
          .orderBy(col("__pid"))) - col("__cnt"))
      .select(col("__pid"), col("__off"))
    ranged
      .withColumn("__lrnk", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__lrnk") + col("__off"))
      .drop("__pid", "__lrnk", "__off")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val orders = Tables(spark, d, "orders")
    val per = orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("__m"), count(lit(1)).as("__f"))

    def run(pin: Boolean): Double = {
      val t0 = System.nanoTime()
      // three independent rank passes, like a35's three metrics
      Seq("__m", "__f").foreach { m =>
        grn(per.select(col("o_custkey"), col(m)),
          Seq(col(m).desc, col("o_custkey")), "rnk", pin).count()
      }
      grn(per.select(col("o_custkey"), col("__m")),
        Seq(col("__m"), col("o_custkey")), "rnk", pin).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(pin = false) // warm
    val noPin = (1 to 3).map(_ => run(false))
    val withPin = (1 to 3).map(_ => run(true))
    println(f"PROBE rank3 noPin  min=${noPin.min}%6.3f  all=${noPin.map(t => f"$t%5.3f").mkString(",")}")
    println(f"PROBE rank3 pinned min=${withPin.min}%6.3f  all=${withPin.map(t => f"$t%5.3f").mkString(",")}")
    spark.stop()
  }
}
