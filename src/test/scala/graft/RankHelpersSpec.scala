package graft

import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the scale-safe rank helpers to Spark's own window semantics:
  * [[Relational.globalRowNumber]] (two-pass partition-offset rank)
  * must equal `row_number() OVER (ORDER BY …)` and
  * [[Relational.ntileAt]] must equal `ntile(b)` — including remainder
  * front-loading, tie-breaks, and the n < b degenerate — so the
  * a35/a39/a60 rewrites provably compute the window they replaced.
  */
class RankHelpersSpec extends SparkSpec {
  import spark.implicits._

  // values with heavy ties; id is the unique tie-break
  private def frame(n: Int) =
    (1 to n).map(i => ((i * 7919) % n).toLong -> ((i * 37) % 11).toLong)
      .toDF("id", "v")

  test("globalRowNumber equals the unpartitioned row_number window") {
    val df = frame(257)
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val got = Relational.globalRowNumber(df, Seq(col("v"), col("id")), "rnk")
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRowNumber honors descending sort expressions") {
    val df = frame(100)
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val got = Relational.globalRowNumber(
        df, Seq(col("v").desc, col("id")), "rnk")
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("ntileAt matches ntile(b) for every remainder class and n < b") {
    for (n <- Seq(3, 4, 5, 40, 41, 42, 43, 101); b <- Seq(3, 4, 7, 10)) {
      val df = frame(n)
      val want = df.withColumn("t",
          ntile(b).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val cnt = df.count()
      val got = Relational.globalRowNumber(df, Seq(col("v"), col("id")), "rnk")
        .withColumn("t", Relational.ntileAt(col("rnk"), lit(cnt), b))
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n b=$b")
    }
  }
  test("ntileAt equals the SQL-standard bucket rule on randomized (n, b)") {
    // deterministic LCG over (n, b) combos; reference = front-loaded
    // remainder rule computed in plain Scala over every rank 1..n
    var seed = 0x9e3779b97f4a7c15L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (_ <- 1 to 12) {
      val n = next(4000) + 1
      val b = next(12) + 1
      def ref(rnk: Int): Int = {
        val q = n / b; val r = n % b; val cut = r * (q + 1)
        if (rnk <= cut) (rnk - 1) / (q + 1) + 1
        else r + (rnk - cut - 1) / q + 1
      }
      val got = spark.range(1, n + 1)
        .select(col("id").as("rnk"),
          Relational.ntileAt(col("id"), lit(n.toLong), b).as("t"))
        .as[(Long, Int)].collect()
      got.foreach { case (rnk, t) =>
        assert(t == ref(rnk.toInt), s"n=$n b=$b rnk=$rnk")
      }
    }
  }

  test("globalRowNumber is shuffle.partitions-independent (1/2/7/64, " +
      "parts > rows, empty input)") {
    // the helper reads numShufflePartitions for its range exchange; a
    // config change must never change the computed ranks (adversarial
    // cases: one partition — degenerate single range; more partitions
    // than rows — empty ranges contribute zero offsets)
    val df = frame(43)
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq(1, 2, 7, 64)) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        val got = Relational
          .globalRowNumber(df, Seq(col("v"), col("id")), "rnk")
          .select("id", "rnk").as[(Long, Long)].collect().toMap
        assert(got == want, s"shuffle.partitions=$p changed ranks")
        val empty = Relational.globalRowNumber(
          df.filter(lit(false)), Seq(col("v"), col("id")), "rnk")
        assert(empty.count() == 0L, s"empty input at partitions=$p")
        assert(empty.columns.toSeq == Seq("id", "v", "rnk"))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("globalRowNumber is layout-independent (random pre-partitioning)") {
    val df = frame(513)
    val want = Relational.globalRowNumber(df, Seq(col("v"), col("id")), "rnk")
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 7, 64)) {
      val got = Relational.globalRowNumber(
          df.repartition(parts), Seq(col("v"), col("id")), "rnk")
        .select("id", "rnk").as[(Long, Long)].collect().toMap
      assert(got == want, s"pre-partitioning $parts changed ranks")
    }
  }
}
