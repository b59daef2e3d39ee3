package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $name%-24s min ${ts.min}%6.3f s")
    }
    val tfs = graft.functions.GraftFunctions.word_term_freqs(col("text"))
    val qt = Seq("join", "filter")
    def fil(c: org.apache.spark.sql.Column) =
      filter(c, t => t.getField("term").isInCollection(qt))
    // variant A: regex dl + kernel tfs (both consumed)
    time("regex_dl+kernel")(docs.select(col("doc_id"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("long").as("dl"), fil(tfs).as("t"))
      .agg(sum("dl"), sum(size(col("t")))).head().getLong(0))
    // variant B: one kernel; dl via interpreted aggregate
    time("kernel+agg_dl")(docs.select(col("doc_id"), tfs.as("all"))
      .select(col("doc_id"), aggregate(col("all"), lit(0L),
        (a, x) => a + x.getField("tf")).as("dl"), fil(col("all")).as("t"))
      .agg(sum("dl"), sum(size(col("t")))).head().getLong(0))
    spark.stop()
  }
}
