package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Scratch probe: PQ vs PQ+rerank recall@5 (not a test). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables(spark, d, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0)
      val exact = SimilarityOps.bruteForceTopK(e, q, 5)
      val pq = SimilarityOps.annRecall(exact,
        SimilarityOps.pqTopK(e, q, 5)).head.getDouble(0)
      for (sf <- Seq(4, 8)) {
        val rr = SimilarityOps.annRecall(exact,
          SimilarityOps.pqRerankTopK(e, q, 5, sf)).head.getDouble(0)
        println(f"RECALL $d pq=$pq%.3f rerank(x$sf)=$rr%.3f")
      }
    }
    spark.stop()
  }
}
