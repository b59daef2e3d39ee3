package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Scratch probe: prints ANN recall@5 across configs (not a test). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables(spark, d, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0)
      val exact = SimilarityOps.bruteForceTopK(e, q, 5)
      for ((np, nt) <- Seq((8,4), (6,8), (4,8), (6,16))) {
        val r = SimilarityOps.annRecall(exact,
          SimilarityOps.lshTopK(e, q, 5, np, nt)).head.getDouble(0)
        println(f"RECALL $d lsh planes=$np tables=$nt r=$r%.3f")
      }
      for (npb <- Seq(8, 12)) {
        val r = SimilarityOps.annRecall(exact,
          SimilarityOps.ivfTopK(e, q, 5, 64, npb)).head.getDouble(0)
        println(f"RECALL $d ivf nprobe=$npb r=$r%.3f")
      }
      val mp = SimilarityOps.annRecall(exact,
        SimilarityOps.multiprobeTopK(e, q, 5)).head.getDouble(0)
      println(f"RECALL $d multiprobe planes=8 r=$mp%.3f")
    }
    spark.stop()
  }
}
