package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** ANN operator semantics: brute-force exactness on constructed vectors
  * and LSH recall against brute-force on the real embeddings table.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),  // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.9f, 0.1f), 1),  // closest to 2
    (4L, Array(-1.0f, 0.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by exact cosine") {
    val out = SimilarityOps.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("cosineNearDup finds only the tight pairs") {
    val pairs = SimilarityOps.cosineNearDup(vecs, 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("multi-table lshTopK recall >= 0.8 vs brute force on real embeddings (sf0.001)") {
    val e = Tables(spark, sf0001, "embeddings")
    val queries = e.filter($"vec_id" % 10 === 0)
    val brute = SimilarityOps.bruteForceTopK(e, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = SimilarityOps.lshTopK(e, queries, 5, numPlanes = 3, numTables = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("hyperplane signature is deterministic across invocations") {
    val a = SimilarityOps.hyperplaneSignature(vecs, 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val b = SimilarityOps.hyperplaneSignature(vecs, 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
