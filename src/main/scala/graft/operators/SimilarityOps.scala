package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the correctness
  * baseline; the LSH-bucketed variant (random-hyperplane signs) is the
  * scale path — queries only meet vectors sharing a hash bucket.
  *
  * The dot product stays inside codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDF, no serialization cliff. Floats
  * are cast to double element-wise before multiply/accumulate so the
  * arithmetic is the standard IEEE double pipeline.
  */
object SimilarityOps {

  /** cosine(a, b) for two array<float> columns as a SQL expression. */
  private def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> cast(p as double) * cast(q as double))," +
        s" cast(0 as double), (s, v) -> s + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * every vector, rank per query. One broadcast join (no shuffle of
    * the big side) + one window shuffle over query_id — at 1000
    * executors the vector table stays partition-local.
    */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = embeddings.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(cosineExpr("qe", "embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("sim"))
      .orderBy("query_id", "rnk")
  }

  /** Random-hyperplane LSH signature: sign bits of dot(v, h_i) for
    * `numPlanes` deterministic pseudo-hyperplanes. The planes are
    * generated from a hash of (plane, dim) — no RNG state, fully
    * reproducible across engines and executors.
    */
  def hyperplaneSignature(embeddings: DataFrame, numPlanes: Int): DataFrame = {
    // plane(i)[d] = (((i * 1009 + d) * 2654435761) mod 1000) / 500 - 1 ∈ [-1, 1)
    val planeDot = (i: Int) =>
      s"aggregate(zip_with(embedding, sequence(0, size(embedding) - 1)," +
        s" (v, d) -> cast(v as double) *" +
        s" ((pmod(($i * 1009 + d) * 2654435761, 1000)) / 500.0 - 1.0))," +
        s" cast(0 as double), (s, x) -> s + x)"
    val bits = (0 until numPlanes).map(i =>
      s"if(${planeDot(i)} > 0, ${1L << i}L, 0L)")
    embeddings.withColumn("bucket",
      expr(bits.mkString("", " + ", "")))
  }

  /** LSH-bucketed ANN: vectors and queries hash to hyperplane-sign
    * buckets; candidates = bucket collisions; exact cosine re-rank.
    * Misses are possible (that is the approximation) — recall is
    * measured against bruteForceTopK in the test suite.
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8): DataFrame = {
    val sig = hyperplaneSignature(embeddings, numPlanes)
    val qsig = hyperplaneSignature(
      queries.select(col("vec_id").as("query_id"), col("embedding")), numPlanes)
      .select(col("query_id"), col("embedding").as("qe"), col("bucket"))
    val cand = sig.join(qsig, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(cosineExpr("qe", "embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("sim"))
      .orderBy("query_id", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Exact
    * (all-pairs via broadcast of the deduplicated right side) at test
    * scale; at 100 TB this swaps to bucketed candidates from
    * `hyperplaneSignature` — same verify stage.
    */
  def cosineNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim", expr(cosineExpr("ea", "eb")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }
}
