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

  test("knnLabelAgreement takes the majority label, ties to the smallest") {
    // query 0, k=3: neighbors 1 (label 0, sim .994), then 2 and 3 at
    // sim 0 (vec_id tie-break) both label 1 -> majority 1, disagree
    val k3 = SimilarityOps.knnLabelAgreement(vecs, vecs.filter($"vec_id" === 0), 3)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(k3 == Seq((0L, 0, 1, 0)))
    // k=2: one vote each for labels 0 and 1 -> tie -> smallest (0), agree
    val k2 = SimilarityOps.knnLabelAgreement(vecs, vecs.filter($"vec_id" === 0), 2)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(k2 == Seq((0L, 0, 0, 1)))
  }

  test("normStats: per-label count, exact min/max, fixed-point mean") {
    val got = SimilarityOps.normStats(vecs)
      .as[(Int, Long, Double, Double, Long)].collect().toSeq
    val n01 = math.sqrt(0.9f.toDouble * 0.9f.toDouble +
      0.1f.toDouble * 0.1f.toDouble) // norm of vecs 1 and 3
    def e12(x: Double) = math.floor(x * 1.0e12).toLong
    assert(got == Seq(
      (0, 2L, math.min(1.0, n01), math.max(1.0, n01), (e12(1.0) + e12(n01)) / 2L),
      (1, 2L, math.min(1.0, n01), math.max(1.0, n01), (e12(1.0) + e12(n01)) / 2L),
      (2, 1L, 1.0, 1.0, e12(1.0))), s"got $got")
  }

  test("quantizeInt8: symmetric codes, zero vector gets scale 0") {
    val qv = Seq(
      (0L, Array(2.0f, -4.0f, 1.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0) // zero vector: scale 0, codes 0
    ).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.quantizeInt8(qv)
      .as[(Long, Int, Int, Double)].collect().toSeq
    val s = 127.0 / 4.0
    def q(x: Double) = math.floor(x * s + 0.5).toInt
    assert(got == Seq(
      (0L, 0, q(2.0), s), (0L, 1, q(-4.0), s), (0L, 2, q(1.0), s),
      (1L, 0, 0, 0.0), (1L, 1, 0, 0.0), (1L, 2, 0, 0.0)), s"got $got")
    // the extreme element hits exactly ±127
    assert(got(1)._3 == -127)
  }

  test("int8TopK: quantized ranking matches float top-1 on the toy set, high recall on real (sf0.001)") {
    // toy set: codes preserve the obvious nearest neighbor
    val out = SimilarityOps.int8TopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.head == ((0L, 1L, 1)), s"got $out")
    // real embeddings: int8 ADC recall@5 vs float brute force
    val e = Tables(spark, sf0001, "embeddings")
    val queries = e.filter($"vec_id" % 10 === 0)
    val brute = SimilarityOps.bruteForceTopK(e, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val q8 = SimilarityOps.int8TopK(e, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect q8).size.toDouble / brute.size
    assert(recall >= 0.9, s"int8 recall $recall too low")
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

  // 105 vectors in 5 tight clusters (cluster = id mod 5, deterministic
  // jitter); nList = 5 derives step = 105 div 5 = 21, sampling ids
  // 0,21,42,63,84 — one seed per cluster — so the IVF cells align with
  // the planted structure.
  private def clusteredVecs: DataFrame = (0 until 105).map { i =>
    val a = Array.fill(8)(0.05f)
    a(i % 5) = 1.0f
    (0 until 8).foreach(d => a(d) += ((i * 31 + d * 7) % 10) / 100.0f)
    (i.toLong, a)
  }.toDF("vec_id", "embedding")

  test("ivfTopK with nProbe=1 recovers in-cluster neighbors on clustered vectors") {
    val queries = clusteredVecs.filter($"vec_id" % 19 === 0) // one per cluster+
    val brute = SimilarityOps.bruteForceTopK(clusteredVecs, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(clusteredVecs, queries, 5,
        nList = 5, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall too low on clustered data")
  }

  test("ivfTopK with nProbe = all centroids degenerates to brute force") {
    val e = Tables(spark, sf0001, "embeddings")
    val queries = e.filter($"vec_id" % 20 === 0)
    val brute = SimilarityOps.bruteForceTopK(e, queries, 3)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    // nList = 45 at sf0.001's 500 vectors derives step = 500 div 45 = 11
    val ivf = SimilarityOps.ivfTopK(e, queries, 3, nList = 45, nProbe = 1000)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute)
  }

  test("cosineBandCensus: bands bounded to [-20,20), mass totals the candidate pairs") {
    val e = Tables(spark, sf001, "embeddings")
    val census = SimilarityOps.cosineBandCensus(e)
      .as[(Long, Long)].collect().toSeq
    assert(census.nonEmpty)
    // cosine in [-1,1] -> floor(20x) in [-20,20)
    assert(census.forall { case (b, n) => b >= -20 && b < 20 && n > 0 })
    // the near-dup pairs at >= 0.463 are a subset of the mass at band >= 9
    val nd = SimilarityOps.lshNearDup(e, 0.463).count()
    val high = census.filter(_._1 >= 10).map(_._2).sum
    assert(high <= nd && nd <= census.filter(_._1 >= 9).map(_._2).sum,
      s"near-dup count $nd inconsistent with census tail $high")
  }

  test("lshNearDup finds a nonempty subset of the exact near-dup pairs (sf0.01)") {
    val e = Tables(spark, sf001, "embeddings")
    val exact = SimilarityOps.cosineNearDup(e, 0.463)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = SimilarityOps.lshNearDup(e, 0.463)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH pairs not a subset: ${lsh diff exact}")
    assert(lsh.nonEmpty, "LSH near-dup found nothing — buckets too fine")
  }

  test("labelSeparability: sum-vector identity equals the pair census") {
    // label 0: two copies of e_x (intra mean cos = 1); label 1: one
    // e_y (intra pinned 0, singleton); inter 0-1: orthogonal -> 0
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.labelSeparability(e)
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0, 0, 2L, 2L, 1.0), (0, 1, 2L, 1L, 0.0),
      (1, 1, 1L, 1L, 0.0)), got)
  }

  test("filteredTopK: the label gate excludes a closer cross-label vector") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // query
      (1L, Array(0.9f, 0.1f), 0),  // same label, close
      (2L, Array(1.0f, 0.0f), 1),  // CLOSEST but wrong label — gated out
      (3L, Array(0.0f, 1.0f), 0))  // same label, orthogonal
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.filteredTopK(e, e.filter($"vec_id" === 0), 2)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 1L, 1), (0L, 3L, 2)), out)
  }

  test("centroidDrift: label centroids score their cosine to the global mean") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.centroidDrift(e)
      .as[(Int, Long, Double)].collect().toSeq
    // global centroid (2/3, 1/3): cos(label0) = 2/√5, cos(label1) = 1/√5
    assert(got.map(r => (r._1, r._2)) == Seq((0, 2L), (1, 1L)), got)
    assert(math.abs(got(0)._3 - 0.894427191) < 1e-6, got)
    assert(math.abs(got(1)._3 - 0.447213595) < 1e-6, got)
  }

  test("adaptivePlanes ladder keeps expected bucket occupancy bounded") {
    assert(SimilarityOps.adaptivePlanes(500L) == 4)   // sf0.01 stays on 4 planes
    assert(SimilarityOps.adaptivePlanes(512L) == 4)
    assert(SimilarityOps.adaptivePlanes(513L) == 5)
    assert(SimilarityOps.adaptivePlanes(2000L) == 6)  // sf0.1's 2000 vectors
    assert(SimilarityOps.adaptivePlanes(1000000000L) == 8)
  }

  test("hyperplane signature is deterministic across invocations") {
    val a = SimilarityOps.hyperplaneSignature(vecs, 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val b = SimilarityOps.hyperplaneSignature(vecs, 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("executed signature matches a driver recomputation from " +
      "HyperplaneSignature.planeValue (pins the codegen inline formula " +
      "and every driver-side consumer to one derivation)") {
    // non-trivial planeOffset exercises the offset arithmetic too
    for (offset <- Seq(0, 8)) {
      val got = SimilarityOps.hyperplaneSignature(vecs, 8, offset)
        .select("vec_id", "embedding", "bucket")
        .as[(Long, Array[Float], Long)].collect()
      assert(got.nonEmpty)
      got.foreach { case (id, emb, bucket) =>
        var expect = 0L
        for (j <- 0 until 8) {
          var acc = 0.0
          for (d <- emb.indices)
            acc += emb(d).toDouble *
              graft.functions.HyperplaneSignature.planeValue(offset + j, d)
          if (acc > 0.0) expect |= 1L << j
        }
        assert(bucket == expect, s"vec $id offset $offset")
      }
    }
  }

  test("kmeansAssign separates well-formed clusters and is deterministic") {
    // seeds: % 23 == 0 → ids 0 and 23, one planted in each blob
    val blobs = Seq(
      (0L, Array(1.0f, 0.1f)), (1L, Array(0.9f, 0.0f)), (2L, Array(1.1f, 0.05f)),
      (23L, Array(0.0f, 1.0f)), (24L, Array(0.1f, 0.9f)), (25L, Array(0.0f, 1.1f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.kmeansAssign(blobs, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 6)
    val a = got(0L)
    val b = got(23L)
    assert(a != b)
    assert(Seq(1L, 2L).forall(got(_) == a))
    assert(Seq(24L, 25L).forall(got(_) == b))
    // deterministic end to end (init, decimal means, tiebreaks)
    val again = SimilarityOps.kmeansAssign(blobs, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("kmeansAssign: iterations move centroids off the seeds") {
    // seed 0 sits BETWEEN the two blobs; seed 23 inside blob B. After
    // Lloyd updates, the blob-A points must still form one cluster
    // (centroid migrates toward the blob mean rather than splitting it)
    val blobs = Seq(
      (0L, Array(0.5f, 0.5f)),
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.1f, 0.1f)), (3L, Array(0.9f, -0.1f)),
      (23L, Array(0.0f, 1.0f)), (24L, Array(0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.kmeansAssign(blobs, k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1)
    assert(got(23L) == got(24L))
    assert(got(1L) != got(23L))
  }

  test("pqEncode/pqTopK: valid codes, self-retrieval sanity, nonzero recall") {
    val e = Tables(spark, sf0001, "embeddings")
    val codes = SimilarityOps.pqEncode(e)
    val n = e.count()
    // every vector gets exactly one code per subspace, codes in [0, 8)
    assert(codes.count() == n * 4)
    val rng = codes.agg(org.apache.spark.sql.functions.min("code"),
      org.apache.spark.sql.functions.max("code")).head()
    assert(rng.getInt(0) >= 0 && rng.getInt(1) <= 7)
    // ADC retrieval overlaps the exact ranking for SOME queries
    // (coarse 8-code-per-subspace books — recall < 1 is expected;
    // zero overlap would mean the lookup is wired wrong)
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") % 25 === 0)
    val approx = SimilarityOps.pqTopK(e, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = SimilarityOps.bruteForceTopK(e, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty && (approx intersect exact).nonEmpty,
      s"ADC retrieval shares nothing with exact top-k (${approx.size} rows)")
  }

  test("semanticNearDup: within-cluster subset of the exact pairs (sf0.01)") {
    val e = Tables(spark, sf001, "embeddings")
    val exact = SimilarityOps.cosineNearDup(e, 0.463)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val sem = SimilarityOps.semanticNearDup(e, 0.463)
      .as[(Long, Long)].collect().toSet
    // cluster gating can only MISS pairs, never invent them
    assert(sem.subsetOf(exact), s"invented pairs: ${sem -- exact}")
    // and on a corpus with same-cluster dups it finds at least one
    assert(sem.nonEmpty, "no within-cluster pair found at sf0.01")
  }

  test("mipsTopK ranks by raw dot product, not cosine") {
    // v20 points the same way as the query but is LONGER than the
    // better-aligned unit v10: MIPS must prefer v20, cosine prefers v10
    val vs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f)),   // cosine 1.0, dot 1.0
      (20L, Array(3.0f, 1.0f))    // cosine ~0.95, dot 3.0
    ).toDF("vec_id", "embedding")
    val q = vs.filter(col("vec_id") === 1L)
    val mips = SimilarityOps.mipsTopK(vs, q, 2)
      .select("neighbor_id", "rnk").as[(Long, Long)].collect().toSeq
    assert(mips == Seq((20L, 1L), (10L, 2L)))
    val cos = SimilarityOps.bruteForceTopK(vs, q, 2)
      .select("neighbor_id", "rnk").as[(Long, Long)].collect().toSeq
    assert(cos == Seq((10L, 1L), (20L, 2L)))
  }

  test("pcaTopComponent recovers the exact direction of rank-1 data") {
    // points on the (3,4) line, zero mean -> cov = var(t)·[[9,12],[12,16]]
    // (rank 1), so (0.75, 1.0) is an exact fixed point of the max-abs-
    // normalized iteration: A·(0.75,1) = var·(18.75, 25) ∝ (0.75, 1);
    // every quantity stays on the 1e-6 integer grid, so equality is exact
    val e = Seq(
      (1L, Array(3f, 4f)), (2L, Array(-3f, -4f)),
      (3L, Array(6f, 8f)), (4L, Array(-6f, -8f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.pcaTopComponent(e)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 0.75), (1L, 1.0)), got)
  }

  test("covarianceMatrix matches hand-computed population covariance") {
    // 2-dim, 3 vectors: x = (0, 1, 2), y = (0, 2, 4) -> var(x)=2/3,
    // cov(x,y)=4/3, var(y)=8/3 (population, n divisor)
    val vs = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f)),
      (3L, Array(2.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.covarianceMatrix(vs)
      .as[(Long, Long, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1) == Seq(0L, 0L, 1L) && got.map(_._2) == Seq(0L, 1L, 1L))
    val eps = 1e-9
    assert(math.abs(got(0)._3 - r9(2.0 / 3.0)) < eps)
    assert(math.abs(got(1)._3 - r9(4.0 / 3.0)) < eps)
    assert(math.abs(got(2)._3 - r9(8.0 / 3.0)) < eps)
  }

  test("cov_grid 128-bit state survives sums a plain long cannot hold") {
    // |x| = 3000 quantizes to 3·10⁹; each squared product is 9·10¹⁸ ≈
    // Long.MaxValue, so TWO rows already overflow a 64-bit
    // accumulator — the carry-propagated (hi, lo) pairs must not.
    // Population variance of a constant column is exactly 0, and any
    // silent wraparound would destroy that.
    val n = 8
    val vs = (1 to n).map(i => (i.toLong, Array(3000.0f, -3000.0f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.covarianceMatrix(vs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 0L, 0.0), (0L, 1L, 0.0), (1L, 1L, 0.0)),
      s"overflow corrupted the constant-column covariance: $got")
  }

  test("cov_grid fails loudly on ragged embedding dims") {
    val vs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      SimilarityOps.covarianceMatrix(vs).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert((e.getMessage + root(e).getMessage).contains("ragged"),
      s"expected the ragged-dims guard, got: ${e.getMessage}")
  }
}
