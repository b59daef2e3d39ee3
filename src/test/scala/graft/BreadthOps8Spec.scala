package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Relational, TextOps}

/** Round-9 breadth wave: Hill tail index, dedup scheme agreement,
  * length-bias census, FD violation profile.
  */
class BreadthOps8Spec extends SparkSpec {
  import spark.implicits._

  test("hillTailIndex: geometric frequencies give hill_mean = 2 ln 2") {
    // two-word docs -> exactly one bigram occurrence each; bigram
    // freqs: "a b" x16, "c d" x8, "e f" x4, "g h" x2, "i j" x1 ->
    // with k = 3 the boundary is f_4 = 2 and the mean ln-ratio is
    // (3+2+1)/3 ln 2
    val docs = (Seq.fill(16)("a b") ++ Seq.fill(8)("c d")
      ++ Seq.fill(4)("e f") ++ Seq.fill(2)("g h") ++ Seq("i j"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = TextOps.hillTailIndex(docs, k = 3).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("k_used") == 3 && row.getAs[Long]("f_tail") == 2)
    val hm = row.getAs[Double]("hill_mean")
    assert(math.abs(hm - 2 * math.log(2)) < 1e-6, hm)
    assert(math.abs(row.getAs[Double]("alpha") - 1.0 / hm) < 1e-8)
  }

  test("pairSetAgreement: set counts and jaccard; empty sets agree at 1.0") {
    val mh = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val sh = Seq((1L, 2L), (5L, 6L), (7L, 8L)).toDF("doc_a", "doc_b")
    val r = DedupOps.pairSetAgreement(mh, sh)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r == ((2L, 3L, 1L, 0.25)), r)
    val e = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val r0 = DedupOps.pairSetAgreement(e, e)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r0 == ((0L, 0L, 0L, 1.0)), r0)
  }

  test("dupRateByLength: dup mass lands in the right decile") {
    val docs = (1L to 20L).map(i => (i, s"doc $i", i)).toDF(
      "doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = DedupOps.dupRateByLength(docs, pairs)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out.size == 10 && out.map(_._2).sum == 20L)
    // p10 of 1..20 = 2.9, so bucket 0 = {1, 2} = exactly the dup pair
    assert(out.head == ((0, 2L, 2L, 1.0)), out.head)
    assert(out.tail.forall(_._3 == 0L), out)
  }

  test("j16FdProfile: true key passes, false key counts its violators") {
    val orders = Seq(
      (10L, 1L, "O", "P1"), (11L, 1L, "O", "P2"), // custkey 1 violates
      (12L, 2L, "F", "P1"), (13L, 2L, "O", "P1")  // custkey 2 does not
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val out = Relational.j16FdProfile(orders)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("o_custkey->o_orderpriority", 2L, 1L, 0.5),
      ("o_orderkey->o_orderstatus", 4L, 0L, 0.0)), out)
  }
}
