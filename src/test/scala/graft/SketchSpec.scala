package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{cms_query, cms_sketch}

/** Count-min-sketch native aggregate: exactness at low collision rates,
  * the one-sided error guarantee under heavy collisions, and merge
  * correctness across partitions.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(n: Int, keys: Int) =
    (0 until n).map(i => (i.toLong, s"k${i % keys}")).toDF("id", "key")

  test("wide sketch reproduces exact counts for a small key set") {
    val df = keyed(1000, 5).repartition(7) // multi-partition: merge path runs
    val sk = df.agg(cms_sketch(col("key"), 4, 512).as("sk"))
    val got = df.select(col("key")).distinct()
      .crossJoin(sk)
      .select(col("key"), cms_query(col("sk"), col("key"), 4, 512).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(got == exact, s"wide sketch must be collision-free here: $got vs $exact")
  }

  test("tiny sketch never undercounts and respects the CMS upper bound") {
    val n = 2000
    val keys = 100
    val width = 8 // forced collisions
    val df = keyed(n, keys).repartition(5)
    val sk = df.agg(cms_sketch(col("key"), 3, width).as("sk"))
    val rows = df.select(col("key")).distinct()
      .crossJoin(sk)
      .select(col("key"), cms_query(col("sk"), col("key"), 3, width).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("key").count().as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(rows(k) >= ex, s"CMS undercounted $k: ${rows(k)} < $ex")
      // deterministic data/hashes: the e/width bound holds outright
      assert(rows(k) <= ex + (math.E / width * n).ceil.toLong,
        s"CMS blew the upper bound for $k: ${rows(k)} vs $ex")
    }
  }

  test("sketch geometry is fixed-size regardless of key cardinality") {
    val few = keyed(200, 2).agg(cms_sketch(col("key"), 4, 64)).head().getSeq[Long](0)
    val many = keyed(200, 200).agg(cms_sketch(col("key"), 4, 64)).head().getSeq[Long](0)
    assert(few.length == 4 * 64 && many.length == 4 * 64)
    // total mass per depth row equals the (non-null) input count
    assert(few.grouped(64).map(_.sum).toSeq == Seq.fill(4)(200L))
    assert(many.grouped(64).map(_.sum).toSeq == Seq.fill(4)(200L))
  }

  test("MG candidates retain every item above n/(k+1) under hostile partitioning") {
    import graft.functions.GraftFunctions.mg_candidates
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 planted heavy items (freq 400 each) drowned in 2000 distinct
    // singletons + 600 mid-weight decoys, shuffled deterministically
    // and split over many partitions so merge-order paths all execute
    val items =
      (1 to 3).flatMap(h => Seq.fill(400)(s"heavy_$h")) ++
      (1 to 2000).map(i => s"one_$i") ++
      (1 to 60).flatMap(i => Seq.fill(10)(s"mid_$i"))
    val shuffled = new scala.util.Random(7).shuffle(items)
    val df = shuffled.toDF("item").repartition(16)
    // n = 3800, k = 20: retention threshold n/21 ≈ 181 < 400, so all
    // three planted heavies are guaranteed candidates
    assert(items.size == 3800)
    val cands = df.agg(mg_candidates(col("item"), 20).as("c"))
      .select(explode(col("c")).as("item")).as[String].collect().toSet
    assert((1 to 3).forall(h => cands.contains(s"heavy_$h")),
      s"lost a guaranteed heavy hitter: $cands")
    assert(cands.size <= 20, s"state exceeded k: ${cands.size}")
  }

  test("MG state serialization round-trips and empty input yields no candidates") {
    val st = new graft.functions.MGState(4)
    Seq("a", "a", "b", "c", "d", "e").foreach(st.insert)
    val agg = graft.functions.MGCandidates(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val back = agg.deserialize(agg.serialize(st))
    assert(back.counts == st.counts)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val empty = Seq.empty[String].toDF("item")
      .agg(graft.functions.GraftFunctions.mg_candidates(col("item"), 8).as("c"))
      .select(size(col("c"))).head().getInt(0)
    assert(empty == 0)
  }
}
