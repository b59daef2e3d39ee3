package graft

import graft.operators.PipelineOps

/** Dataset-assembly semantics on controlled inputs. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "one two three four five six seven", "web"),
    (2L, "alpha beta gamma", "web"),
    (3L, "x y z w q r s t u v", "books"),
    (4L, "", "books"),
    (5L, "lone", "books")
  ).toDF("doc_id", "text", "source")

  test("splitAssign is deterministic, total, and stable under repartitioning") {
    val a = PipelineOps.splitAssign(docs).collect()
    val b = PipelineOps.splitAssign(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 5)
    a.foreach { r =>
      val bucket = r.getInt(1)
      assert(bucket >= 0 && bucket <= 255)
      val expected = if (bucket < 204) "train" else if (bucket < 230) "val" else "test"
      assert(r.getString(2) == expected)
    }
  }

  test("chunkTokens cuts consecutive windows with a partial tail and drops empty docs") {
    val rows = PipelineOps.chunkTokens(docs, 3)
      .as[(Long, Int, String, Long)].collect().toSeq
    // doc 1: 7 tokens -> 3 chunks (3,3,1)
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)) == Seq(
      (0, "one two three", 3L), (1, "four five six", 3L), (2, "seven", 1L)))
    // doc 4 (empty) yields no chunks; doc 5 yields a single short chunk
    assert(!rows.exists(_._1 == 4L))
    assert(rows.filter(_._1 == 5L).map(r => (r._2, r._3, r._4)) == Seq((0, "lone", 1L)))
    // reassembling chunks restores the token stream
    val reassembled = rows.filter(_._1 == 3L).sortBy(_._2).map(_._3).mkString(" ")
    assert(reassembled == "x y z w q r s t u v")
  }

  test("packByBudget cuts batches at the running-total boundary per source") {
    val rows = PipelineOps.packByBudget(docs, budgetTokens = 10L)
      .as[(Long, String, Long, Long)].collect().toSeq
    val web = rows.filter(_._2 == "web").map(r => (r._1, r._3, r._4))
    // web: doc1 n=7 (prefix 0 -> batch 0), doc2 n=3 (prefix 7 -> batch 0)
    assert(web == Seq((1L, 7L, 0L), (2L, 3L, 0L)))
    val books = rows.filter(_._2 == "books").map(r => (r._1, r._3, r._4))
    // books: doc3 n=10 (prefix 0 -> 0), doc4 n=0 (prefix 10 -> 1), doc5 (prefix 10 -> 1)
    assert(books == Seq((3L, 10L, 0L), (4L, 0L, 1L), (5L, 1L, 1L)))
  }
}
