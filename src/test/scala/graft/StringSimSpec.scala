package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StringSimKernel
import graft.operators.DedupOps

/** Pins [[StringSimKernel]] to the oracle engine's
  * `jaro_winkler_similarity` semantics — every constant below was
  * probed from the oracle directly (byte-mode, window floor, empty
  * convention, transposition floor, boost threshold, prefix cap).
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimKernel.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches oracle-probed constants") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334) // jaro ≤ 0.7+: no boost
    assert(jw("abcdefgh", "abcdefzz") === 0.9) // prefix 6 capped at 4
    assert(jw("abcdef", "abzzzz") === 0.5555555555555555) // jaro ≤ 0.7: no boost
    assert(jw("x", "xy") === 0.8500000000000001)
    assert(jw("small ring", "small rings") === 0.9818181818181818)
  }

  test("jaro_winkler edge conventions: empties, window floor, bytes, 3-cycle") {
    assert(jw("", "") === 0.0) // BOTH empty is 0, not 1
    assert(jw("", "x") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window max(2,2)/2-1 = 0
    assert(jw("a", "a") === 1.0)
    assert(jw("ab", "ab") === 1.0)
    assert(jw("abcd", "badc") === 0.8333333333333334) // t = 4 mismatches / 2
    // 3-cycle: 3 mismatched matches floor to 1 transposition
    assert(StringSimKernel.jaro(UTF8String.fromString("XYZpqr"),
      UTF8String.fromString("YZXpqr")) === 0.9444444444444445)
    // BYTE mode: the 2-byte é shifts every window off alignment
    assert(jw("éa", "ea") === 0.0)
  }

  test("jaro_winkler expression: codegen'd, null-propagating") {
    val df = Seq(("martha", "marhta"), ("ab", "ba"), (null, "x"))
      .toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaro_winkler($"a", $"b").as("jw"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      .toSeq === Seq(0.9611111111111111, 0.0, null))
  }

  test("jaroWinklerPairs: planted transposed-head pair found, blocked pair not scored") {
    val docs = Seq(
      (1L, "breaking news: markets rally on cool inflation print today", "en"),
      // same 4-char block, one swapped word later in the head
      (2L, "breaking news: markets rally on cool inflatoin print today", "en"),
      // head diverges inside the first 4 chars -> different block, never scored
      (3L, "BREAKING news: markets rally on cool inflation print today", "en"),
      (4L, "totally unrelated document about gardening and soil", "en"))
      .toDF("doc_id", "text", "lang").withColumn("source",
        org.apache.spark.sql.functions.lit("s"))
    val pairs = DedupOps.jaroWinklerPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }
}
