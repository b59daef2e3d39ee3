package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.unicode_normalize
import graft.functions.UnicodeKernel
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization expression: canonical composition (NFC),
  * compatibility folding (NFKC), the ASCII no-allocation fast path,
  * idempotence, and null handling — the dedup-stability primitive.
  */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes decomposed sequences; NFKC folds compatibility chars") {
    val df = Seq(
      ("e\u0301",       "decomp-accent"),  // → é (U+00E9)
      ("\uFB01nal",     "ligature"),       // NFKC → "final"; NFC keeps ﬁ
      ("\u00E9",        "already-nfc"),
      ("ascii only 42", "ascii")
    ).toDF("s", "tag")
    val out = df.select(col("tag"),
        unicode_normalize(col("s"), "NFC").as("nfc"),
        unicode_normalize(col("s"), "NFKC").as("nfkc"))
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("decomp-accent") == ("\u00E9", "\u00E9"))
    assert(out("ligature") == ("\uFB01nal", "final"))
    assert(out("already-nfc") == ("\u00E9", "\u00E9"))
    assert(out("ascii") == ("ascii only 42", "ascii only 42"))
  }

  test("ASCII fast path returns the input buffer itself (no allocation)") {
    val s = UTF8String.fromString("pure ascii text, long enough to matter")
    assert(UnicodeKernel.normalize(s, 0) eq s)
    // already-normalized non-ASCII also returns the original buffer
    val nfc = UTF8String.fromString("d\u00E9j\u00E0 vu")
    assert(UnicodeKernel.normalize(nfc, 0) eq nfc)
  }

  test("idempotent and null-preserving") {
    val once = UnicodeKernel.normalize(UTF8String.fromString("e\u0301x"), 0)
    assert(UnicodeKernel.normalize(once, 0) == once)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
      .select(unicode_normalize(col("s"), "NFC")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("runs inside whole-stage codegen over a real scan shape") {
    val df = (0 until 1000).map(i => (i.toLong, s"doc $i e\u0301")).toDF("id", "s")
      .repartition(4)
    val out = df.select(col("id"), unicode_normalize(col("s"), "NFC").as("n"))
    assert(out.collect().count(_.getString(1).endsWith("\u00E9")) == 1000)
    // AQE finalizes THIS df's plan on its own execution; inspect after
    val plan = out.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix is the WholeStageCodegen marker
    assert("""\*\(\d+\) Project \[id""".r.findFirstIn(plan).isDefined,
      s"projection must stay codegen'd:\n$plan")
  }
}
