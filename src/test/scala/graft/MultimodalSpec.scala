package graft

import graft.operators.Multimodal

/** Multimodal plumbing: binary column schema, deterministic stub
  * decode, frame-sample fan-out shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abc", "en", "s", 3L),          // 3 bytes  -> image (3 % 3 == 0)
    (1L, "abcd", "en", "s", 4L),         // 4 bytes  -> audio
    (2L, "abcdefgh", "en", "s", 8L)      // 8 bytes  -> video
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("decodeMeta output schema and deterministic values") {
    val out = Multimodal.decodeMeta(spark, docs)
    assert(out.schema == Multimodal.mediaMetaSchema)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getInt(3), r.getInt(4), r.getInt(5))).toSeq
    assert(rows == Seq(
      (0L, 3L, "image", 3, 3, 4),
      (1L, 4L, "audio", 4, 4, 5),
      (2L, 8L, "video", 8, 8, 9)))
  }

  test("decodeMeta is stable across runs (no RNG, no wall clock)") {
    val a = Multimodal.decodeMeta(spark, docs).collect().toSeq
    val b = Multimodal.decodeMeta(spark, docs).collect().toSeq
    assert(a == b)
  }

  test("frameSample expands only video rows with stride") {
    val out = Multimodal.frameSample(spark, docs, everyNth = 4)
      .select("doc_id", "frame_idx").as[(Long, Int)].collect().toSeq
    // only doc 2 is video; n_frames = 8 % 24 + 1 = 9 -> frames 0,4,8
    assert(out == Seq((2L, 0), (2L, 4), (2L, 8)))
  }
}
