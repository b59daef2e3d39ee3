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

  test("decodeImageMeta reads REAL dimensions from png bytes (javax.imageio)") {
    // hand-render two PNGs with known dims — no staging rule involved,
    // so this pins the decoder itself, not the harness arithmetic
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val bin = Seq((10L, png(17, 5)), (11L, png(1, 1)))
      .toDF("doc_id", "content")
    val out = Multimodal.decodeImageMeta(spark, bin)
      .select("doc_id", "n_bytes", "media_type", "width", "height", "n_frames")
      .as[(Long, Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, 17L * 5 * 3, "image", 17, 5, 1),
      (11L, 3L, "image", 1, 1, 1)))
  }

  test("stagePngs + binaryFile round trip decodes the staged dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_png_spec")
      .resolve("staged").toString
    Multimodal.stagePngs(docs, dir) // only doc 0 is image-typed
    val staged = spark.read.format("binaryFile").load(dir)
      .selectExpr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.png$', 1) AS LONG) AS doc_id",
        "content")
    val out = Multimodal.decodeImageMeta(spark, staged)
      .select("doc_id", "width", "height").as[(Long, Int, Int)]
      .collect().toSeq
    // staging rule: w = 0%64+1 = 1, h = 0%48+1 = 1
    assert(out == Seq((0L, 1, 1)))
    // idempotent: second call is a no-op, not a re-render
    Multimodal.stagePngs(docs, dir)
    assert(spark.read.format("binaryFile").load(dir).count() == 1)
  }

  test("stageWavs + binaryFile round trip decodes the staged RIFF header") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wav_spec")
      .resolve("staged").toString
    Multimodal.stageWavs(docs, dir) // only doc 1 is audio-typed (4 % 3 == 1)
    val staged = spark.read.format("binaryFile").load(dir)
      .selectExpr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.wav$', 1) AS LONG) AS doc_id",
        "content")
    val out = Multimodal.decodeAudioMeta(spark, staged)
    assert(out.schema == Multimodal.audioMetaSchema)
    // staging rule for id 1: rate = 8000 + 1·4000, channels = 1%2+1 = 2,
    // frames = 1%50+10 = 11, pcm = 11·2·2
    assert(out.as[(Long, Int, Int, Long, Long)].collect().toSeq ==
      Seq((1L, 12000, 2, 11L, 44L)))
    // idempotent: second call is a no-op, not a re-render
    Multimodal.stageWavs(docs, dir)
    assert(spark.read.format("binaryFile").load(dir).count() == 1)
  }
}
