package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns accompanied by typed metadata. The decode /
  * feature-extract step is the per-partition escape hatch
  * (`mapPartitions`) — the ONE place imperative code is warranted,
  * because codec libraries are record-at-a-time.
  *
  * IMAGE decode is REAL: the JDK ships PNG/JPEG codecs in
  * `javax.imageio`, so [[decodeImageMeta]] reads actual pixel
  * dimensions from the container bytes (ingested at scale via Spark's
  * `binaryFile` source — one task streams many files, no shuffle).
  * AUDIO decode is REAL too: `javax.sound.sampled` parses WAV/AIFF
  * natively, so [[decodeAudioMeta]] reads actual sample rate /
  * channels / frame count from the RIFF header. Only VIDEO decode
  * remains a deterministic byte-derived fake ([[fakeDecode]]) — the
  * JDK genuinely has no video codec and the container no external
  * libs — so for that modality the Spark-side plumbing (binary
  * schema, batched partition iteration, output schema,
  * partition-preserving shape) is what's real and tested, not the
  * codec.
  */
object Multimodal {

  /** Schema of a decoded media record. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Pretend-decode: derives metadata from raw bytes only. Stands in
    * for an image/audio codec; deterministic for oracle parity.
    */
  private[operators] def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val mediaType = (n % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    Row(id, n, mediaType, (n % 640).toInt, (n % 480).toInt, (n % 24 + 1).toInt)
  }

  /** Binary ingestion: text payload → binary column (stand-in for
    * reading image bytes), then per-partition batched "decode" to typed
    * metadata. Narrow map over partitions — no shuffle; at 100 TB the
    * partition count follows the input splits and each task streams
    * its records through the codec without materializing the partition.
    */
  def decodeMeta(spark: SparkSession, documents: DataFrame): DataFrame = {
    val bin = documents.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val enc = Encoders.row(mediaMetaSchema)
    // no presentation orderBy here: composed pipelines (frameSample)
    // must not inherit a global sort mid-stream — callers that need
    // order sort their final output
    bin.mapPartitions { rows =>
      rows.map { r =>
        fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(enc)
  }

  /** REAL image decode over (doc_id, content) binary rows: actual
    * width/height read from the container bytes with `javax.imageio`
    * (PNG/JPEG need no external libs). `n_bytes` reports the DECODED
    * RGB buffer size (w·h·3) — the decode-verifiable quantity; the
    * container byte size is compression-dependent and carried by the
    * `binaryFile` source's `length` column for callers that want it.
    * Narrow mapPartitions, no shuffle; at 100 TB the partition count
    * follows the binaryFile splits and each task streams files through
    * the codec one at a time.
    */
  def decodeImageMeta(spark: SparkSession, images: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaMetaSchema)
    images.select(col("doc_id"), col("content")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory decode, no tmp spill
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"undecodable image payload for doc ${r.getLong(0)}")
        Row(r.getLong(0), img.getWidth.toLong * img.getHeight * 3L,
          "image", img.getWidth, img.getHeight, 1)
      }
    }(enc)
  }

  /** Deterministic PNG staging for the image-decode harness: one REAL
    * png per image-typed doc (UTF-8 byte length % 3 == 0, matching
    * [[fakeDecode]]'s modality rule), dimensions derived from doc_id
    * (w = id%64+1, h = id%48+1) so an oracle can predict what a correct
    * decoder must read back. Pixels are a deterministic gradient.
    * DRIVER-LOCAL render (principled collect of doc ids, bounded by
    * the verification slice's image count): the fixture dir must live
    * on the driver's filesystem — the path is handed straight to a
    * `binaryFile` read — and an executor-side foreachPartition on a
    * non-local master would scatter files into executor-local /tmp
    * and silently publish an empty dir. Idempotent per dir: files
    * land in `<dir>.tmp` and publish via a single rename.
    */
  def stagePngs(documents: DataFrame, dir: String): Unit = {
    val published = new java.io.File(dir)
    if (published.exists()) return
    val tmp = new java.io.File(dir + ".tmp")
    tmp.mkdirs() // ensure the publish step has a dir even if no doc qualifies
    val ids = documents
      .select(col("doc_id"))
      .filter(length(col("text").cast("binary")) % 3 === 0)
      .collect().map(_.getLong(0))
    javax.imageio.ImageIO.setUseCache(false)
    ids.foreach { id =>
      val w = (id % 64 + 1).toInt
      val h = (id % 48 + 1).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((id + x * 31 + y * 7) % 256) * 0x010101).toInt)
          x += 1
        }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "png",
        new java.io.File(tmp, s"doc_$id.png"))
    }
    // a false renameTo is fine only if a concurrent run already
    // published; otherwise the staging silently vanished — fail loudly
    if (!tmp.renameTo(published) && !published.exists())
      sys.error(s"stagePngs: could not publish $tmp -> $published")
    ()
  }

  /** Schema of a decoded audio record: header-readable quantities
    * only (`pcm_bytes` = frames · channels · 2 for 16-bit PCM — the
    * decode-verifiable decoded size, analogous to
    * [[decodeImageMeta]]'s w·h·3).
    */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("pcm_bytes", LongType)))

  /** REAL audio decode over (doc_id, content) binary rows: sample
    * rate, channel count and frame length read from the WAV RIFF
    * header with the JDK's `javax.sound.sampled` (no external libs).
    * Narrow mapPartitions, no shuffle — same 100 TB posture as
    * [[decodeImageMeta]].
    */
  def decodeAudioMeta(spark: SparkSession, audio: DataFrame): DataFrame = {
    val enc = Encoders.row(audioMetaSchema)
    audio.select(col("doc_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        require(frames >= 0, s"headerless audio payload for doc ${r.getLong(0)}")
        Row(r.getLong(0), fmt.getSampleRate.toInt, fmt.getChannels, frames,
          frames * fmt.getChannels * 2L)
      }
    }(enc)
  }

  /** Deterministic WAV staging for the audio-decode harness: one real
    * 16-bit PCM wav per audio-typed doc (UTF-8 byte length % 3 == 1,
    * matching [[fakeDecode]]'s modality rule), header fields derived
    * from doc_id (rate = 8000 + id%3·4000, channels = id%2+1, frames =
    * id%50+10) so an oracle can predict what a correct decoder must
    * read back. DRIVER-LOCAL render for the same reason as
    * [[stagePngs]]; idempotent per dir, `<dir>.tmp` + rename publish.
    */
  def stageWavs(documents: DataFrame, dir: String): Unit = {
    val published = new java.io.File(dir)
    if (published.exists()) return
    val tmp = new java.io.File(dir + ".tmp")
    tmp.mkdirs()
    val ids = documents
      .select(col("doc_id"))
      .filter(length(col("text").cast("binary")) % 3 === 1)
      .collect().map(_.getLong(0))
    ids.foreach { id =>
      val rate = (8000 + (id % 3) * 4000).toInt
      val channels = (id % 2 + 1).toInt
      val frames = (id % 50 + 10).toInt
      val pcm = new Array[Byte](frames * channels * 2)
      var i = 0
      while (i < pcm.length) {
        pcm(i) = ((id + i * 31) % 256 - 128).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
        true, false) // signed 16-bit little-endian PCM
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        new java.io.File(tmp, s"doc_$id.wav"))
    }
    if (!tmp.renameTo(published) && !published.exists())
      sys.error(s"stageWavs: could not publish $tmp -> $published")
    ()
  }

  /** Frame-sample plumbing: one row per sampled "frame" (generator
    * shape of a video pipeline) — flatMap expansion with bounded
    * fan-out, no shuffle.
    */
  def frameSample(spark: SparkSession, documents: DataFrame,
      everyNth: Int = 7): DataFrame = {
    val meta = decodeMeta(spark, documents)
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $everyNth)")).as("frame_idx"))
      .withColumn("frame_fp",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))
      .select("doc_id", "frame_idx", "frame_fp")
      .orderBy("doc_id", "frame_idx")
  }
}
