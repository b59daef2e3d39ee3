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
  * The decoders themselves are STUBBED with a deterministic fake (the
  * container has no image/audio libs — see builder prompt): the fake
  * derives "decoded" properties purely from the byte content, so the
  * Spark-side plumbing (binary schema, batched partition iteration,
  * output schema, partition-preserving shape) is real and testable.
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
