package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MergeOps

/** Structured Streaming restatement of the CDC loop (SURVEY.md §2.5):
  * the reference's poll-based micro-batches map 1:1 onto
  * `foreachBatch` — each micro-batch is one C1 transaction body
  * (dedup J4 → merge J1 → delete J2), and the WATERMARK semantic stays
  * the reference's (strictly-monotone max of landed data, absorbed
  * overlaps via idempotent merge) — NOT Spark's event-time late-data
  * dropping, which the reference explicitly does not do (C9).
  *
  * State is a versioned parquet snapshot per micro-batch (write-new,
  * then repoint) — an idempotent sink: replaying a batch after a crash
  * rewrites the same content. On a lakehouse table format this becomes
  * a single MERGE INTO; the plumbing here keeps zero external deps.
  */
object StreamingSync {

  private def versionDir(stateDir: String, v: Long) = s"$stateDir/v=$v"
  private def pointerFile(stateDir: String) = new java.io.File(stateDir, "LATEST")

  /** Latest committed snapshot, or None before the first batch. */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val p = pointerFile(stateDir)
    if (!p.exists()) None
    else {
      val v = new String(java.nio.file.Files.readAllBytes(p.toPath)).trim.toLong
      Some(spark.read.parquet(versionDir(stateDir, v)))
    }
  }

  /** Attach the incremental-merge sink to a (possibly unbounded) delta
    * stream. Each micro-batch merges into the snapshot exactly like one
    * reference poll round.
    */
  def mergeStream(delta: DataFrame, stateDir: String, pk: String, ts: String,
      isDeleted: Option[String] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = delta.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val merged = currentState(spark, stateDir) match {
          case None => MergeOps.merge(
            // bootstrap: first delta merged into an empty base of the
            // same shape (minus the transient soft-delete flag)
            batch.filter(lit(false)).drop(isDeleted.toSeq: _*),
            batch, pk, ts, isDeleted)
          case Some(base) => MergeOps.merge(base, batch, pk, ts, isDeleted)
        }
        merged.write.mode("overwrite").parquet(versionDir(stateDir, batchId))
        val p = pointerFile(stateDir)
        java.nio.file.Files.write(p.toPath,
          batchId.toString.getBytes("UTF-8"))
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  /** Event-time windowed aggregation with a real Spark watermark — the
    * beyond-parity streaming surface (reference has none): sliding
    * counts + exact-decimal value sums per event type.
    */
  def windowedCounts(events: DataFrame, windowLength: String, slide: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the unbounded twin of the batch
    * `TextOps.dedupExact`: re-deliveries arriving within the watermark
    * horizon are dropped, and the dedup state is evicted once the
    * watermark passes it, so the state store stays bounded no matter
    * how long the stream runs. Emits each surviving row immediately
    * (append mode) rather than holding it until window close.
    */
  def dedupWithinWatermark(events: DataFrame, eventTimeCol: String,
      watermarkDelay: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream inner join with event-time bounds — the streaming
    * enrichment primitive (attribute each purchase to the click that
    * preceded it within `maxLagSeconds`). Both sides carry a watermark
    * and the join predicate bounds purchase_ts to a window after
    * click_ts, so Spark can evict join state once the watermark passes
    * a row's last possible match — state stays bounded on an unbounded
    * stream. Derived as a self-join of one streaming source (two
    * filtered branches), which Structured Streaming plans as a
    * stream-stream join with two independent state stores keyed by
    * user_id.
    */
  def clickPurchaseJoin(events: DataFrame, maxLagSeconds: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $maxLagSeconds SECONDS"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  /** Custom keyed state: per-user session assembly via
    * flatMapGroupsWithState-style semantics, expressed with
    * mapGroupsWithState (KeyValueGroupedDataset) — the escape hatch for
    * state machines windowing can't express.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapSeconds: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_micros"))
      .as[(Long, Long)]

    // state per user: open/closed sessions as (start, end, count)
    typed.groupByKey(_._1)
      .mapGroupsWithState[List[(Long, Long, Long)], Seq[(Long, Long, Long, Long)]](
        GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[List[(Long, Long, Long)]]) =>
          val sorted = evs.map(_._2).toSeq.sorted
          var sessions = state.getOption.getOrElse(Nil)
          val gap = gapSeconds * 1000000L
          sorted.foreach { t =>
            sessions match {
              case (s, e, n) :: rest if t - e <= gap =>
                sessions = (s, math.max(e, t), n + 1) :: rest
              case _ =>
                sessions = (t, t, 1L) :: sessions
            }
          }
          state.update(sessions)
          sessions.reverse.map { case (s, e, n) => (uid, s, e, n) }
      }
      .flatMap(identity)
      .toDF("user_id", "session_start", "session_end", "n_events")
  }
}
