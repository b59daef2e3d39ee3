package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingSync

/** RocksDB state store provider — the disk-backed state backend a
  * 100 TB stream needs (default HDFS-backed provider holds all state
  * on the executor heap). Pins that (a) stateful operators produce
  * identical results under RocksDB, and (b) the provider is actually
  * engaged (rocksdb custom metrics present in the query progress) —
  * not silently fallen back to the default.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked dedup runs on RocksDB state and engages it") {
    implicit val sqlCtx = spark.sqlContext
    StreamingSync.withRocksDbState(spark) {
      val input = MemoryStream[(Long, Timestamp, String)]
      val events = input.toDF().toDF("event_id", "ts", "event_type")
      val deduped = StreamingSync.dedupWithinWatermark(
        events, "ts", "10 minutes", Seq("event_id"))
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName("rocksdb_dedup").start()
      try {
        input.addData(
          (1L, ts("2024-01-01 00:01:00"), "click"),
          (2L, ts("2024-01-01 00:02:00"), "view"),
          (1L, ts("2024-01-01 00:03:00"), "click"), // re-delivery
          (3L, ts("2024-01-01 00:04:00"), "click"))
        q.processAllAvailable()
        input.addData(
          (2L, ts("2024-01-01 00:05:00"), "view"),  // re-delivery, batch 2
          (4L, ts("2024-01-01 00:06:00"), "view"))
        q.processAllAvailable()

        val got = spark.table("rocksdb_dedup")
          .select("event_id").as[Long].collect().sorted.toSeq
        assert(got == Seq(1L, 2L, 3L, 4L),
          s"dedup under RocksDB must match the exact-once set: $got")

        val metrics = q.lastProgress.stateOperators.head
          .customMetrics.keySet()
        assert(metrics.stream().anyMatch(_.startsWith("rocksdb")),
          s"query must actually run on the RocksDB provider; metrics: $metrics")
      } finally q.stop()
    }
  }

  test("provider conf is restored after withRocksDbState") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StreamingSync.withRocksDbState(spark) {
      assert(spark.conf.get(key) == StreamingSync.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) == before)
  }
}
