package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.MergeOps

/** CDC merge semantics pinned from the reference
  * (`query_poll_table.py:107-152`, SURVEY.md §2.3/§2.5): last-write-wins
  * upsert, delete-after-upsert ordering, idempotent re-application,
  * within-batch dedup, zero-delta fast path.
  */
class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def base: DataFrame = Seq(
    (1L, "a", 10.0, ts("2024-01-01 00:00:00")),
    (2L, "b", 20.0, ts("2024-01-01 00:00:00")),
    (3L, "c", 30.0, ts("2024-01-01 00:00:00"))
  ).toDF("pk", "name", "amount", "modstamp")

  private def sortedRows(df: DataFrame): Seq[(Long, String, Double)] =
    df.select("pk", "name", "amount").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq

  test("upsert: delta wins wholesale on PK collision, new PKs inserted") {
    val delta = Seq(
      (2L, "b2", 25.0, ts("2024-01-02 00:00:00"), false),
      (4L, "d", 40.0, ts("2024-01-02 00:00:00"), false)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val out = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(out) == Seq(
      (1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("soft delete: flagged PK removed from the merged image") {
    val delta = Seq(
      (3L, "c", 30.0, ts("2024-01-02 00:00:00"), true)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val out = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(out) == Seq((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  test("insert-then-delete of the same PK within one delta vanishes") {
    // reference ordering J1 then J2 in one txn (`query_poll_table.py:119-152`)
    val delta = Seq(
      (9L, "new", 90.0, ts("2024-01-02 00:00:00"), false),
      (9L, "new", 90.0, ts("2024-01-02 00:00:01"), true)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val out = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(out).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("within-batch dedup: later timestamp wins (J4 last-wins)") {
    val delta = Seq(
      (2L, "old", 21.0, ts("2024-01-02 00:00:00"), false),
      (2L, "new", 22.0, ts("2024-01-02 00:00:05"), false)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val out = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(out).contains((2L, "new", 22.0)))
  }

  test("idempotency: applying the same delta twice equals once") {
    val delta = Seq(
      (2L, "b2", 25.0, ts("2024-01-02 00:00:00"), false),
      (3L, "c", 30.0, ts("2024-01-02 00:00:00"), true),
      (5L, "e", 50.0, ts("2024-01-02 00:00:00"), false)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val once = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    val twice = MergeOps.merge(once.withColumn("x", org.apache.spark.sql.functions.lit(1)).drop("x"),
      delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(once) == sortedRows(twice))
  }

  test("watermark advance = max(modstamp) of landed data, not wall clock") {
    val delta = Seq(
      (2L, "b2", 25.0, ts("2024-01-05 07:00:00"), false)
    ).toDF("pk", "name", "amount", "modstamp", "is_deleted")
    val out = MergeOps.merge(base, delta, "pk", "modstamp", Some("is_deleted"))
    val wm = out.agg(org.apache.spark.sql.functions.max("modstamp")).as[Timestamp].head()
    assert(wm == ts("2024-01-05 07:00:00"))
  }

  test("zero-delta fast path returns base unchanged") {
    val delta = base.withColumn("is_deleted", org.apache.spark.sql.functions.lit(false))
      .filter("pk < 0")
    val out = MergeOps.mergeIfNonEmpty(base, delta, "pk", "modstamp", Some("is_deleted"))
    assert(sortedRows(out) == sortedRows(base))
  }

  test("property: merge idempotency + commutation with dedup over random deltas") {
    // SURVEY §5 #2 — exhaustive-ish randomized check with a fixed seed
    val rnd = new scala.util.Random(42)
    (1 to 15).foreach { _ =>
      val nBase = rnd.nextInt(20) + 1
      val baseDf = (1 to nBase)
        .map(i => (i.toLong, s"b$i", i * 1.0, ts("2024-01-01 00:00:00")))
        .toDF("pk", "name", "amount", "modstamp")
      val delta = (1 to rnd.nextInt(25) + 1).map { _ =>
        val pk = rnd.nextInt(30).toLong
        val sec = rnd.nextInt(60)
        // row content is a function of (pk, sec): timestamp ties are
        // then identical rows, so last-wins stays deterministic
        (pk, s"d$pk", (pk * 100 + sec) * 1.0,
          ts(f"2024-01-02 00:00:$sec%02d"), pk % 5 == 0)
      }.toDF("pk", "name", "amount", "modstamp", "is_deleted")
      val once = sortedRows(
        MergeOps.merge(baseDf, delta, "pk", "modstamp", Some("is_deleted")))
      val twice = sortedRows(MergeOps.merge(
        MergeOps.merge(baseDf, delta, "pk", "modstamp", Some("is_deleted")),
        delta, "pk", "modstamp", Some("is_deleted")))
      assert(once == twice, s"idempotency violated for delta")
    }
  }

  test("two-step incremental equals one-shot (C1 composition)") {
    val d1 = Seq((2L, "b2", 21.0, ts("2024-01-02 00:00:00"))).toDF("pk", "name", "amount", "modstamp")
    val d2 = Seq((2L, "b3", 22.0, ts("2024-01-03 00:00:00")),
      (6L, "f", 60.0, ts("2024-01-03 00:00:00"))).toDF("pk", "name", "amount", "modstamp")
    val stepwise = MergeOps.merge(MergeOps.merge(base, d1, "pk", "modstamp"), d2, "pk", "modstamp")
    val oneshot = MergeOps.merge(base, d1.unionAll(d2), "pk", "modstamp")
    assert(sortedRows(stepwise) == sortedRows(oneshot))
  }

  test("driftCheck classifies content drift, missing chunks, and clean chunks") {
    import org.apache.spark.sql.functions.col
    def rows(seq: Seq[(Long, String)]) = seq.toDF("pk", "payload")
    // chunks of 10: chunk 0 clean, chunk 1 content-drifted, chunk 2
    // only in source, chunk 3 only in target, chunk 4 row-count drift
    val src = rows(Seq(1L -> "a", 2L -> "b", 11L -> "x", 21L -> "s", 41L -> "p", 42L -> "q"))
    val tgt = rows(Seq(1L -> "a", 2L -> "b", 11L -> "CHANGED", 31L -> "t", 41L -> "p"))
    val out = MergeOps.driftCheck(src, tgt, "pk", Seq(col("payload")), 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, "content_drift")),
      2L -> ((1L, 0L, "missing_in_target")),
      3L -> ((0L, 1L, "missing_in_source")),
      4L -> ((2L, 1L, "content_drift"))), s"got $out")
    // chunk 0 (identical on both sides) must NOT be reported
    assert(!out.contains(0L))
  }

  test("identical tables produce an empty drift report (idempotent sync proof)") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("pk", "payload")
    assert(MergeOps.driftCheck(df, df.repartition(7), "pk",
      Seq(col("payload")), 10L).isEmpty)
  }

  test("NULL hash columns digest via the sentinel: ('a',NULL,'b') != ('a','b',NULL)") {
    import org.apache.spark.sql.functions.col
    // concat_ws alone would SKIP the null and hash both rows to the
    // same string; the sentinel coalesce keeps column positions distinct
    val a = Seq((1L, Some("a"), None: Option[String], Some("b")))
      .toDF("pk", "c1", "c2", "c3")
    val b = Seq((1L, Some("a"), Some("b"), None: Option[String]))
      .toDF("pk", "c1", "c2", "c3")
    val cols = Seq(col("c1"), col("c2"), col("c3"))
    val da = MergeOps.chunkDigests(a, "pk", cols, 10L).collect()(0).getLong(1)
    val db = MergeOps.chunkDigests(b, "pk", cols, 10L).collect()(0).getLong(1)
    assert(da != db, "null-position shift must change the digest")
    // and an all-null row still digests (no NULL md5 dropped from SUM)
    val n = Seq((1L, None: Option[String], None: Option[String], None: Option[String]))
      .toDF("pk", "c1", "c2", "c3")
    val dn = MergeOps.chunkDigests(n, "pk", cols, 10L).collect()(0)
    assert(!dn.isNullAt(1) && dn.getLong(2) == 1L)
  }
}
