package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.plans.{AsofJoin, AsofJoinExec}

/** Custom as-of join operator: semantics (latest right <= left ts per
  * key, inner/outer, null keys), self-join safety, and the physical
  * plan shape (co-partitioned exchanges + sorted linear merge).
  */
class AsofJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 09:00:00"), 10.0),
    (1L, ts("2024-01-01 10:00:00"), 11.0),
    (1L, ts("2024-01-01 11:00:00"), 12.0),
    (2L, ts("2024-01-01 09:30:00"), 20.0)
  ).toDF("qk", "qts", "px")

  private val trades = Seq(
    (1L, ts("2024-01-01 09:30:00"), 5L),  // -> 09:00 quote (10.0)
    (1L, ts("2024-01-01 10:00:00"), 6L),  // ts equality matches (11.0)
    (1L, ts("2024-01-01 12:00:00"), 7L),  // -> latest 11:00 quote (12.0)
    (2L, ts("2024-01-01 09:00:00"), 8L),  // before any quote: no match
    (3L, ts("2024-01-01 09:00:00"), 9L)   // key absent on right: no match
  ).toDF("tk", "tts", "qty")

  test("inner as-of picks the latest right row at-or-before each left ts") {
    val out = AsofJoin.asof(trades, quotes, Seq("tk"), Seq("qk"), "tts", "qts")
      .select("tk", "qty", "px").as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 5L, 10.0), (1L, 6L, 11.0), (1L, 7L, 12.0)))
  }

  test("point-in-time composition: purchases read the SCD2 status as-of ts") {
    import org.apache.spark.sql.functions._
    // user 1: view@01, click@03; purchases at 02 (-> view) and 04
    // (-> click); user 2 purchases before any status row -> dropped
    val ev = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:02:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 00:03:00"), 1L, "click"),
      (4L, ts("2024-01-01 00:04:00"), 1L, "purchase"),
      (5L, ts("2024-01-01 00:01:00"), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val dim = graft.operators.MergeOps
      .scd2History(ev.filter(col("event_type") =!= "purchase"))
      .groupBy(col("user_id").as("d_user"), col("valid_from"))
      .agg(max(col("status")).as("status"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val out = AsofJoin.asof(facts, dim,
        Seq("user_id"), Seq("d_user"), "ts", "valid_from")
      .select("purchase_id", "status")
      .as[(Long, String)].collect().toSet
    assert(out == Set((2L, "view"), (4L, "click")), out)
  }

  test("left-outer as-of keeps unmatched left rows with null right") {
    val out = AsofJoin.asof(trades, quotes, Seq("tk"), Seq("qk"), "tts", "qts",
        leftOuter = true)
      .select("qty", "px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(out == Set((5L, Some(10.0)), (6L, Some(11.0)), (7L, Some(12.0)),
      (8L, None), (9L, None)))
  }

  test("self as-of join re-aliases the right side (no duplicate attribute ids)") {
    val e = quotes // same plan on both sides
    val out = AsofJoin.asof(e, e, Seq("qk"), Seq("qk"), "qts", "qts")
    // every row matches at least itself (ts <= ts)
    assert(out.count() == 4)
  }

  test("ambiguous column names are refused, not silently resolved") {
    import spark.implicits._
    // "k" differs from "K" only by case → ambiguous when case-insensitive
    val dup = Seq((1L, 2L, ts("2024-01-02 00:00:00"))).toDF("k", "K", "lts")
    val r = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("rk", "rts")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(dup, r, Seq("k"), Seq("rk"), "lts", "rts")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("null keys and null timestamps never match") {
    val l = Seq((Option(1L), Option(ts("2024-01-01 10:00:00")), "a"),
      (None, Option(ts("2024-01-01 10:00:00")), "b"),
      (Option(1L), None, "c")).toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(ts("2024-01-01 09:00:00")), 1.0),
      (Option[Long](None.orNull.asInstanceOf[Long]), Option(ts("2024-01-01 08:00:00")), 2.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t",
        leftOuter = true)
      .select("tag", "v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(out == Set(("a", Some(1.0)), ("b", None), ("c", None)))
  }

  test("physical plan: AsofJoinExec over co-partitioned, sorted children") {
    val df = AsofJoin.asof(trades, quotes, Seq("tk"), Seq("qk"), "tts", "qts")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: AsofJoinExec => e }
    assert(execs.nonEmpty, s"no AsofJoinExec in:\n$plan")
    val s = plan.toString
    assert(s.contains("hashpartitioning(tk"), s"left not hash-clustered:\n$s")
    assert(s.contains("hashpartitioning(qk"), s"right not hash-clustered:\n$s")
    assert(s.contains("Sort ["), s"children not sorted:\n$s")
  }

  test("forward as-of picks the earliest right row at-or-after each left ts") {
    val out = AsofJoin.asof(trades, quotes, Seq("tk"), Seq("qk"), "tts", "qts",
        forward = true)
      .select("tk", "qty", "px").as[(Long, Long, Double)].collect().toSet
    // trade 09:30 -> 10:00 quote; 10:00 -> equality 10:00; 12:00 -> none;
    // key 2 trade 09:00 -> 09:30 quote; key 3 absent
    assert(out == Set((1L, 5L, 11.0), (1L, 6L, 11.0), (2L, 8L, 20.0)))
  }

  test("forward as-of: consecutive left rows share one right candidate; outer keeps misses") {
    val l = Seq((1L, ts("2024-01-01 09:01:00"), 1L),
      (1L, ts("2024-01-01 09:30:00"), 2L),
      (1L, ts("2024-01-01 23:00:00"), 3L)).toDF("tk", "tts", "qty")
    val out = AsofJoin.asof(l, quotes, Seq("tk"), Seq("qk"), "tts", "qts",
        leftOuter = true, forward = true)
      .select("qty", "px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    // both early trades land on the SAME 10:00 quote (the un-consumed
    // right head is shared); the 23:00 trade has nothing after it
    assert(out == Set((1L, Some(11.0)), (2L, Some(11.0)), (3L, None)))
  }

  test("forward as-of matches the window-function composition on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "rid")
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rid").as("rid"))
    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t", forward = true)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    l.createOrReplaceTempView("asoff_l"); r.createOrReplaceTempView("asoff_r")
    val expect = spark.sql(
      """SELECT lid, rid FROM (
        |  SELECT l.lid, r.rid,
        |    ROW_NUMBER() OVER (PARTITION BY l.lid ORDER BY r.t ASC) AS rn
        |  FROM asoff_l l JOIN asoff_r r ON l.k = r.k AND l.t <= r.t)
        |WHERE rn = 1""".stripMargin).as[(Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("as-of result matches the window-function composition on random data") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "rid")
      // unique (k, t) on the right keeps the expected answer well-defined
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rid").as("rid"))
    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // oracle: plain join + keep the max right ts per left row
    l.createOrReplaceTempView("asof_l"); r.createOrReplaceTempView("asof_r")
    val expect = spark.sql(
      """SELECT lid, rid FROM (
        |  SELECT l.lid, r.rid,
        |    ROW_NUMBER() OVER (PARTITION BY l.lid ORDER BY r.t DESC) AS rn
        |  FROM asof_l l JOIN asof_r r ON l.k = r.k AND l.t >= r.t)
        |WHERE rn = 1""".stripMargin).as[(Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("nearest as-of: closer side wins, ties and equal ts go at-or-before") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // left at t=100: right at 90 (d=10) vs 105 (d=5) -> forward wins
    // left at t=200: right at 195 (d=5) vs 205 (d=5) -> tie -> backward
    // left at t=300: right at 300 -> equal ts, d=0 -> that row
    // left at t=400: only earlier rights -> backward
    // key 2, t=50: only later right -> forward
    // key 3: no right at all -> dropped (inner), kept null (outer)
    val l = Seq((1L, ts(100), 1L), (1L, ts(200), 2L), (1L, ts(300), 3L),
      (1L, ts(400), 4L), (2L, ts(50), 5L), (3L, ts(10), 6L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, ts(90), 90L), (1L, ts(105), 105L), (1L, ts(195), 195L),
      (1L, ts(205), 205L), (1L, ts(300), 300L), (2L, ts(70), 70L))
      .toDF("k", "t", "rid")
    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t", nearest = true)
      .select("lid", "rid").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 105L, 2L -> 195L, 3L -> 300L, 4L -> 300L,
      5L -> 70L), s"got $got")
    val outer = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t",
        leftOuter = true, nearest = true)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(outer(6L).isEmpty && outer.size == 6)
  }

  test("nearest as-of matches the abs-distance window composition on random data") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "rid")
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rid").as("rid"))
    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "t", nearest = true)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    l.createOrReplaceTempView("near_l"); r.createOrReplaceTempView("near_r")
    val expect = spark.sql(
      """SELECT lid, rid FROM (
        |  SELECT l.lid, r.rid,
        |    ROW_NUMBER() OVER (PARTITION BY l.lid
        |      ORDER BY abs(unix_micros(r.t) - unix_micros(l.t)),
        |        CASE WHEN r.t <= l.t THEN 0 ELSE 1 END) AS rn
        |  FROM near_l l JOIN near_r r ON l.k = r.k)
        |WHERE rn = 1""".stripMargin).as[(Long, Long)].collect().toSet
    assert(got == expect)
  }
}
