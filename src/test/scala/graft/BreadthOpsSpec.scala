package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextOps}

/** Constructed-data semantics for the round-2 breadth operators
  * (sessionize, cube, pivot, percentiles, range join, bigram freq);
  * the DuckDB oracles cover them at scale, these pin the edge cases.
  */
class BreadthOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w4Sessionize starts a new session exactly past the gap") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:29:59")), // inside gap: same session
      (1L, 3L, ts("2024-01-01 11:00:00")), // 30:01 after #2: new session
      (1L, 4L, ts("2024-01-01 11:30:00")), // exactly 30:00: same session
      (2L, 5L, ts("2024-01-01 00:00:00"))  // other user: own session 1
    ).toDF("user_id", "event_id", "ts")
    val out = Relational.w4Sessionize(ev, 30)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 5L, 1L)))
  }

  test("funnelSteps counts strictly-ordered steps from the earliest prior step") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE the first view -> stuck at step 1
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: never did step 1 -> absent from the result
      (3L, "click", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00")),
      // user 4: click at the SAME instant as view -> strict > fails
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 10:00:00")),
      // user 5: later re-view doesn't matter, earliest view anchors
      (5L, "view", ts("2024-01-01 08:00:00")),
      (5L, "click", ts("2024-01-01 08:30:00")),
      (5L, "view", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Relational.funnelSteps(ev, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 3), (2L, 1), (4L, 1), (5L, 2)))
  }

  test("cohortRetention buckets by first-event day and counts distinct users") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 23:00:00")), // same user+day: distinct collapses
      (1L, ts("2024-01-02 01:00:00")),
      (1L, ts("2024-01-04 09:00:00")),
      (2L, ts("2024-01-01 05:00:00")), // cohort-mate of user 1
      (2L, ts("2024-01-02 05:00:00")),
      (3L, ts("2024-01-02 12:00:00"))  // later cohort
    ).toDF("user_id", "ts")
    val out = Relational.cohortRetention(ev)
      .as[(java.sql.Date, Int, Long)].collect().toSeq
      .map { case (d, o, n) => (d.toString, o, n) }
    assert(out == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 2L), ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("eventTransitions counts adjacent per-user steps with event_id tiebreak") {
    val ev = Seq(
      // user 1: view -> click -> purchase
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "click", ts("2024-01-01 10:05:00")),
      (1L, 3L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: same-instant pair -> event_id orders it view->view
      (2L, 4L, "view", ts("2024-01-01 09:00:00")),
      (2L, 5L, "view", ts("2024-01-01 09:00:00")),
      // user 3: single event -> no transition
      (3L, 6L, "click", ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Relational.eventTransitions(ev)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("click", "purchase", 1L), ("view", "click", 1L),
      ("view", "view", 1L)))
  }

  test("j7IntervalOverlap pairs distinct suppliers with intersecting windows") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val li = Seq(
      // part 10 (window 7d): s1 jan1 & s2 jan5 overlap; s3 feb1 doesn't
      (10L, 1L, d("2024-01-01")),
      (10L, 2L, d("2024-01-05")),
      (10L, 3L, d("2024-02-01")),
      // part 20: same supplier twice -> no pair despite overlap
      (20L, 5L, d("2024-01-01")),
      (20L, 5L, d("2024-01-02")),
      // part 30: windows touching exactly at day 7 COUNT (closed intervals)
      (30L, 1L, d("2024-01-01")),
      (30L, 2L, d("2024-01-08")),
      // part 40: 8 days apart -> no overlap
      (40L, 1L, d("2024-01-01")),
      (40L, 2L, d("2024-01-09"))
    ).toDF("l_partkey", "l_suppkey", "l_shipdate")
    val out = Relational.j7IntervalOverlap(li)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((10L, 1L), (30L, 1L)))
  }

  test("w5Cube emits all four grouping sets") {
    val li = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val out = Relational.w5Cube(li)
      .select("returnflag", "linestatus", "sum_qty")
      .as[(String, String, Double)].collect().toSet
    assert(out == Set(
      ("_ALL_", "_ALL_", 7.0),
      ("_ALL_", "x", 5.0), ("_ALL_", "y", 2.0),
      ("A", "_ALL_", 3.0), ("B", "_ALL_", 4.0),
      ("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0)))
  }

  test("p4Pivot produces one column per event type, null when absent") {
    val ev = Seq((1L, "click", 1.5), (1L, "click", 2.5), (1L, "view", 1.0),
      (2L, "error", 4.0)).toDF("user_id", "event_type", "value")
    val out = Relational.p4Pivot(ev).orderBy("user_id").collect()
    assert(out(0).getDouble(out(0).fieldIndex("click")) == 4.0)
    assert(out(0).isNullAt(out(0).fieldIndex("purchase")))
    assert(out(1).getDouble(out(1).fieldIndex("error")) == 4.0)
  }

  test("a4Percentiles interpolates the continuous quantile") {
    val li = (1 to 5).map(q => ("A", q.toDouble)).toDF("l_returnflag", "l_quantity")
    val r = Relational.a4Percentiles(li).head()
    assert(r.getDouble(r.fieldIndex("p25")) == 2.0) // 0.25*(5-1)=1 -> exact
    assert(r.getDouble(r.fieldIndex("p50")) == 3.0)
    assert(r.getDouble(r.fieldIndex("p95")) == 4.8) // 0.95*4=3.8 -> 4+0.8
  }

  test("j5RangeJoin counts month starts inside each ship window") {
    val li = Seq((1L, 1, "2024-01-15"), (2L, 1, "2024-03-30"))
      .toDF("l_orderkey", "l_linenumber", "d")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("d").cast("timestamp").as("l_shipdate"))
    val ord = Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01")
      .toDF("d").select(col("d").cast("date").as("o_orderdate"))
    val out = Relational.j5RangeJoin(li, ord)
      .as[(Long, Int, Long)].collect().toSet
    // window 1: Jan15..Mar15 -> Feb1, Mar1; window 2: Mar30..May29 -> Apr1, May1
    assert(out == Set((1L, 1, 2L), (2L, 1, 2L)))
  }

  test("saltedJoin matches the plain join on skewed data, spreads the key") {
    // 70% of facts share one key — the hot-key shape salting exists for
    val facts = (1 to 200).map(i =>
      (if (i <= 140) 1L else (i % 20).toLong, i.toDouble)).toDF("k", "v")
    val dim = (0 to 19).map(i => (i.toLong, s"dim-$i")).toDF("dk", "name")
    val plain = facts.join(dim, col("k") === col("dk"))
      .select("k", "v", "name").collect().toSet
    val salted = Relational.saltedJoin(facts, dim, "k", "dk", 8)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain) // identical multiset (rows unique here)
    val p = Relational.saltedJoin(facts, dim, "k", "dk", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt_"), "salt column missing from the join plan")
  }

  test("approx sketches stay within error bounds of the exact answers") {
    val ev = Tables(spark, sf0001, "events")
    val exact = Relational.a5DistinctCount(ev)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = Relational.a6ApproxDistinct(ev)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    approx.foreach { case (t, a) =>
      val e = exact(t).toDouble
      assert(math.abs(a - e) / e <= 0.10, s"$t: approx $a vs exact $e") // 2% rsd, wide margin
    }
    val li = Tables(spark, sf0001, "lineitem")
    val exactQ = Relational.a4Percentiles(li)
      .select("l_returnflag", "p50").as[(String, Double)].collect().toMap
    Relational.a7ApproxQuantiles(li)
      .select("l_returnflag", "p50_approx").as[(String, Double)].collect()
      .foreach { case (f, p50a) =>
        assert(math.abs(p50a - exactQ(f)) <= 2.0,
          s"$f: approx p50 $p50a vs exact ${exactQ(f)}")
      }
  }

  test("bigramFreq counts overlapping bigrams with deterministic ties") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.bigramFreq(docs, 3).as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("w7GapFill fills missing hours with zeros, bounded by the data") {
    val ev = Seq(
      (1L, "click", "2024-01-01 00:10:00"),
      (2L, "click", "2024-01-01 03:20:00"), // hours 1,2 missing for click
      (3L, "view", "2024-01-01 01:00:00"))
      .toDF("event_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val rows = Relational.w7GapFill(ev)
      .as[(String, String, Long)].collect().toSeq
    // spine = hours 00..03 × {click, view} = 8 rows
    assert(rows.length == 8)
    val m = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("click", "2024-01-01 00:00:00")) == 1L)
    assert(m(("click", "2024-01-01 01:00:00")) == 0L) // filled gap
    assert(m(("click", "2024-01-01 02:00:00")) == 0L)
    assert(m(("click", "2024-01-01 03:00:00")) == 1L)
    assert(m(("view", "2024-01-01 01:00:00")) == 1L)
    assert(m(("view", "2024-01-01 03:00:00")) == 0L)
  }

  test("w13RollingMedian: 5-row frame medians in fixed-point cents") {
    val ev = Seq(
      (1L, "click", 1.00), (2L, "click", 3.00), (3L, "click", 2.00),
      (4L, "click", 100.00), (5L, "click", 4.00), (6L, "click", 5.00),
      (7L, "view", 10.00)).toDF("event_id", "event_type", "value")
    val got = Relational.w13RollingMedian(ev)
      .as[(Long, String, Long, Double)].collect().toSeq
    val m = got.map(r => r._1 -> r._4).toMap
    assert(m(1L) == 100.0)            // frame [100]
    assert(m(2L) == 200.0)            // frame [100,300] → interpolated midpoint
    assert(m(3L) == 200.0)            // [100,300,200] → 200
    assert(m(4L) == 250.0)            // [100,300,200,10000] → mid(200,300)
    assert(m(5L) == 300.0)            // [100,300,200,10000,400] → 300
    assert(m(6L) == 400.0)            // spike exits influence: [300,200,10000,400,500]
    assert(m(7L) == 1000.0)           // separate partition
    // spike row 4 never drags the median the way a mean would
    assert(got.filter(_._2 == "click").map(_._4).max == 400.0)
  }

  test("a8ProfileColumns: one row per column with exact stats, nulls counted") {
    val df = Seq(
      (1L, Some("x"), Some(2.5)),
      (2L, None, Some(2.5)),
      (3L, Some("y"), None)).toDF("id", "s", "v")
    val rows = Relational.a8ProfileColumns(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("id") == ("id", 3L, 0L, 3L, "1", "3"))
    assert(rows("s") == ("s", 2L, 1L, 2L, "x", "y"))
    assert(rows("v") == ("v", 2L, 1L, 1L, "2.5", "2.5"))
  }

  test("a8ProfileColumns approx=true: bounded-memory distinct within HLL error bound") {
    // 1000 rows, 250 distinct ids, plus nulls — large enough that the
    // HLL estimate is exercised, small enough to know the exact answer
    val df = spark.range(1000)
      .select((col("id") % 250).as("k"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7)
          .as("m"))
    val approx = Relational.a8ProfileColumns(df, Seq("k", "m"), approx = true)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val exact = Map("k" -> 250L, "m" -> 7L)
    for ((c, ex) <- exact) {
      val (_, nn, nulls, nd, mn, mx) = approx(c)
      // HLL++ rsd = 0.02 is one standard deviation; 5σ + 1 never fires
      // spuriously yet catches a broken sketch immediately (same bound
      // as a6ApproxDistinctCheck)
      assert(math.abs(nd - ex) <= 5 * 0.02 * ex + 1,
        s"$c: approx $nd vs exact $ex out of bound")
      // the non-distinct stats stay exact in approx mode
      if (c == "k") { assert(nn == 1000L && nulls == 0L && mn == "0" && mx == "249") }
      if (c == "m") { assert(nn == 900L && nulls == 100L) }
    }
  }

  test("a18Autocorr: alternating series -> -1, trending series -> +1") {
    // per-type lag pairs: 'alt' flips between 1 and 3 (perfect negative
    // lag-1 correlation), 'up' climbs linearly (perfect positive)
    val ev = (1L to 8L).flatMap { i =>
      Seq((2 * i, ts(f"2024-01-01 10:00:${i}%02d"), "alt",
            if (i % 2 == 0) 1.0 else 3.0),
          (2 * i + 1, ts(f"2024-01-01 10:00:${i}%02d"), "up", i.toDouble))
    }.toDF("event_id", "ts", "event_type", "value")
    val out = Relational.a18Autocorr(ev)
      .as[(String, Long, Double)].collect()
      .map { case (k, n, r) => k -> ((n, math.rint(r * 1e9) / 1e9)) }.toMap
    assert(out("alt") == ((7L, -1.0)) && out("up") == ((7L, 1.0)))
  }

  test("w18Attribution credits the last prior click inside 7 days only") {
    val ev = Seq(
      // user 1: click then purchase 1 min later -> attributed
      (1L, 1L, "click", ts("2024-01-10 10:00:00")),
      (2L, 1L, "purchase", ts("2024-01-10 10:01:00")),
      // user 2: click 8 days before purchase -> stale, NOT attributed
      (3L, 2L, "click", ts("2024-01-01 10:00:00")),
      (4L, 2L, "purchase", ts("2024-01-09 10:00:01")),
      // user 3: no click at all -> attributed=false, null touch
      (5L, 3L, "purchase", ts("2024-01-10 10:00:00")),
      // user 4: click AFTER the purchase must not count
      (6L, 4L, "purchase", ts("2024-01-10 10:00:00")),
      (7L, 4L, "click", ts("2024-01-10 10:00:01"))
    ).map { case (e, u, t0, t1) => (e, u, t0, t1, 0.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Relational.w18Attribution(ev)
      .select("event_id", "attributed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(2L -> true, 4L -> false, 5L -> false, 6L -> false))
  }

  test("mvMergeDelta over a mid-group split equals the full recompute") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a", 1.25),
      (2L, ts("2024-01-01 11:00:00"), "a", 2.50), // same day, after cut
      (3L, ts("2024-01-01 12:00:00"), "b", 4.00), // delta-only group
      (4L, ts("2024-01-02 09:00:00"), "a", 8.00)  // base-only group
    ).toDF("event_id", "ts", "event_type", "value")
    val cut = "2024-01-01 10:00:00"
    val merged = graft.operators.MergeOps.mvMergeDelta(
      graft.operators.MergeOps.mvPartials(ev.filter(col("ts") < cut)),
      graft.operators.MergeOps.mvPartials(ev.filter(col("ts") >= cut)))
      .select(col("event_type"), col("day").cast("string"), col("cnt"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(merged == Set(
      ("a", "2024-01-01", 2L, 3.75), ("b", "2024-01-01", 1L, 4.0),
      ("a", "2024-01-02", 1L, 8.0)))
  }

  test("bottomKSample: exact k per stratum, rank = ascending md5 priority") {
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = graft.operators.PipelineOps.bottomKSample(docs, 5)
      .as[(String, Int, Long, Long)].collect()
    assert(out.length == 10 &&
      out.count(_._1 == "en") == 5 && out.count(_._1 == "de") == 5)
    for (g <- out.groupBy(_._1).values) {
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.sameElements(byRank.sorted),
        "priority must ascend with rank")
    }
    // sample is a subset of the stratum and deterministic across runs
    val again = graft.operators.PipelineOps.bottomKSample(docs, 5)
      .as[(String, Int, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
