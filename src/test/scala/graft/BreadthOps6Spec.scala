package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{PipelineOps, Relational, TextOps}

/** Constructed-data semantics for the round-6 analytics breadth
  * operators (unpivot, percent-rank, islands, mode, chi-square, Q18,
  * TTR, readability, length buckets); the DuckDB oracles cover them
  * at data scale, these pin the edge cases.
  */
class BreadthOps6Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("p5Unpivot melts 4 measures and sums exactly per flag") {
    val li = Seq(
      ("A", 1.0, 10.0, 0.1, 0.02),
      ("A", 2.0, 20.0, 0.2, 0.04),
      ("B", 5.0, 50.0, 0.5, 0.08)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Relational.p5Unpivot(li)
      .as[(String, String, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("A", "discount", 0.3, 2L), ("A", "extendedprice", 30.0, 2L),
      ("A", "quantity", 3.0, 2L), ("A", "tax", 0.06, 2L),
      ("B", "discount", 0.5, 1L), ("B", "extendedprice", 50.0, 1L),
      ("B", "quantity", 5.0, 1L), ("B", "tax", 0.08, 1L)))
  }

  test("w19PercentRank: ties share rank/peer counts; singleton group is 0.0") {
    val ev = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 30.0),
      (5L, "b", 7.0) // singleton: pct_rank pinned to 0.0, cume 1.0
    ).toDF("event_id", "event_type", "value")
    val out = Relational.w19PercentRank(ev)
      .as[(Long, String, Double, Double)].collect().toSeq
    // group a (n=4): ranks 1,2,2,4; peers_le 1,3,3,4
    assert(out == Seq(
      (1L, "a", 0.0, 0.25),
      (2L, "a", 0.333333333333, 0.75), // (rank-1)/(n-1) rounded to 12 dp
      (3L, "a", 0.333333333333, 0.75),
      (4L, "a", 1.0, 1.0),
      (5L, "b", 0.0, 1.0)))
  }

  test("w20Islands groups maximal consecutive-day runs, collapsing same-day events") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-02 01:00:00")), (1L, ts("2024-01-03 12:00:00")),
      (1L, ts("2024-01-05 00:00:00")), // gap -> own island
      (2L, ts("2024-01-10 10:00:00")), (2L, ts("2024-01-11 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Relational.w20Islands(ev)
      .as[(Long, java.sql.Date, java.sql.Date, Long)].collect().toSeq
      .map { case (u, s, e, n) => (u, s.toString, e.toString, n) }
    assert(out == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-10", "2024-01-11", 2L)))
  }

  test("a19Mode breaks count ties lexicographically") {
    val ev = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),      // clear winner: view
      (2L, "view"), (2L, "click"), (2L, "click"), (2L, "view") // tie -> click
    ).toDF("user_id", "event_type")
    val out = Relational.a19Mode(ev).as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 2L), (2L, "click", 2L)))
  }

  test("a20Chisq: independent 2x2 has zero contribution, skewed cell does not") {
    // perfectly independent: every cell = row*col/N exactly
    val docs = Seq(
      ("en", "web"), ("en", "web"), ("en", "book"),
      ("fr", "web"), ("fr", "web"), ("fr", "book")
    ).toDF("lang", "source")
    val out = Relational.a20Chisq(docs)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("en", "book", 1L, 1.0, 0.0), ("en", "web", 2L, 2.0, 0.0),
      ("fr", "book", 1L, 1.0, 0.0), ("fr", "web", 2L, 2.0, 0.0)))
    // fully dependent 2x2 (only observed cells appear — groupBy emits no
    // zero cells): e = 1*1/2 = 0.5, contrib = (1-0.5)^2/0.5 = 0.5
    val dep = Seq(("en", "web"), ("fr", "book")).toDF("lang", "source")
    val dout = Relational.a20Chisq(dep)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(dout == Seq(
      ("en", "web", 1L, 0.5, 0.5),
      ("fr", "book", 1L, 0.5, 0.5)))
  }

  test("q18LargeOrders keeps only orders past the quantity threshold") {
    val li = Seq(
      (100L, 200.0), (100L, 120.0), // order 100: 320 > 250
      (101L, 100.0),                // order 101: under
      (102L, 251.0)                 // order 102: over
    ).toDF("l_orderkey", "l_quantity")
    val ord = Seq(
      (100L, 1L, "1995-01-01", 1000.0),
      (101L, 1L, "1995-02-01", 500.0),
      (102L, 2L, "1995-03-01", 700.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
    val out = Relational.q18LargeOrders(cust, ord, li)
      .select("c_name", "o_orderkey", "total_qty")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("alice", 100L, 320.0), ("bob", 102L, 251.0)))
  }

  test("a21Gini: equal values give 0, a single whale concentrates") {
    val ev = Seq(
      (1L, "flat", 5.0), (2L, "flat", 5.0), (3L, "flat", 5.0), (4L, "flat", 5.0),
      (5L, "whale", 0.0), (6L, "whale", 0.0), (7L, "whale", 0.0), (8L, "whale", 10.0)
    ).toDF("event_id", "event_type", "value")
    val out = Relational.a21Gini(ev)
      .as[(String, Long, Double)].collect().toSeq
      .map { case (t, n, g) => t -> (n, g) }.toMap
    assert(out("flat") == (4L, 0.0))
    // ranks 1..4 on (0,0,0,10): six = 40, sx = 10 -> (80-50)/40 = 0.75
    assert(out("whale") == (4L, 0.75))
  }

  test("w21MinMaxScale pins [0,1] per group; degenerate group pins 0.5") {
    val ev = Seq(
      (1L, "a", 0.0), (2L, "a", 10.0), (3L, "a", 5.0),
      (4L, "b", 7.0), (5L, "b", 7.0) // max = min -> 0.5, not NaN
    ).toDF("event_id", "event_type", "value")
    val out = Relational.w21MinMaxScale(ev)
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 0.0), (2L, "a", 1.0), (3L, "a", 0.5),
      (4L, "b", 0.5), (5L, "b", 0.5)))
  }

  test("a22Benford reads digits from the decimal rendering, drops sub-1 amounts") {
    val ord = Seq(
      (1L, 1.50), (2L, 19.99), (3L, 150.0), // digit 1 x3
      (4L, 2.00),                           // digit 2
      (5L, 0.50)                            // < 1: excluded
    ).toDF("o_orderkey", "o_totalprice")
    val out = Relational.a22Benford(ord)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(("1", 3L), ("2", 1L)))
    assert(out.head._3 == 0.75 && out(1)._3 == 0.25)
    // P(1) = log10(2), P(2) = log10(1.5), both rounded to 6 dp
    assert(out.head._4 == 0.30103 && out(1)._4 == 0.176091)
  }

  test("a23TypeEntropy: uniform day = ln 2, single-type day = 0") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      (3L, ts("2024-01-02 10:00:00"), "view"),
      (4L, ts("2024-01-02 11:00:00"), "view")
    ).toDF("event_id", "ts", "event_type")
    val out = Relational.a23TypeEntropy(ev)
      .as[(java.sql.Date, Long, Double)].collect().toSeq
      .map { case (d, n, h) => (d.toString, n, h) }
    assert(out.map(r => (r._1, r._2)) == Seq(("2024-01-01", 2L), ("2024-01-02", 2L)))
    assert(math.abs(out.head._3 - math.log(2.0)) < 1e-11)
    assert(out(1)._3 == 0.0)
  }

  test("a24KsTest: shifted sample yields D = 1/3; identical samples yield 0") {
    val ev = Seq(
      (1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 3.0),
      (4L, "view", 2.0), (5L, "view", 3.0), (6L, "view", 4.0),
      (7L, "purchase", 99.0) // other types are out of the comparison
    ).toDF("event_id", "event_type", "value")
    val out = Relational.a24KsTest(ev)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((3L, 3L, 0.333333333333)))
    val same = Relational.a24KsTest(
      ev.filter($"event_type" === "click")
        .union(ev.filter($"event_type" === "click")
          .withColumn("event_type", lit("view"))))
    assert(same.as[(Long, Long, Double)].collect().toSeq == Seq((3L, 3L, 0.0)))
  }

  test("a25WelchT matches the hand formula; singleton groups drop") {
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 4.0), (5L, "b", 5.0), (6L, "b", 6.0),
      (7L, "solo", 9.0) // n = 1: variance undefined, excluded
    ).toDF("event_id", "event_type", "value")
    val out = Relational.a25WelchT(ev)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(("a", "b")))
    // means 2 vs 5, var 1 each: t = -3 / sqrt(2/3)
    val expected = BigDecimal(-3.0 / math.sqrt(2.0 / 3.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head._5 - expected) < 1e-9, s"t=${out.head._5}")
  }

  test("a31AnovaF matches the hand formula on three separated groups") {
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 4.0), (5L, "b", 5.0), (6L, "b", 6.0),
      (7L, "c", 7.0), (8L, "c", 8.0), (9L, "c", 9.0)
    ).toDF("event_id", "event_type", "value")
    val out = Relational.a31AnovaF(ev)
      .as[(Long, Long, Double)].collect().toSeq
    // group means 2/5/8, grand mean 5: SSB = 3*(9+0+9) = 54 over
    // k-1 = 2 df; SSW = 2+2+2 = 6 over N-k = 6 df -> F = 27/1 = 27
    assert(out == Seq((3L, 9L, 27.0)))
    // k = 1 (single group) is degenerate: no row, not a NaN
    assert(Relational.a31AnovaF(ev.filter($"event_type" === "a"))
      .collect().isEmpty)
  }

  test("w23SessionDuration: gap splits spans; interpolated p50/p90 over micros") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(s: Long) = new Timestamp(t0.getTime + s * 1000L)
    val ev = Seq(
      (1L, 7L, t0), (2L, 7L, plus(10)),       // session 1: 10 s span
      (3L, 7L, plus(10 * 3600))               // past the gap: 0 s span
    ).toDF("event_id", "user_id", "ts")
    val out = Relational.w23SessionDuration(ev, 30)
      .as[(Long, Double, Double, Double)].head()
    // spans {0, 10} s -> p50 interpolates to 5, p90 to 9
    assert(out == ((2L, 5.0, 9.0, 10.0)))
  }

  test("w24ConversionLag: first-view to first-purchase spans, non-converters drop") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(s: Long) = new Timestamp(t0.getTime + s * 1000L)
    val ev = Seq(
      (1L, 1L, "view", t0), (2L, 1L, "purchase", plus(10)),   // lag 10 s
      (3L, 2L, "view", plus(5)), (4L, 2L, "purchase", plus(25)), // lag 20 s
      (5L, 3L, "view", t0),                                   // never buys
      (6L, 4L, "purchase", t0)                                // never views
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Relational.w24ConversionLag(ev)
      .as[(Long, Double, Double)].head()
    // spans {10, 20} -> p50 = 15, p90 = 19
    assert(out == ((2L, 15.0, 19.0)))
  }

  test("w25DecayScore: one half-life halves the contribution, anchor counts full") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-08 00:00:00")
    val weekAgo = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, 5L, "view", 10.0, weekAgo), // exactly one half-life old -> 5.0
      (2L, 5L, "view", 4.0, t0)        // at the anchor -> 4.0
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Relational.w25DecayScore(ev)
      .as[(Long, Long, Double)].head()
    assert(out == ((5L, 2L, 9.0)))
  }

  test("a32MutualInfo: dependent bands give ln 2, independent bands give 0") {
    // type a always lands in band 0 (< 50), type b in band 1: knowing
    // the type determines the band -> MI = ln 2 (in 9-dp contributions)
    val dep = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 60.0), (4L, "b", 70.0)).toDF("event_id", "event_type", "value")
    val out = Relational.a32MutualInfo(dep)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((2L, 4L, 0.693147180)))
    // each type splits 50/50 across the bands: independent -> MI = 0
    val ind = Seq(
      (1L, "a", 10.0), (2L, "a", 60.0),
      (3L, "b", 20.0), (4L, "b", 70.0)).toDF("event_id", "event_type", "value")
    assert(Relational.a32MutualInfo(ind)
      .as[(Long, Long, Double)].head() == ((4L, 4L, 0.0)))
  }

  test("a27MannWhitney: tie-corrected U via doubled integer ranks") {
    val ev = Seq(
      (1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 3.0),
      (4L, "view", 2.0), (5L, "view", 3.0), (6L, "view", 4.0),
      (7L, "purchase", 99.0) // other types are out of the comparison
    ).toDF("event_id", "event_type", "value")
    // pooled average ranks: 1 -> 1; {2,2} -> 2.5; {3,3} -> 4.5; 4 -> 6
    // R_a = 1 + 2.5 + 4.5 = 8 -> U_a = 8 - 6 = 2, U_b = 9 - 2 = 7
    val out = Relational.a27MannWhitney(ev)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((3L, 3L, 2.0, 7.0, 0.222222222)))
    // one-sided input emits no row (division-by-zero guard)
    assert(Relational.a27MannWhitney(
      ev.filter($"event_type" === "click")).isEmpty)
  }

  test("a29Spearman: monotone trends hit ±1 exactly; all-tied side pins 0") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // value rises with time (nonlinearly — Spearman only sees order)
      (1L, ts(1), "up", 1.0), (2L, ts(2), "up", 10.0), (3L, ts(3), "up", 1000.0),
      // value falls with time
      (4L, ts(1), "down", 9.0), (5L, ts(2), "down", 5.0), (6L, ts(3), "down", 1.0),
      // all values tied: zero variance -> pinned 0.0
      (7L, ts(1), "flat", 2.0), (8L, ts(2), "flat", 2.0), (9L, ts(3), "flat", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Relational.a29Spearman(ev)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("down", 3L, -1.0), ("flat", 3L, 0.0), ("up", 3L, 1.0)), out)
  }

  test("a28Psi: symmetric two-bin shift, add-one smoothing over observed bins") {
    val ev = Seq(
      (1L, "click", 5.0), (2L, "click", 5.0), (3L, "click", 15.0),
      (4L, "view", 5.0), (5L, "view", 15.0), (6L, "view", 15.0)
    ).toDF("event_id", "event_type", "value")
    // bins 0/1; smoothed p: (0.6 vs 0.4) and (0.4 vs 0.6) ->
    // psi = 2 * 0.2 * ln(1.5)
    val out = Relational.a28Psi(ev)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((2L, 3L, 3L)))
    assert(math.abs(out.head._4 - 0.4 * math.log(1.5)) < 1e-11,
      s"psi=${out.head._4}")
  }

  test("a26CramersV: perfect dependence is 1, zero cells included in chi2") {
    // 2x2 with only the diagonal observed: without the (0 - e)^2/e
    // zero-cell terms chi2 would be n/2 and V would come out 1/sqrt(2)
    val dep = Seq(("en", "web"), ("fr", "book")).toDF("lang", "source")
    val out = Relational.a26CramersV(dep)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(out == ((2L, 2L, 2L, 2.0, 1.0)))
    // independent 2x2: chi2 = 0, V = 0
    val ind = Seq(("en", "web"), ("en", "book"), ("fr", "web"), ("fr", "book"))
      .toDF("lang", "source")
    val iout = Relational.a26CramersV(ind)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(iout == ((2L, 2L, 4L, 0.0, 0.0)))
  }

  test("codeDetect separates indented/symbol-heavy text from prose") {
    val code = "def f(x):\n  y = (x + 1)\n  z = [y]\n  return z;"
    val prose = "The quick brown fox jumps over the lazy dog. " * 3
    val docs = Seq((1L, code), (2L, prose)).toDF("doc_id", "text")
    val out = TextOps.codeDetect(docs)
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._5, s"code sample must flag is_code: ${byId(1L)}")
    assert(!byId(2L)._5, s"prose must not flag is_code: ${byId(2L)}")
    // 3 of the 4 code lines start with two spaces
    assert(byId(1L)._2 == 4L && byId(1L)._3 == 0.75)
  }

  test("typeTokenRatio: repetition lowers TTR; empty text pins 0") {
    val docs = Seq(
      (1L, "the the the the"),   // 4 tokens, 1 type
      (2L, "all words differ"),  // 3/3
      (3L, "")                   // 0 tokens -> ttr 0.0
    ).toDF("doc_id", "text")
    val out = TextOps.typeTokenRatio(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 3L, 1.0), (3L, 0L, 0L, 0.0)))
  }

  test("readability counts terminator runs and vowel groups, floors at 1") {
    val docs = Seq(
      (1L, "Go now. Stop!! Why?"), // 4 words, 3 terminator runs
      (2L, "xyz")                  // no vowels/terminators -> floors = 1
    ).toDF("doc_id", "text")
    val out = TextOps.readability(docs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val r1 = out.head
    assert(r1._1 == 1L && r1._2 == 4L && r1._3 == 3L)
    // "Go now. Stop!! Why?" vowel groups: o, o, o, - stop has 'o'; why has 'y'
    assert(r1._4 == 4L)
    val expected1 = BigDecimal(206.835 - 1.015 * 4.0 / 3.0 - 84.6 * 4.0 / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r1._5 - expected1) < 1e-9)
    val r2 = out(1)
    assert(r2._2 == 1L && r2._3 == 1L && r2._4 == 1L)
  }

  test("lengthBuckets assigns the largest power of two <= token count") {
    val docs = Seq(
      (1L, ""),            // 0 tokens -> bucket 0
      (2L, "a"),           // 1 -> 1
      (3L, "a b"),         // 2 -> 2
      (4L, "a b c"),       // 3 -> 2
      (5L, "a b c d"),     // 4 -> 4
      (6L, "a b c d e f g") // 7 -> 4
    ).toDF("doc_id", "text")
    val out = PipelineOps.lengthBuckets(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 0L), (1L, 1L, 1L), (2L, 2L, 5L), (4L, 2L, 11L)))
  }

  test("a33KruskalWallis: textbook no-tie H; all-tied input pins 0") {
    // 3 groups of 2 with fully separated values: ranks {1,2},{3,4},
    // {5,6} -> H = 12/(6·7)·(9/2+49/2+121/2) − 3·7 = 4.571428571
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0), (4L, "b", 4.0),
      (5L, "c", 5.0), (6L, "c", 6.0)).toDF("event_id", "event_type", "value")
    val out = Relational.a33KruskalWallis(ev)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((3L, 6L, 4.571428571)), out)
    // every value identical: tie correction hits 0 -> pinned H = 0.0
    val flat = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "b", 5.0))
      .toDF("event_id", "event_type", "value")
    assert(Relational.a33KruskalWallis(flat)
      .as[(Long, Long, Double)].head() == ((2L, 3L, 0.0)))
  }

  test("a39ParetoShare: ceil cutoffs carve the whale cohorts exactly") {
    // 20 users: u1=62, u2=20, 18 others at 1 → total 100;
    // top-1% = ceil(0.2) = 1 user (62%), top-10% = 2 users (82%)
    val ev = (Seq((101L, 1L, 62.0), (102L, 2L, 20.0)) ++
      (3L to 20L).map(u => (100L + u, u, 1.0)))
      .toDF("event_id", "user_id", "value")
    val out = Relational.a39ParetoShare(ev)
      .as[(Long, Double, Double, Double)].head()
    assert(out == ((20L, 100.0, 0.62, 0.82)), out)
  }

  test("a38AbConversion: hand-checked pooled z over parity arms") {
    // arm 0 = users 2,4 (user 2 converts); arm 1 = users 1,3 (none)
    val ev = Seq(
      (1L, 1L, "click"), (2L, 2L, "purchase"), (3L, 3L, "view"),
      (4L, 4L, "click"), (5L, 2L, "click"))
      .toDF("event_id", "user_id", "event_type")
    val out = Relational.a38AbConversion(ev)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    // z = 0.5 / sqrt(0.25·0.75·(1/2+1/2)) = 1.154700538
    assert(out == ((2L, 1L, 2L, 0L, 0.5, 0.0, 1.154700538)), out)
    // degenerate all-converted pool pins z to 0.0
    val all = Seq((1L, 1L, "purchase"), (2L, 2L, "purchase"))
      .toDF("event_id", "user_id", "event_type")
    assert(Relational.a38AbConversion(all)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()._7 == 0.0)
  }

  test("jsonlPermissiveCensus: planted corrupt lines are counted, not dropped") {
    val docs = Seq((1L, "plain"), (13L, "will corrupt"),
      (14L, "quote \" and tab\t survive escaping"))
      .toDF("doc_id", "text")
    val out = graft.operators.FileOps.jsonlPermissiveCensus(spark, docs,
      "/tmp/graft_s15_spec").as[(Long, Long, Long, Long)].head()
    // doc 13 writes an unterminated string: 1 corrupt, good ids 1+14
    assert(out == ((3L, 2L, 1L, 15L)), out)
  }

  test("a37SeasonalError: flat week then a spike — MASE pins the ratio") {
    // one event/day for 7 days, two on day 8: naive MAE = 1/7 over 7
    // lag-1 pairs; the single day-7 pair (day8 vs day1) errs by 1
    val ev = (1 to 7).map(d =>
        (d.toLong, ts(f"2024-01-0$d%d 10:00:00"), "a")) ++ Seq(
        (8L, ts("2024-01-08 10:00:00"), "a"),
        (9L, ts("2024-01-08 11:00:00"), "a"))
    val out = Relational.a37SeasonalError(
      ev.toDF("event_id", "ts", "event_type"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 7L, 1L, 0.142857143, 1.0, 7.0)), out)
  }

  test("j12BandJoin: eps-band pairs found across bucket edges, once each") {
    // a: 1.000-1.005 collide (.005); 1.02 is .015 from 1.005 - out;
    // b: two exactly-equal values pair once via the id tie-break
    val ev = Seq(
      (1L, "a", 1.000), (2L, "a", 1.005), (3L, "a", 1.02), (4L, "a", 5.0),
      (5L, "b", 2.0), (6L, "b", 2.0))
      .toDF("event_id", "event_type", "value")
    val out = Relational.j12BandJoin(ev)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1L), ("b", 1L)), out)
  }

  test("a35RfmSegments: separated customers land in distinct quartiles") {
    val orders = Seq(
      (1L, 101L, ts("1996-01-01 00:00:00"), 100.0),
      (2L, 102L, ts("1997-01-01 00:00:00"), 200.0),
      (3L, 102L, ts("1997-02-01 00:00:00"), 200.0),
      (4L, 103L, ts("1998-01-01 00:00:00"), 300.0),
      (5L, 103L, ts("1998-02-01 00:00:00"), 300.0),
      (6L, 103L, ts("1998-03-01 00:00:00"), 300.0),
      (7L, 104L, ts("1998-06-01 00:00:00"), 400.0),
      (8L, 104L, ts("1998-06-02 00:00:00"), 400.0),
      (9L, 104L, ts("1998-06-03 00:00:00"), 400.0),
      (10L, 104L, ts("1998-06-04 00:00:00"), 400.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.a35RfmSegments(orders)
      .select("o_custkey", "rfm_code").as[(Long, Int)].collect().toSeq
    // recency, frequency and monetary all rise together here, so each
    // customer owns one quartile on every axis
    assert(out == Seq((101L, 111), (102L, 222), (103L, 333), (104L, 444)),
      out)
  }

  test("j11AssocRules: min-support prunes; lift reflects the baskets") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 30L), (4L, 40L))
      .toDF("l_orderkey", "l_partkey")
    val out = Relational.j11AssocRules(li)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // only (10,20) reaches 3 co-orders: support 3/4, conf 3/3,
    // lift 3·4/(3·3) = 4/3
    assert(out == Seq((10L, 20L, 3L, 0.75, 1.0, 1.333333333)), out)
  }

  test("w27MarkovAccuracy: argmax hit rate; label ties break to MIN") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click"),
      (2L, ts("2024-01-01 00:02:00"), 1L, "view"),
      (3L, ts("2024-01-01 00:03:00"), 1L, "click"),
      (4L, ts("2024-01-01 00:01:00"), 2L, "click"),
      (5L, ts("2024-01-01 00:02:00"), 2L, "view"),
      (6L, ts("2024-01-01 00:01:00"), 3L, "view"),
      (7L, ts("2024-01-01 00:02:00"), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Relational.w27MarkovAccuracy(ev)
      .as[(String, Long, String, Long, Double)].collect().toSeq
    // click->view twice (2/2); view splits 1-1 between click and
    // purchase: accuracy 0.5 regardless of the tie, label = MIN
    assert(out == Seq(
      ("click", 2L, "view", 2L, 1.0),
      ("view", 2L, "click", 1L, 0.5)), out)
  }

  test("w26DowProfile: absent days still charge the uniformity chi-square") {
    // 2024-01-07 is a Sunday (dow 0), 01-08 a Monday (dow 1)
    val ev = Seq(
      (1L, ts("2024-01-07 10:00:00"), "a", 1.0),
      (2L, ts("2024-01-07 11:00:00"), "a", 1.0),
      (3L, ts("2024-01-08 10:00:00"), "a", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = Relational.w26DowProfile(ev)
      .as[(String, Long, Long, Double, Int, Long)].collect().toSeq
    val (t0, n, seen, chi2, peakDow, peakC) = out.head
    assert((t0, n, seen, peakDow, peakC) == (("a", 3L, 2L, 0, 2L)), out)
    // e = 3/7: round-6 terms 5.761905 + 0.761905 + 5·0.428571
    assert(math.abs(chi2 - 8.666665) < 1e-9, chi2)
  }

  test("a34KendallTau: perfect concordance is +1; balanced ties cancel to 0") {
    def li(rows: Seq[(Double, Double)]) =
      rows.toDF("l_quantity", "l_extendedprice")
    // strictly rising: every pair concordant
    val up = li(Seq((1.0, 5000.0), (2.0, 15000.0), (3.0, 25000.0)))
    assert(Relational.a34KendallTau(up)
      .as[(Long, Long, Long, Double)].head() == ((3L, 3L, 0L, 1.0)))
    // 2×2 grid: one concordant + one discordant diagonal, x/y tie
    // terms n1 = n2 = 2 -> τ-b = (1−1)/√((6−2)(6−2)) = 0
    val grid = li(Seq((1.0, 5000.0), (1.0, 15000.0),
      (2.0, 5000.0), (2.0, 15000.0)))
    assert(Relational.a34KendallTau(grid)
      .as[(Long, Long, Long, Double)].head() == ((4L, 1L, 1L, 0.0)))
  }
}
