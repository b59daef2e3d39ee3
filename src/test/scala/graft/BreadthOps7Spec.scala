package graft

import java.sql.Timestamp

import graft.operators.{PipelineOps, Relational, TextOps}

/** Constructed-data semantics for the round-8 breadth operators (exact
  * AUC, Poisson-bootstrap CI, retention cohorts, lang-ID kappa,
  * dataset content hash); the DuckDB oracles cover them at data scale,
  * these pin the hand-computable edge cases.
  */
class BreadthOps7Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("a40Auc: perfect separation is 1.0; all-tied scores are 0.5") {
    // positives strictly above negatives -> AUC 1
    val sep = Seq(
      (1.0, "view"), (2.0, "view"), (3.0, "purchase"), (4.0, "purchase"))
      .toDF("value", "event_type")
    val r1 = Relational.a40Auc(sep).as[(Long, Long, Double)].head()
    assert(r1 == ((2L, 2L, 1.0)))
    // one shared value for everything -> tie-average = 0.5 exactly
    val tied = Seq(
      (5.0, "purchase"), (5.0, "view"), (5.0, "purchase"), (5.0, "view"))
      .toDF("value", "event_type")
    val r2 = Relational.a40Auc(tied).as[(Long, Long, Double)].head()
    assert(r2 == ((2L, 2L, 0.5)))
    // hand case: pos {3, 1}, neg {2}. pairs: (3>2)=1, (1<2)=0 -> 0.5
    val mix = Seq((3.0, "purchase"), (1.0, "purchase"), (2.0, "view"))
      .toDF("value", "event_type")
    val r3 = Relational.a40Auc(mix).as[(Long, Long, Double)].head()
    assert(r3 == ((2L, 1L, 0.5)))
  }

  test("a41BootstrapCi: constant values pin every replicate mean and the CI") {
    // every resample of a constant column has the same mean, so the
    // whole bootstrap distribution collapses to the constant and the
    // interpolated CI endpoints equal it exactly
    val ev = (1L to 200L).map(i => (i, "purchase", 42.5))
      .toDF("event_id", "event_type", "value")
    val (nReps, lo, hi) =
      Relational.a41BootstrapCi(ev, b = 16).as[(Long, Double, Double)].head()
    assert(nReps == 16L)
    assert(lo == 42.5 && hi == 42.5)
    // non-purchase rows are excluded from the resampled universe
    val mixed = ev.union(Seq((999L, "view", 1.0e9))
      .toDF("event_id", "event_type", "value"))
    val (_, lo2, hi2) =
      Relational.a41BootstrapCi(mixed, b = 16).as[(Long, Double, Double)].head()
    assert(lo2 == 42.5 && hi2 == 42.5)
  }

  test("w28Retention: cohorts by first week, ages exact, rates per cohort") {
    val ev = Seq(
      // user 1: weeks 0 and 1; user 2: week 0 only -> cohort 0 size 2
      (1L, 1L, "2024-01-02 10:00:00"), (2L, 1L, "2024-01-09 10:00:00"),
      (3L, 2L, "2024-01-03 10:00:00"),
      // user 3 first appears week 2 -> its own cohort, size 1
      (4L, 3L, "2024-01-16 10:00:00"), (5L, 3L, "2024-01-17 10:00:00"))
      .map { case (e, u, t) => (e, u, ts(t), "view", 1.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Relational.w28Retention(ev)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 2L, 1.0), // both cohort-0 users active in week 0
      (0L, 1L, 1L, 2L, 0.5), // only user 1 returns in week 1
      (2L, 0L, 1L, 1L, 1.0))) // user 3's singleton cohort
  }

  test("langIdKappa: perfect marker docs score kappa 1; chance pins to 0 guard") {
    // one unambiguous doc per language -> diagonal confusion, kappa 1
    val docs = Seq(
      (1L, "the a and of is", "en"),
      (2L, "der die und ist das", "de"),
      (3L, "el la y es de", "es"),
      (4L, "le la et est un", "fr"))
      .map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (n, diag, kappa) =
      TextOps.langIdKappa(docs).as[(Long, Long, Double)].head()
    assert(n == 4L && diag == 4L && kappa == 1.0)
    // single class on both axes: pe = 1 -> pinned 0.0, not NaN
    val mono = Seq((1L, "the a and", "en"), (2L, "the of is", "en"))
      .map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (_, _, k2) = TextOps.langIdKappa(mono).as[(Long, Long, Double)].head()
    assert(k2 == 0.0)
  }

  test("datasetHash: order-invariant, content-sensitive, rollup adds up") {
    val rows = Seq(
      (1L, "alpha text", "en", "web", 10L),
      (2L, "beta text", "de", "web", 9L),
      (3L, "gamma text", "en", "books", 10L))
    def df(s: Seq[(Long, String, String, String, Long)]) =
      s.toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = PipelineOps.datasetHash(df(rows))
      .as[(String, Long, String)].collect().toSeq
    val b = PipelineOps.datasetHash(df(rows.reverse))
      .as[(String, Long, String)].collect().toSeq
    assert(a == b, "digest must not depend on row order")
    assert(a.map(_._1) == Seq("__all__", "books", "web"))
    assert(a.find(_._1 == "__all__").get._2 == 3L)
    // the rollup digest is the exact sum of the per-source digests
    val bySrc = a.filter(_._1 != "__all__").map(r => BigInt(r._3)).sum
    assert(BigInt(a.find(_._1 == "__all__").get._3) == bySrc)
    // flipping one character moves the digest
    val c = PipelineOps.datasetHash(df(rows.updated(0,
      (1L, "alpha texT", "en", "web", 10L))))
      .as[(String, Long, String)].collect().toSeq
    assert(c.find(_._1 == "web").get._3 != a.find(_._1 == "web").get._3)
  }
}
