package graft

import graft.operators.TextOps

/** tf-idf keyword extraction + PII masking semantics. */
class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  test("removeBoilerplate drops shared sentences, keeps order, eats all-boiler docs") {
    val docs = Seq(
      (1L, "unique one. SHARED FOOTER. tail one"),
      (2L, "SHARED FOOTER. unique two"),
      (3L, "unique three. SHARED FOOTER"),
      (4L, "pair sentence. solo four"),
      (5L, "pair sentence. solo five"),
      (6L, "SHARED FOOTER")                    // all boilerplate -> vanishes
    ).toDF("doc_id", "text")
    val out = TextOps.removeBoilerplate(docs, 3L)
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "unique one. tail one"),            // order preserved around the cut
      (2L, "unique two"),
      (3L, "unique three"),
      (4L, "pair sentence. solo four"),        // df=2 < 3: kept
      (5L, "pair sentence. solo five")))
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "spark spark spark shuffle the the"),
      (2L, "duck duck pond the"),
      (3L, "pond shuffle the")).toDF("doc_id", "text")
    val rows = TextOps.tfidfTopTerms(docs, 2)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._6).map(_._2).toSeq }
    // 'the' appears in every doc (df=3, idf=0) — never a top term
    assert(rows.values.flatten.toSet.intersect(Set("the")).isEmpty)
    // doc 1's most distinctive term is 'spark' (tf=3, df=1)
    assert(rows(1L).head == "spark")
    // doc 2's is 'duck' (tf=2, df=1)
    assert(rows(2L).head == "duck")
  }

  test("tfidfTopTerms: tf and df counts are exact") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "b c")).toDF("doc_id", "text")
    val byTerm = TextOps.tfidfTopTerms(docs, 3)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byTerm((1L, "a")) == (2L, 1L)) // tf=2 in doc1, df=1
    assert(byTerm((1L, "b")) == (1L, 2L)) // b in both docs
    assert(byTerm((2L, "c")) == (1L, 1L))
  }

  test("repetitionRatio: max token share flags degenerate text, empty docs drop") {
    val docs = Seq(
      (1L, "spam spam spam spam other"),   // 4/5 repetition
      (2L, "all tokens here are unique"),  // 1/5
      (3L, "")).toDF("doc_id", "text")
    val rows = TextOps.repetitionRatio(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 5L, 4L, 0.8), (2L, 5L, 1L, 0.2)), s"got $rows")
  }

  test("oovRatio: occurrences outside the frequency-ranked vocab, ties by token") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d"),
      (3L, "d d")).toDF("doc_id", "text")
    // corpus freqs: a=4, b=3, d=3, c=2 — top-3 by (freq desc, token
    // asc) = {a, b, d}: the b-vs-d tie at 3 keeps both, c falls out
    val got = TextOps.oovRatio(docs, 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 6L, 1L, 1.0 / 6.0), (2L, 4L, 1L, 0.25),
      (3L, 2L, 0L, 0.0)), s"got $got")
  }

  test("bpeTokenCount: GPT-2-ish pieces and ceil(len/4) subword estimate") {
    val docs = Seq(
      (1L, "we've got 42 cats!"),
      (2L, "supercalifragilistic"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.bpeTokenCount(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1 pieces: [we]['ve][ got][ 42][ cats][!] → 6 pieces,
    // estimates 1+1+1+1+2+1 = 7; \S+ sees 4 whitespace tokens
    assert(got == Seq((1L, 4L, 6L, 7L), (2L, 1L, 1L, 5L), (3L, 0L, 0L, 0L)),
      s"got $got")
  }

  test("qualityModelScore: linear score over the measured features, thresholded keep") {
    val docs = Seq(
      (1L, "the cat and the dog of to a and the"), // stop-heavy: keep
      (2L, "!!! ??? ***"),                         // punct-only: drop
      (3L, "one two three")                        // too few tokens: drop
    ).toDF("doc_id", "text")
    // expected = the exact same IEEE chain applied to the feature rows
    val want = TextOps.qualityScore(docs)
      .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "mean_token_len")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map { case (id, nt, p, s, m) =>
        val score = 1.5 * s - p + 0.02 * m
        (id, score, score >= 0.2 && nt >= 5L)
      }.toSeq.sortBy(_._1)
    val got = TextOps.qualityModelScore(docs)
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got == want, s"got $got want $want")
    assert(got.map(r => r._1 -> r._3).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("piiMask scrubs emails and long digit runs, counts them, keeps short numbers") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
      (2L, "card 1234567890123456 pin 1234 serial 999999"),
      (3L, "clean text, nothing to mask")).toDF("doc_id", "text")
    val got = TextOps.piiMask(docs).as[(Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2L) // two emails
    assert(got(1L)._4 == "contact <EMAIL> or <EMAIL> today")
    assert(got(2L)._3 == 2L) // two long digit runs; 'pin 1234' survives
    assert(got(2L)._4 == "card <NUM> pin 1234 serial <NUM>")
    assert(got(3L)._4 == "clean text, nothing to mask")
  }

  test("bm25TopDocs: hand-computed score, rank order, topK cut") {
    // 3 docs, query {x}: doc 1 has tf=2 of 4 tokens, doc 2 tf=1 of 2,
    // doc 3 no hit. N=3, df=2, avgdl=(4+2+3)/3=3.
    val docs = Seq(
      (1L, "x y x z"), (2L, "x w"), (3L, "p q r")).toDF("doc_id", "text")
    val rows = TextOps.bm25TopDocs(docs, Seq("x"), topK = 2)
      .as[(Long, Double, Long)].collect().toSeq
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (9.0 / 3.0)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows.map(_._1) == Seq(1L, 2L)) // doc 3 unscored, not ranked
    assert(rows.map(_._3) == Seq(1L, 2L))
    assert(rows(0)._2 == score(2L, 4L), s"got ${rows(0)._2}")
    assert(rows(1)._2 == score(1L, 2L))
  }

  test("editDistancePairs: blocked candidates only, distance cut honored") {
    val docs = Seq(
      // same 10-char block "aaaa bbbb ", small tail edits
      (1L, "aaaa bbbb cccc dddd", "en"),
      (2L, "aaaa bbbb cccc ddxd", "en"),
      // same block but beyond maxDist for maxDist=2
      (3L, "aaaa bbbb zzzz wwww qqqq", "en"),
      // identical head, different lang -> different block
      (4L, "aaaa bbbb cccc dddd", "de")).toDF("doc_id", "text", "lang")
    val got = graft.operators.DedupOps
      .editDistancePairs(docs, headLen = 19, blockLen = 10, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L)), s"got $got")
  }

  test("bpeTrainMerges: hand-computed merge table, early stop when fully merged") {
    // words: "aab" x3, "ab" x2 -> symbols ' a a b ' f3, ' a b ' f2
    // step 1: pairs (a,a)=3, (a,b)=5 -> merge (a,b) [(a,b) occurs in
    //   both words: 3 + 2 = 5]
    // step 2: ' a ab ' f3, ' ab ' f2 -> pairs (a,ab)=3 -> merge
    // step 3: ' aab ' f3, ' ab ' f2 -> no pairs -> early stop
    val docs = Seq((1L, "aab aab ab", "en", "s", 0L), (2L, "aab ab", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextOps.bpeTrainMerges(docs, 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 5L), (2, "a", "ab", 3L)), s"got $got")
  }

  test("scriptMix counts disjoint BMP ranges; remainder is n_other") {
    val docs = Seq(
      (1L, "abc АБВ 中文 αβ 42!", "xx", "s", 0L),
      (2L, "", "xx", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextOps.scriptMix(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // "abc АБВ 中文 αβ 42!": 3 latin, 3 cyrillic, 2 greek, 2 cjk,
    // 2 digits, 4 spaces, 17 total, 1 other ('!')
    assert(out(1L) == Seq(3L, 3L, 2L, 2L, 2L, 4L, 17L, 1L), out(1L))
    assert(out(2L) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), out(2L))
  }

  test("invertedIndex: bounded postings, (tf desc, doc asc) order, hapax dropped") {
    // "hot" appears in 4 docs (a stopword-ish term), "rare" in 1 (hapax)
    val docs = Seq(
      (1L, "hot hot hot alpha", "en", "s", 0L),
      (2L, "hot alpha alpha", "en", "s", 0L),
      (3L, "hot rare", "en", "s", 0L),
      (4L, "hot", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val idx = graft.operators.TextOps.invertedIndex(docs, p = 3, minDf = 2)
      .as[(String, Long, Int, Long, Long)].collect().toSeq
    // hot: df=4, postings capped at p=3: (doc1 tf3), (doc2 tf1 < doc3
    // tf1 by id), never doc4; alpha: df=2; rare: dropped
    assert(idx == Seq(
      ("alpha", 2L, 1, 2L, 2L), ("alpha", 2L, 2, 1L, 1L),
      ("hot", 4L, 1, 1L, 3L), ("hot", 4L, 2, 2L, 1L),
      ("hot", 4L, 3, 3L, 1L)), idx)
  }

  test("sentenceStats: terminator runs, trimming, zero-sentence pin") {
    val docs = Seq(
      (1L, "One two. Three!! Four five six?", "en", "s", 0L),
      (2L, "...", "en", "s", 0L), // only terminators: zero sentences
      (3L, "no terminator at all", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextOps.sentenceStats(docs)
      .as[(Long, Long, Double, Long)].collect().toSeq
    // doc1: "One two"(7), "Three"(5), "Four five six"(13) -> avg 25/3
    assert(got == Seq(
      (1L, 3L, 8.333333, 13L),
      (2L, 0L, 0.0, 0L),
      (3L, 1L, 20.0, 20L)), got)
  }

  test("rakeKeywords: degree/frequency scores favor multi-word phrases") {
    // corpus: "fox" occurs in a 3-word phrase (deg 3) and alone
    // (deg 1) -> freq 2, deg 4, score 2; quick/brown keep 3/1 = 3
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "fox")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.rakeKeywords(docs)
      .as[(Long, String, Double)].collect().toSeq
    // doc1: "quick brown fox" = 3+3+2 = 8 beats "lazy dog" = 2+2 = 4
    assert(got == Seq((1L, "quick brown fox", 8.0), (2L, "fox", 2.0)), got)
    // all-stopword doc contributes no phrase row
    val stopOnly = Seq((9L, "the and of to")).toDF("doc_id", "text")
    assert(graft.operators.TextOps.rakeKeywords(stopOnly).isEmpty)
  }
}
