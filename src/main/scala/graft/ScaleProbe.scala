package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 10× scale probe — the first datapoint behind every
  * "would survive 100×" claim in this repo. Synthesizes an
  * sf1-equivalent corpus locally (union of `mult` id-offset copies of
  * sf0.1's `documents`/`events`/`embeddings`), runs the expensive
  * pair-graph / banded-dedup / bucketed-ANN / window paths at BOTH
  * scales, and reports per-query runtime ratios. The check is shape,
  * not an oracle: the banded/bucketed paths should scale ~linearly
  * (ratio ≈ mult, modulo fixed overheads that amortize) and nothing
  * may OOM or stall the driver.
  *
  * Duplication honesty: a naive 10× union makes every doc a 10-way
  * exact dup, which inflates the near-dup pair graph QUADRATICALLY by
  * data semantics (true dup cliques), not by plan shape — so document
  * copies get a per-copy vowel permutation (`translate`), which
  * destroys cross-copy shingle similarity while preserving length,
  * token structure, and within-copy near-dup relationships: the
  * scaled corpus models "10× more distinct docs at the same dup
  * rate". Embedding copies stay identical (10-deep LSH buckets —
  * near-dup-shaped, linear in the banded join); event copies offset
  * user_id, modeling user-count growth at constant per-user activity.
  *
  * Usage: `runMain graft.ScaleProbe [srcDir]` (default sf0.1);
  * `SPARK_GRAFT_SCALE` overrides the multiplier, `SPARK_GRAFT_ONLY`
  * narrows the query set. One JSON line to stdout + SCALE_PROBE.json.
  */
object ScaleProbe {

  /** Probe set: every ≥1 s bench query whose 100 TB story is "banded /
    * bucketed / keyed", PLUS (r13) the exact-twin dedup family and the
    * quantized brute-force ranker, whose scale claims were argued in
    * scaladoc but unmeasured: the vowel-permuted document copies keep
    * near-dup DENSITY rate-constant (distinct shingle vocabulary grows
    * ~linearly, per-shingle df stays at the original distribution), so
    * 10× probes each twin's candidate-generation shape, not dup-clique
    * semantics. The measurable crossover claim
    * (`DedupOps.ngramJaccardPrefix`): the prefix twin's fixed df/sort
    * stages amortize while all-pairs bucket counting grows with
    * Σ C(df,2) mass — its 10× ratio should BEAT the all-pairs twin's.
    * `sim_int8_topk` is the deliberate outlier: its serve batch (the
    * query side) is staged 10× along with the corpus, so pair work
    * grows ~100× — the probe verifies the broadcast+heap SHAPE absorbs
    * that without a window/sort exchange; production growth is linear
    * (corpus only) because a serve batch is request-sized, not
    * data-sized. Streaming twins carry fixed micro-batch overhead that
    * drowns a ratio here — they get their own state-store probe mode
    * (`SPARK_GRAFT_STREAMPROBE`) instead.
    */
  val DefaultQueries: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_components", "dedup_survivors", "dedup_triangles",
    "dedup_clique_density", "dedup_pagerank", "sim_neardup_lsh",
    "sim_lsh_topk", "sim_ivf_topk", "sim_quantize_int8",
    "text_tfidf", "text_tokens", "w1_running_sum", "w4_sessionize",
    // round-6 additions: span-keyed first-owner dedup, the MG sketch
    // two-pass, and the broadcast-model LM scorer
    "dedup_span_exact", "a13_heavy_hitters", "text_unigram_lm",
    // breadth-wave additions: bounded-round community vote, the d²-cell
    // covariance aggregate, the shared-exchange rank windows, and the
    // distinct-value CDF comparison
    "dedup_lpa", "sim_covariance", "w19_percent_rank", "a24_ks_test",
    // round-7 rework set: the bounded-broadcast bigram LM, the
    // min-owner novelty (skew guard), the pair-repartitioned
    // containment counter, and the sample-stratum recall census
    // (the census variant that is ALLOWED at scale — the full
    // all-pairs census stays out by design)
    "text_bigram_lm", "text_novelty", "dedup_containment",
    "dedup_lsh_recall_sampled",
    // round-7 additions: the LPA-derived community censuses, the
    // wedge-join link predictor + edge-peel truss on the basket
    // graph (lineitem now staged as disjoint id-offset copies), the
    // component-hashed split, ER attribute fusion, and the RAKE
    // word-stat join
    "dedup_modularity", "dedup_community_edges", "graph_link_predict",
    "graph_ktruss", "pipe_split_leakage_safe", "er_golden_record",
    "text_keywords",
    // round-9 additions: the multi-source BFS ball + the component
    // eccentricity BFS (both seed-bounded frontier chains), the
    // cascade's three-scheme anti-joins, the candidate-bounded
    // weighted-Jaccard verify, and the dim-pruned re-ranking pass
    "graph_bfs_ball", "dedup_component_ecc", "dedup_cascade",
    "dedup_weighted_jaccard", "sim_dim_prune",
    // round-11 additions: the customer/user-grain rank family that
    // replaced the single-partition dimension windows in r10 — the
    // two-pass range-exchange rank must scale like the exchange
    // family (~mult), where the one-task sort it replaced would
    // concentrate the scaled grain on one core
    "a35_rfm_segments", "a39_pareto_share", "a60_lorenz",
    // round-13 additions: the exact-twin shingle-Jaccard pair and the
    // quantized ranker were the last >1 s bench entries with no probe
    // row — all-pairs in-bucket counting vs PPJoin prefix blocking,
    // probed to MEASURE the crossover claim, and the persisted-index
    // int8 serve (batch staged 10× too; see the probe-set scaladoc for
    // why its ratio reads ~100× work, not 10×). The (lang, head)
    // blocked Levenshtein verifier benches sub-second but rides along
    // as the ER-verifier family's blocked-equi-join representative
    // (block-size invariance under corpus growth is ITS scale claim)
    "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_edit_distance",
    "sim_int8_topk")

  // distinct vowel permutations, identity first (copy 0 = the original)
  private val VowelPerms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "eaoiu", "aoiue", "oiuea", "iueao", "ueaoi")

  private val IdOffset = 100000000L

  /** `sim_neardup_lsh`'s registry threshold (SparkEntry) — the
    * skewed-bucket staging calibrates its noise magnitude and its
    * stage-time pair census against it.
    */
  private val NearDupThreshold = 0.463

  /** Per-subset suffix for narrowed (SPARK_GRAFT_ONLY) artifact files
    * — one debug run must not clobber another subset's committed
    * evidence; long subsets keep a readable prefix + a hash.
    */
  private[graft] def onlyFileSuffix(names: Seq[String]): String = {
    val ids = names.sorted.mkString("_")
    "_ONLY_" + (if (ids.length <= 60) ids
      else ids.take(52) + "_" + Integer.toHexString(ids.hashCode))
  }

  /** Every evidence value for `field` carried by one prior artifact
    * entry: the headline number plus any recorded 2-element band's
    * endpoints. Malformed or absent fields contribute nothing.
    */
  private[graft] def evidencePoints(
      entry: com.fasterxml.jackson.databind.JsonNode,
      field: String): Seq[Double] = {
    val head = Option(entry.get(field)).filter(_.isNumber)
      .map(_.asDouble()).toList
    val band = Option(entry.get("band"))
      .flatMap(b => Option(b.get(field))).toList.flatMap {
        case a: com.fasterxml.jackson.databind.node.ArrayNode
            if a.size == 2 =>
          List(a.get(0).asDouble(), a.get(1).asDouble())
        case _ => Nil
      }
    head ++ band
  }

  /** Merge a query's prior artifact entries with this run's
    * measurement into a `"band"` JSON fragment (leading comma
    * included), or `""` when there is no prior evidence — a single
    * point is not a band, so first sightings stay bare and the band
    * SELF-SEEDS on the second run. The band is the floor/ceil-3dp
    * hull of every recorded value (headlines + old band endpoints,
    * across the full-suite artifact AND the per-subset narrowed-run
    * files), so committed evidence can only widen it, never shrink
    * it, and an out-of-band isolated rerun governs the full-suite
    * band on the next refresh. The first prior band node's curated
    * `note` (callers order the output file's own entry first) rides
    * along untouched; `warn` fires whenever the hull extends past a
    * previously recorded band, because that note may now quote stale
    * endpoints.
    */
  private[graft] def bandFragment(
      prior: Seq[com.fasterxml.jackson.databind.JsonNode],
      scaled: Double, ratio: Double, warn: String => Unit): String = {
    if (prior.isEmpty) return ""
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val base: ObjectNode = prior.iterator
      .flatMap(e => Option(e.get("band")))
      .collectFirst { case o: ObjectNode => o.deepCopy(): ObjectNode }
      .getOrElse(mapper.createObjectNode())
    def hull(field: String, nv: Double): Unit = {
      val pts = prior.flatMap(evidencePoints(_, field)) :+ nv
      val lo = math.floor(pts.min * 1000) / 1000
      val hi = math.ceil(pts.max * 1000) / 1000
      Option(base.get(field)).foreach {
        case a: ArrayNode if a.size == 2 =>
          val (olo, ohi) = (a.get(0).asDouble(), a.get(1).asDouble())
          if (lo < olo || hi > ohi) warn(String.format(
            java.util.Locale.ROOT,
            "band widened: %s [%.3f, %.3f] -> [%.3f, %.3f] — refresh " +
              "the curated note if it quotes the old endpoints",
            field, Double.box(olo), Double.box(ohi),
            Double.box(lo), Double.box(hi)))
        case _ => ()
      }
      val arr = base.putArray(field)
      arr.add(lo); arr.add(hi)
      ()
    }
    hull("scaled", scaled); hull("ratio", ratio)
    s""","band":${mapper.writeValueAsString(base)}"""
  }

  /** Per-query prior artifact entries for [[bandFragment]], gathered
    * from every evidence file of one probe mode in cwd: the file
    * being rewritten FIRST (its curated band note wins), then the
    * committed full-suite artifact, then every per-subset
    * `<prefix>_ONLY_*.json` in name order. A file whose recorded
    * `mult` or `src` differs from this run's is NOT evidence — a
    * quick `SPARK_GRAFT_SCALE=3` or sf0.01 debug run must never
    * pollute the 10×/sf0.1 hulls (bands only ever widen, so one bad
    * merge would corrupt the committed floor forever). Unreadable or
    * malformed files warn and contribute nothing.
    */
  private[graft] def priorArtifactEntries(outFile: String,
      prefix: String, dir: String = ".", mult: Option[Int] = None,
      src: Option[String] = None): Map[String,
        Seq[com.fasterxml.jackson.databind.JsonNode]] = {
    val onlyFiles = Option(new java.io.File(dir).listFiles()).toSeq
      .flatten.map(_.getName)
      .filter(n => n.startsWith(prefix + "_ONLY_") && n.endsWith(".json"))
      .sorted
    val files = (Seq(outFile, prefix + ".json") ++ onlyFiles).distinct
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val entries = files.flatMap { fn =>
      val f = java.nio.file.Paths.get(dir, fn)
      if (!java.nio.file.Files.isReadable(f)) Nil
      else try {
        val root = mapper.readTree(java.nio.file.Files.readString(f))
        val multOk = mult.forall(m =>
          Option(root.get("mult")).exists(_.asInt(-1) == m))
        val srcOk = src.forall(s =>
          Option(root.get("src")).exists(_.asText("") == s))
        if (!multOk || !srcOk) {
          System.err.println(s"[scale] note: $fn records a different " +
            "mult/src — not evidence for this run's bands")
          Nil
        } else {
          val qn = root.get("queries")
          if (qn == null) Nil
          else {
            import scala.jdk.CollectionConverters._
            qn.properties().asScala.toList.map(e => e.getKey -> e.getValue)
          }
        }
      } catch {
        case scala.util.control.NonFatal(ex) =>
          System.err.println(s"[scale] WARNING: could not parse $fn — " +
            s"its band evidence is skipped this refresh: $ex")
          Nil
      }
    }
    entries.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** The hub-guarded basket operators — the probe set under
    * hub-growth staging. Round-10 additions: `graph_bfs_ball` rides
    * [[graft.SparkEntry.BasketGraph]], so shared part keys densify
    * every frontier hop it expands — exactly the adversarial axis for
    * a BFS (ball sizes grow with hub degree, and the probe verifies
    * the eager per-hop truncation keeps that bounded);
    * `dedup_component_ecc` rides the DOCUMENT pair graph, whose
    * staging is mode-invariant (vowel-translated disjoint copies in
    * both modes — duplicate-mass densification of the doc graph would
    * measure LSH's true quadratic pair mass, not a guard), so its hub
    * row exists to carry the ratio in the hub artifact and matches
    * the uniform probe by construction.
    */
  val HubGrowthQueries: Seq[String] =
    Seq("graph_link_predict", "graph_ktruss", "j11_assoc_rules",
      "graph_bfs_ball", "dedup_component_ecc")

  /** The LSH-family probe set under skewed-bucket staging
    * (`SPARK_GRAFT_LSHSKEW=1` → `SCALE_PROBE_LSH.json`). The uniform
    * and hub stagings never concentrate embedding mass, so the LSH
    * operators' adversarial axis — ONE hot bucket far deeper than the
    * occupancy the plane ladder was sized for — went unmeasured
    * through r11. This mode stages a `mult`×-uniform corpus twin
    * where 5% of the copied rows are redirected into a single
    * table-0 bucket (~12× the average 8-plane bucket depth), with
    * every hot pair BELOW the near-dup threshold, and reports
    * skew/uniform ratios at IDENTICAL corpus size — the marginal
    * cost of the hot bucket alone. What must shed it:
    * `sim_lsh_topk` — candidates grow linearly in bucket depth (per
    * query sharing the bucket), and the bounded TopKAgg heap ranks
    * the flood without a window/sort exchange; `sim_neardup_lsh` —
    * verify-before-distinct kills each false candidate with one
    * codegen'd O(dim) dot, so the wide distinct only ever sees true
    * survivors; `sim_multiprobe_topk` — the most exposed shape (its
    * numPlanes+1 Hamming-1 probes hit the hot bucket from every
    * adjacent bucket's query too), bounded by the same linear
    * candidate growth + TopKAgg heap as single-probe.
    */
  val LshSkewQueries: Seq[String] =
    Seq("sim_lsh_topk", "sim_multiprobe_topk", "sim_neardup_lsh")

  /** The streaming state-store probe set (`SPARK_GRAFT_STREAMPROBE=1`
    * → `SCALE_PROBE_STREAM.json`): the two state-shape extremes among
    * the bounded replays. `stream_dedup` keeps ONE state row per
    * event_id ever seen (the replay watermark never evicts), so state
    * grows with the corpus — the shape RocksDB exists for (heap-held
    * HDFS-provider state becomes an executor-memory ceiling at 100 TB;
    * RocksDB bounds it by local disk with changelog checkpoints).
    * `stream_topk` holds k heap pairs per (window, event_type) group —
    * state bounded by the window GRAIN, invariant to corpus growth.
    * Each runs at sf0.1 and at the 10× uniform staging under BOTH
    * providers; the probe records wall time, the max state-row /
    * state-memory census from the progress stream, and asserts the
    * provider swap changes no result. Artifact entries are keyed
    * `<query>_<provider>` so the band machinery covers them
    * unchanged.
    */
  val StreamProbeQueries: Seq[String] = Seq("stream_dedup", "stream_topk")

  /** The exact-twin Jaccard probe set under boilerplate-flood staging
    * (`SPARK_GRAFT_BOILERPLATE=1` → `SCALE_PROBE_BOILER.json`). The
    * uniform staging holds per-shingle df CONSTANT (vowel permutation
    * makes the copies' vocabularies disjoint), so Σ C(df,2) grows
    * linearly and the all-pairs twin never explodes — measured r13 at
    * 10×: `dedup_ngram_jaccard` ratio ~1.5 vs `dedup_jaccard_prefix`
    * ~2.5; the prefix twin's fixed df/sort/verify stages amortize but
    * all-pairs stays cheaper under rate-constant df, exactly as its
    * crossover note predicts for this regime. The crossover claim
    * ([[graft.operators.DedupOps.ngramJaccardPrefix]]) is about the
    * OTHER regime — high-df boilerplate whose bucket pair mass grows
    * C(df,2) while contributing no near-dup pairs — so this mode
    * stages it adversarially (see [[stageBoiler]]) and reports
    * boiler/base ratios at identical corpus size: the marginal cost
    * of the flood alone. Expected shape, now measurable: all-pairs
    * pays ~18·C(hot,2) extra bucket-pair rows; prefix blocking's
    * rarest-first order keeps boilerplate shingles out of every
    * prefix, so its candidate set does not grow at all.
    */
  val BoilerQueries: Seq[String] =
    Seq("dedup_ngram_jaccard", "dedup_jaccard_prefix")

  /** The vowel-permuted, id-offset document copies — THE uniform
    * document scaling rule, single-sourced so every staging mode
    * (uniform, hub, boilerplate base twin) builds the identical
    * corpus shape the cross-mode comparisons depend on.
    */
  private def docCopies(spark: SparkSession, src: String,
      mult: Int): DataFrame = {
    require(mult <= VowelPerms.size,
      s"at most ${VowelPerms.size} copies supported (one vowel perm each)")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until mult).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * IdOffset))
        .withColumn("text",
          if (k == 0) col("text")
          else translate(col("text"), "aeiou", VowelPerms(k)))
    }.reduce(_ unionByName _)
  }

  /** Crash-safe staging publish shared by every mode: no-op when the
    * published dir exists; otherwise sweep a partial `.tmp` left by a
    * killed probe (its leftovers would make every later write.parquet
    * fail with 'path already exists'), run `build` into it, and
    * rename atomically — the rename is what makes staging durable.
    */
  private def publishStaged(dir: String)(
      build: java.io.File => Unit): Unit = {
    val published = new java.io.File(dir)
    if (published.exists()) return
    val tmp = new java.io.File(dir + ".tmp")
    if (tmp.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp.toPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }
    build(tmp)
    if (!tmp.renameTo(published) && !published.exists())
      sys.error(s"ScaleProbe: could not publish $tmp -> $published")
    ()
  }

  private def stage(spark: SparkSession, src: String, dir: String,
      mult: Int, hubGrowth: Boolean): Unit = publishStaged(dir) { tmp =>
    val events = Tables(spark, src, "events")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    def copies(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(k => f(base, k)).reduce(_ unionByName _)
    docCopies(spark, src, mult).write.parquet(s"$tmp/documents.parquet")
    copies(events) { (e, k) =>
      e.withColumn("event_id", col("event_id") + lit(k * IdOffset))
        .withColumn("user_id", col("user_id") + lit(k * IdOffset))
    }.write.parquet(s"$tmp/events.parquet")
    copies(emb) { (e, k) =>
      e.withColumn("vec_id", col("vec_id") + lit(k * IdOffset))
    }.write.parquet(s"$tmp/embeddings.parquet")
    // basket-graph inputs, two deliberately different scalings:
    //  - default: order AND part keys offset per copy → `mult` disjoint
    //    basket graphs — "10× more orders over 10× more parts at the
    //    same basket density", linear edge growth. This is the SCALE
    //    test, but it holds per-part degree constant, so it can never
    //    expose a hub-growth failure.
    //  - hubGrowth: only order keys offset → the same parts appear in
    //    `mult`× more orders, so every part's co-order degree grows
    //    ~`mult`× (quadratic candidate blowup by data semantics). This
    //    is NOT a throughput test — it's the adversarial staging that
    //    verifies the hub GUARDS (the degree-64 wedge-center cap, the
    //    adjSlicesFor ladder) actually engage and keep the operators
    //    bounded instead of minting d² work per hub.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    copies(li) { (l, k) =>
      val o = l.withColumn("l_orderkey", col("l_orderkey") + lit(k * IdOffset))
      if (hubGrowth) o
      else o.withColumn("l_partkey", col("l_partkey") + lit(k * IdOffset))
    }.write.parquet(s"$tmp/lineitem.parquet")
    // orders: order AND customer keys offset per copy — "mult× more
    // customers at the same per-customer order profile", the scale
    // axis of the customer-grain rank family (a35/a60): the ranked
    // grain itself grows mult×, which is exactly what the replaced
    // one-task sort could not absorb. Hub mode skips it (no query in
    // HubGrowthQueries reads orders — staging it would be dead I/O).
    if (!hubGrowth) {
      val ord = spark.read.parquet(s"$src/orders.parquet")
      copies(ord) { (o, k) =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(k * IdOffset))
          .withColumn("o_custkey", col("o_custkey") + lit(k * IdOffset))
      }.write.parquet(s"$tmp/orders.parquet")
    }
  }

  /** Skewed-bucket LSH staging: writes `dir/base/embeddings.parquet`
    * (`mult`× id-offset copies, identical to the uniform staging) and
    * `dir/skew/embeddings.parquet` (same row count, but every copy
    * k≥1 of originals with vec_id % 20 == 3 — 5% of the copied mass —
    * is REPLACED by `seed + w`, where seed is a query vector and w is
    * deterministic noise orthogonal to hyperplanes 0–7 AND to the
    * seed, at 2.2× the seed's norm). Orthogonality to the table-0
    * planes pins the replaced rows to the seed's 8-bit bucket EXACTLY
    * (dot(w, h_i) is a ~1e-12 projection residual against sign
    * margins ≥ 5% of the seed norm — float parquet rounding cannot
    * flip a bit, asserted per row at stage time); orthogonality to
    * the seed makes cos(seed, hot) = 1/√(1+2.2²) ≈ 0.41 < 0.463
    * exactly (asserted per row). Hot–hot pair cosines are
    * (1 + 2.2²·cos(w_i,w_j))/(1+2.2²) — concentrated near 0.17, but
    * the random-direction tail puts a FEW hundredths of the ~400k
    * pairs above the near-dup threshold (no deterministic noise
    * family of this size can cap the max pairwise coherence in a
    * 55-dim complement), so the staging CENSUSES the bucket's FULL
    * occupancy at stage time — the hot rows PLUS the seed's own
    * identical copies and every natural resident whose table-0
    * signature matches (r13: previously hot–hot pairs only, which
    * asserted less than the doc claimed), weighting each original by
    * its surviving copy count and counting identical-copy cliques as
    * true pairs — prints the true-pair fraction, and asserts it
    * stays under 2%: the hot bucket is ≥98% false-candidate mass the
    * verify stage must shed, plus a small measured true-pair
    * remainder it must carry. Planes 8–63 see the full noise, so the
    * other 7 banded tables keep uniform occupancy. Driver-side
    * generation is a principled fixture write, LINEAR in the corpus
    * ((mult−1)·N/20 rows × 64 floats + an O(bucket²·dim) pair census
    * over ~1k bucket rows) — fine at probe scales, not a pattern for
    * data-scale inputs.
    */
  private def stageLshSkew(spark: SparkSession, src: String, dir: String,
      mult: Int): Unit = publishStaged(dir) { tmp =>
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    def copies(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(k => f(base, k)).reduce(_ unionByName _)
    def offset(e: DataFrame, k: Int): DataFrame =
      e.withColumn("vec_id", col("vec_id") + lit(k * IdOffset))
    copies(emb)(offset).write.parquet(s"$tmp/base/embeddings.parquet")
    // ---- driver-side hot-bucket construction --------------------------
    // the authoritative plane derivation — never a private re-copy
    def plane(j: Int): Array[Double] = Array.tabulate(64)(d =>
      graft.functions.HyperplaneSignature.planeValue(j, d))
    val planes = Array.tabulate(8)(plane)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    // seed = the first query vector (vec_id % 25 == 0) whose table-0
    // sign margins are all ≥ 5% of its norm (rounding safety)
    val seedCands = emb.filter(col("vec_id") % 25 === 0)
      .orderBy("vec_id").select("vec_id", "embedding").limit(40).collect()
    val (seedId, seed) = seedCands.iterator.map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }.find { case (_, v) =>
      val n = norm(v); planes.forall(h => math.abs(dot(v, h)) > 0.05 * n)
    }.getOrElse(sys.error("lsh-skew: no seed with safe sign margins " +
      "in the first 40 query vectors"))
    val seedBits = planes.map(h => dot(seed, h) > 0.0)
    // orthonormal basis of span(h0..h7, seed) (modified Gram-Schmidt):
    // noise orthogonal to the PLANES pins the bucket; orthogonal to
    // the SEED it also fixes cos(seed, seed+w) at exactly
    // 1/sqrt(1+scale^2) — without the seed in the basis the noise
    // keeps a random seed-component and ~28% of hot rows land ABOVE
    // the near-dup threshold vs the seed (measured before the r12
    // review fix)
    val q = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    (planes :+ seed).foreach { h =>
      val v = h.clone()
      q.foreach { u => val c = dot(v, u); var i = 0
        while (i < 64) { v(i) -= c * u(i); i += 1 } }
      val n = norm(v)
      require(n > 1e-9, "degenerate plane family")
      q += v.map(_ / n)
    }
    val hot = emb.filter(col("vec_id") % 20 === 3)
      .select("vec_id", "label").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))) // (vec_id, label)
    val seedNorm = norm(seed)
    val hotRows = for {
      k <- 1 until mult
      (o, label) <- hot
    } yield {
      val rnd = new java.util.Random(o * 1000003L + k)
      val r = Array.fill(64)(rnd.nextDouble() * 2.0 - 1.0)
      q.foreach { u => val c = dot(r, u); var i = 0
        while (i < 64) { r(i) -= c * u(i); i += 1 } }
      val rn = norm(r)
      require(rn > 1e-9, s"lsh-skew: degenerate noise for ($o, $k)")
      val scale = 2.2 * seedNorm / rn
      val vF = Array.tabulate(64)(i => (seed(i) + scale * r(i)).toFloat)
      // float-rounded vector must still sit in the seed's bucket and
      // stay a sub-threshold (false) candidate vs the seed
      val vD = vF.map(_.toDouble)
      planes.zip(seedBits).foreach { case (h, b) =>
        require((dot(vD, h) > 0.0) == b,
          s"lsh-skew: bucket bit flipped for ($o, $k)") }
      require(dot(vD, seed) / (norm(vD) * seedNorm) < NearDupThreshold,
        s"lsh-skew: hot row ($o, $k) is a true near-dup of the seed")
      (o + k * IdOffset, vF, label)
    }
    // full-bucket pair census: the synthetic hot rows are NOT the
    // bucket's only occupants — the seed's own identical copies (true
    // near-dups at cos=1) and every NATURAL resident whose table-0
    // signature already equals the seed's (each staged as up-to-`mult`
    // identical copies) share it. The ≥98%-false-mass claim is about
    // the bucket the verify stage drains, so the census covers its
    // FULL occupancy: weighted items (vector, surviving-copy count),
    // identical-copy cliques within one original counted as C(w,2)
    // true pairs. The noise directions are random, so a small hot-hot
    // tail is genuinely above the threshold too — measure all of it
    // and fail loudly if the bucket stops being mostly-false mass.
    val residents = emb.select("vec_id", "embedding").collect().iterator
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter { case (_, v) =>
        planes.zip(seedBits).forall { case (h, b) => (dot(v, h) > 0.0) == b }
      }.toArray
    // copy 0 always survives; copies k>=1 survive unless redirected
    // into the hot set (vec_id % 20 == 3)
    val items: Array[(Array[Double], Long)] =
      residents.map { case (vid, v) =>
        (v, 1L + (if (vid % 20 != 3) (mult - 1).toLong else 0L))
      } ++ hotRows.map(hr => (hr._2.map(_.toDouble), 1L))
    val itemNorms = items.map(it => norm(it._1))
    var truePairs = 0L
    var allPairs = 0L
    var i = 0
    while (i < items.length) {
      val wi = items(i)._2
      truePairs += wi * (wi - 1) / 2 // identical copies: cos = 1
      allPairs += wi * (wi - 1) / 2
      var j2 = i + 1
      while (j2 < items.length) {
        val w = wi * items(j2)._2
        allPairs += w
        if (dot(items(i)._1, items(j2)._1) /
            (itemNorms(i) * itemNorms(j2)) >= NearDupThreshold)
          truePairs += w
        j2 += 1
      }
      i += 1
    }
    require(allPairs == 0 || truePairs.toDouble / allPairs < 0.02,
      s"lsh-skew: $truePairs/$allPairs bucket pairs above threshold — " +
        "the hot bucket is no longer mostly false-candidate mass")
    import spark.implicits._
    val hotDf = hotRows.toSeq.toDF("vec_id", "embedding", "label")
    val keep = copies(emb) { (e, k) =>
      if (k == 0) offset(e, k)
      else offset(e.filter(col("vec_id") % 20 =!= 3), k)
    }
    keep.unionByName(hotDf.select(col("vec_id"),
        col("embedding").cast("array<float>"), col("label")))
      .write.parquet(s"$tmp/skew/embeddings.parquet")
    System.err.println(s"[scale] lsh-skew: seed vec_id=$seedId, " +
      s"${hotRows.size} hot rows pinned to its table-0 bucket " +
      s"alongside ${residents.length} natural-resident originals " +
      s"(${items.map(_._2).sum - hotRows.size} rows incl. the seed's " +
      s"identical copies); full-bucket census: $truePairs/$allPairs " +
      "pairs above threshold (true-pair remainder the verify stage " +
      "carries)")
  }

  /** The shared boilerplate sentence: 20 synthetic tokens no natural
    * document contains (18 pure-boilerplate trigram shingles shared
    * corpus-wide; the 2 boundary shingles mix in each doc's tail and
    * stay low-df).
    */
  private[graft] val BoilerTokens: String =
    (0 until 20).map(i => s"bpq$i").mkString(" ")

  /** Boilerplate-flood staging: `dir/base/documents.parquet` = the
    * uniform `mult`× vowel-permuted staging; `dir/boiler` = the SAME
    * rows with [[BoilerTokens]] appended to hot docs — original
    * doc_id % 16 == 3 AND ≥50 whitespace tokens. The append happens
    * AFTER the per-copy vowel permutation, so the boilerplate
    * shingles are shared across every copy: their df is the full hot
    * count (~6% of the staged corpus), the all-pairs bucket regime
    * the prefix filter exists for. The ≥50-token floor makes the
    * flood pure candidate mass by construction: two hot docs share
    * exactly the 18 pure-boilerplate shingles (cross-copy natural
    * vocabularies are disjoint; within-copy overlap only shrinks
    * J's complement slack), so J ≤ 18/(2·48 − 18) ≈ 0.23 < 0.3 — the
    * conservative bound even BEFORE counting the appended tokens in
    * the denominators — below both registry thresholds (0.3 all-pairs,
    * 0.7 prefix). The invariant that bound needs — ≥48 DISTINCT
    * shingles per hot doc under the real tokenizer, not a raw token
    * count — is ASSERTED at stage time over the hot set, not argued
    * (r12 lesson: geometric staging claims need stage-time asserts).
    */
  private def stageBoiler(spark: SparkSession, src: String, dir: String,
      mult: Int): Unit = publishStaged(dir) { tmp =>
    // the base twin IS the uniform document staging (single-sourced in
    // docCopies — the crossover comparison depends on that identity)
    docCopies(spark, src, mult).write.parquet(s"$tmp/base/documents.parquet")
    val base = spark.read.parquet(s"$tmp/base/documents.parquet")
    val hot = pmod(col("doc_id"), lit(IdOffset)) % 16 === 3 &&
      size(split(col("text"), "\\s+")) >= 50
    base.withColumn("text",
        when(hot, concat(col("text"), lit(" " + BoilerTokens)))
          .otherwise(col("text")))
      .write.parquet(s"$tmp/boiler/documents.parquet")
    // stage-time census + assert, on the invariant the J<=0.23 bound
    // actually needs: every hot doc must keep >=48 DISTINCT natural
    // trigram shingles UNDER THE REAL TOKENIZER (the >=50-token hot
    // predicate is only the selector — a repetitive 50-token doc
    // could carry a handful of distinct shingles and turn the flood
    // into true pairs while a token-count assert stays green)
    val hotCnt = base.filter(hot).count()
    require(hotCnt > 0, "boiler staging: hot set is empty")
    val minShingles = graft.operators.DedupOps
      .shingleRows(base.filter(hot))
      .agg(min(col("n"))).first().getInt(0)
    require(minShingles >= 48,
      s"boiler staging: a hot doc has only $minShingles distinct " +
        "shingles — the sub-threshold bound J <= 18/(2*48-18) no " +
        "longer holds and the flood would mint true pairs")
    System.err.println(s"[scale] boiler: $hotCnt hot docs (min " +
      s"$minShingles distinct natural shingles) carry the shared " +
      s"20-token sentence -> 18 shingles at df=$hotCnt, " +
      s"~${18L * hotCnt * (hotCnt - 1) / 2} all-pairs bucket-pair " +
      "rows of pure candidate mass")
  }

  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** Execute the streaming state-store probe: every
    * [[StreamProbeQueries]] replay at both scales under both state
    * providers (min-of-2 interleaved passes, like the batch modes),
    * with a [[org.apache.spark.sql.streaming.StreamingQueryListener]]
    * censusing state rows / memory across micro-batches. Returns one
    * artifact row per `<query>_<provider>`, carrying the SCALED run's
    * peak state census as extra JSON fields — the number that must
    * stay bounded at 100 TB. Row counts are asserted identical across
    * providers and passes at each scale (the provider swap is a pure
    * storage change; a result drift would invalidate the probe).
    */
  private def streamProbeRows(spark: SparkSession, baseDir: String,
      scaledDir: String,
      names: Seq[String]): Seq[(String, Double, Double, Double, String)] = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    final class Census extends StreamingQueryListener {
      @volatile var stateRows = 0L
      @volatile var stateMem = 0L
      @volatile var seen = 0L
      def reset(): Unit = { stateRows = 0L; stateMem = 0L; seen = 0L }
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          val r = ops.map(_.numRowsTotal).sum
          // the HDFS provider reports heap bytes in memoryUsedBytes;
          // RocksDB reports its block-cache/memtable footprint in a
          // custom metric — take whichever the provider populates
          val m = ops.map { so =>
            val rocks = Option(so.customMetrics)
              .flatMap(cm => Option(cm.get("rocksdbTotalMemoryUsage")))
              .map(_.longValue()).getOrElse(0L)
            math.max(so.memoryUsedBytes, rocks)
          }.sum
          stateRows = math.max(stateRows, r)
          stateMem = math.max(stateMem, m)
        }
        seen += 1
      }
    }
    val census = new Census
    spark.streams.addListener(census)
    try {
      // (wall s, result rows, peak state rows, peak state bytes)
      def run(name: String, d: String,
          rocks: Boolean): (Double, Long, Long, Long) = {
        census.reset()
        val t0 = System.nanoTime()
        val cnt =
          if (rocks) graft.streaming.StreamingSync.withRocksDbState(spark)(
            SparkEntry.queries(name)(spark, d).count())
          else SparkEntry.queries(name)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // progress events ride an async bus: settle until the census
        // stops moving (bounded wait)
        var last = -1L; var spins = 0
        while (census.seen != last && spins < 40) {
          last = census.seen; Thread.sleep(250); spins += 1
        }
        (dt, cnt, census.stateRows, census.stateMem)
      }
      val providers = Seq("hdfs" -> false, "rocksdb" -> true)
      // untimed warm-up per (query, dir): pays the one-off shard
      // staging + codegen, exactly like the batch modes' warm pass
      names.foreach { n => run(n, baseDir, rocks = false)
        run(n, scaledDir, rocks = false); () }
      val samples = scala.collection.mutable.Map
        .empty[(String, String, String), List[(Double, Long, Long, Long)]]
      for (pass <- 1 to 2; n <- names; (pname, rocks) <- providers;
           scale <- Seq("base", "scaled")) {
        val res = run(n, if (scale == "base") baseDir else scaledDir, rocks)
        System.err.println(String.format(java.util.Locale.ROOT,
          "[scale] pass %d %-14s %-8s %-6s %8.3f s  state %d rows" +
            " / %.1f MB", Int.box(pass), n, pname, scale,
          Double.box(res._1), Long.box(res._3), Double.box(res._4 / 1e6)))
        samples.updateWith((n, pname, scale))(s =>
          Some(res :: s.getOrElse(Nil)))
      }
      for (n <- names; scale <- Seq("base", "scaled")) {
        val counts = providers
          .flatMap { case (p, _) => samples((n, p, scale)).map(_._2) }
          .distinct
        require(counts.size == 1, s"stream probe: $n@$scale result rows " +
          s"diverge across providers/passes: $counts")
      }
      for { n <- names; (pname, _) <- providers } yield {
        val b = samples((n, pname, "base"))
        val s = samples((n, pname, "scaled"))
        val bMin = b.map(_._1).min
        val sMin = s.map(_._1).min
        val extra = s""","state_rows":${s.map(_._3).max},""" +
          s""""state_mem_mb":${fmt(s.map(_._4).max / 1e6)}"""
        (s"${n}_$pname", bMin, sMin, sMin / bMin, extra)
      }
    } finally spark.streams.removeListener(census)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_HUBGROWTH=1: the adversarial shared-hot-vertex
    // staging + the hub-guarded probe set; writes SCALE_PROBE_HUB.json
    // SPARK_GRAFT_LSHSKEW=1: the skewed-bucket embedding staging + the
    // LSH probe set; writes SCALE_PROBE_LSH.json. In this mode BOTH
    // sides are `mult`×-staged corpora of identical row count — base
    // is the uniform twin, scaled the hot-bucket twin — so the ratio
    // is the marginal cost of the hot bucket alone, not of growth.
    val hubGrowth = sys.env.get("SPARK_GRAFT_HUBGROWTH").contains("1")
    val lshSkew = sys.env.get("SPARK_GRAFT_LSHSKEW").contains("1")
    // SPARK_GRAFT_STREAMPROBE=1: the state-store probe — both
    // streaming replays at both scales under both providers; writes
    // SCALE_PROBE_STREAM.json (shares the uniform v3 staging)
    val streamProbe = sys.env.get("SPARK_GRAFT_STREAMPROBE").contains("1")
    // SPARK_GRAFT_BOILERPLATE=1: high-df shared-shingle staging for
    // the exact-twin Jaccard pair; writes SCALE_PROBE_BOILER.json
    val boiler = sys.env.get("SPARK_GRAFT_BOILERPLATE").contains("1")
    require(Seq(hubGrowth, lshSkew, streamProbe, boiler)
        .count(identity) <= 1,
      "pick one probe mode: SPARK_GRAFT_HUBGROWTH, SPARK_GRAFT_LSHSKEW, " +
        "SPARK_GRAFT_STREAMPROBE or SPARK_GRAFT_BOILERPLATE")
    val baseSet =
      if (hubGrowth) HubGrowthQueries
      else if (lshSkew) LshSkewQueries
      else if (streamProbe) StreamProbeQueries
      else if (boiler) BoilerQueries
      else DefaultQueries
    val names = SparkEntry.onlySubset() match {
      case Some(only) => baseSet.filter(only)
      case None => baseSet
    }
    // mtime-keyed like the other stagings: regenerated testdata must
    // re-stage, never reuse a stale scaled corpus. Key on the max
    // mtime across the tables the selected mode actually STAGES (a
    // partial regen that touches only lineitem must also invalidate
    // the dir) — hub mode deliberately skips orders (dead I/O there)
    // and lsh-skew stages embeddings only, so a testdata dir missing
    // an unstaged table must not crash staging.
    val stagedTables =
      if (lshSkew) Seq("embeddings")
      else if (boiler) Seq("documents")
      else if (hubGrowth) Seq("events", "lineitem", "documents", "embeddings")
      else Seq("events", "orders", "lineitem", "documents", "embeddings")
    val srcM = stagedTables
      .map(t => java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$src/$t.parquet")).toMillis).max
    // v3: orders joined the staged set (v2 added lineitem) — an older
    // dir must not be reused
    // lshskew2: the r12 review fix (noise orthogonal to the seed too,
    // stage-time pair census) — an lshskew1 dir must not be reused
    val flavor =
      if (hubGrowth) "hub3" else if (lshSkew) "lshskew2"
      else if (boiler) "boiler1" else "v3"
    val dir = s"/tmp/graft_scale${mult}_${flavor}_" +
      src.replaceAll("[^a-zA-Z0-9]", "_") + s"_m$srcM"
    System.err.println(s"[scale] staging ${mult}x of $src -> $dir" +
      (if (hubGrowth) " (hub-growth: shared part keys)"
       else if (lshSkew) " (lsh-skew: one hot bucket)"
       else if (boiler) " (boilerplate flood: shared high-df shingles)"
       else if (streamProbe) " (stream probe: shared uniform staging)"
       else ""))
    if (lshSkew) stageLshSkew(spark, src, dir, mult)
    else if (boiler) stageBoiler(spark, src, dir, mult)
    else stage(spark, src, dir, mult, hubGrowth)
    // lsh-skew and boiler compare their two staged twins; the other
    // modes compare the source corpus against the staged one
    val baseDir =
      if (lshSkew || boiler) s"$dir/base" else src
    val scaledDir =
      if (lshSkew) s"$dir/skew"
      else if (boiler) s"$dir/boiler"
      else dir

    // rows: (name, base s, scaled s, ratio, extra JSON fields)
    val rows: Seq[(String, Double, Double, Double, String)] =
      if (streamProbe) streamProbeRows(spark, baseDir, scaledDir, names)
      else {
        def time(name: String, d: String): Double = {
          // cold shared caches per timing: the probe must measure the
          // FULL operator including its pair-graph build at both scales
          // (see SparkEntry.resetSharedCaches) — Bench keeps them warm
          SparkEntry.resetSharedCaches()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        // one warm-up pass at base scale (codegen + JIT), then min-of-2
        // timed passes per scale, interleaved across the suite like
        // Bench (separated wall-clock windows defeat bursty CPU steal)
        names.foreach { n => time(n, baseDir); () }
        val samples = scala.collection.mutable.Map
          .empty[(String, String), List[Double]]
        for (pass <- 1 to 2; n <- names; scale <- Seq("base", "scaled")) {
          val dt = time(n, if (scale == "base") baseDir else scaledDir)
          System.err.println(String.format(java.util.Locale.ROOT,
            "[scale] pass %d %-24s %-6s %8.3f s", Int.box(pass), n, scale,
            Double.box(dt)))
          samples.updateWith((n, scale))(s => Some(dt :: s.getOrElse(Nil)))
        }
        names.map { n =>
          val b = samples((n, "base")).min
          val s = samples((n, "scaled")).min
          (n, b, s, s / b, "")
        }
      }
    // a narrowed (SPARK_GRAFT_ONLY) run must never clobber the
    // committed full-suite artifact OR another narrowed run's
    // evidence — it lands in a per-subset *_ONLY_<queries>.json
    val narrowed = SparkEntry.onlySubset().isDefined
    val onlySuffix = if (narrowed) onlyFileSuffix(names) else ""
    val filePrefix =
      if (hubGrowth) "SCALE_PROBE_HUB"
      else if (lshSkew) "SCALE_PROBE_LSH"
      else if (streamProbe) "SCALE_PROBE_STREAM"
      else if (boiler) "SCALE_PROBE_BOILER"
      else "SCALE_PROBE"
    val outFile = filePrefix + onlySuffix + ".json"
    // band evidence (cross-run hulls + isolated-rerun notes, e.g.
    // graph_ktruss's memory-state band) lives in the artifacts
    // themselves; a refresh CARRIES and SELF-SEEDS it from every file
    // of the same mode — the committed full-suite artifact, the file
    // being rewritten, and every per-subset *_ONLY_*.json — so an
    // out-of-band narrowed measurement governs the full-suite band on
    // the next refresh, and the headline numbers can never contradict
    // their own band field. The curated note string rides along
    // untouched (a stderr warning flags it when the band widens).
    val priorEntries =
      priorArtifactEntries(outFile, filePrefix, ".", Some(mult), Some(src))
    val qs = rows.map { case (n, b, s, r, extra) =>
      val band = bandFragment(priorEntries.getOrElse(n, Nil), s, r,
        msg => System.err.println(s"[scale] WARNING: $n $msg"))
      s""""$n":{"base":${fmt(b)},"scaled":${fmt(s)},""" +
        s""""ratio":${fmt(r)}$extra$band}"""
    }.mkString("{", ",", "}")
    val metric =
      if (hubGrowth) "scale_probe_hub"
      else if (lshSkew) "scale_probe_lsh"
      else if (streamProbe) "scale_probe_stream"
      else if (boiler) "scale_probe_boiler"
      else "scale_probe"
    val line = s"""{"metric":"$metric","mult":$mult,""" +
      s""""total_base":${fmt(rows.map(_._2).sum)},""" +
      s""""total_scaled":${fmt(rows.map(_._3).sum)},""" +
      s""""queries":$qs,"src":"$src"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
