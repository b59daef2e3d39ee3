package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GraftFunctions

/** Dataset-assembly operators for training-data pipelines: the steps
  * that turn a cleaned corpus into model-ready inputs — deterministic
  * train/val/test splits, context-window chunking, and fixed-budget
  * sequence packing.
  *
  * Scale posture: splits and chunking are narrow per-row maps (no
  * shuffle — at 100 TB they run inside the scan stage); packing is one
  * window over (source, doc_id), i.e. a single shuffle partitioned by
  * source. All arithmetic is integer/hash-deterministic so the same
  * document lands in the same split/chunk/batch on every engine and
  * every rerun — the property that makes dataset builds reproducible.
  */
object PipelineOps {

  /** Deterministic global shuffle for training-order
    * reproducibility: an affine hash of doc_id gives every document a
    * pseudorandom sort key, a shard, and a within-shard position —
    * (shard, pos) is a total order that every rerun reproduces
    * bit-for-bit, unlike `ORDER BY random()` (RNG state) or
    * `repartition(shuffle=true)` (task-scheduling order). Epoch
    * reshuffles = bump the added constant.
    *
    * Scale shape: key and shard are narrow per-row arithmetic (no
    * shuffle); the only exchange is the position window, partitioned
    * by shard — shards ≈ output files (thousands at 100 TB), so the
    * window parallelizes across shards and no partition ever holds
    * more than one shard's rows. The modulus caps the multiplicand so
    * the affine step never overflows int64 at any doc_id.
    */
  def shardShuffle(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val key = ((col("doc_id") % lit(1000003L)) * lit(1103515245L) +
      lit(12345L)) % lit(2147483648L)
    documents
      .select(col("doc_id"), key.as("shuffle_key"),
        (key % lit(nShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("shuffle_key", "doc_id"))
        .cast("long"))
      .orderBy("shard", "pos")
  }

  /** Unrolled Morton (Z-order) interleave of two `bits`-bit integer
    * columns as plain integer arithmetic — `(x div 2^i) % 2 · 2^pos`
    * terms only, so ONE generator emits bit-identical semantics for
    * both the Spark plan (`intDiv = "div"`) and a DuckDB oracle
    * (`intDiv = "//"`); no engine-specific bit operators involved.
    */
  def zvalExprText(a: String, b: String, bits: Int, intDiv: String): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($a $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}",
        s"(($b $intDiv ${1L << i}) % 2) * ${1L << (2 * i)}")
    }.mkString(" + ")

  /** Z-order layout key for the events table: Morton-interleave the
    * user bucket (user_id mod 256) with the time-of-day bucket
    * (minute-of-day scaled to 0..255). Sorting by `zval` gives the
    * multi-dimensional clustering a lakehouse `OPTIMIZE ZORDER BY
    * (user_id, ts)` produces: a predicate on EITHER dimension touches
    * only ~√(files) of a z-sorted layout, where a single-column sort
    * prunes one dimension and scans everything for the other.
    * `zfile` (zval div 1024 → 64 buckets) is the file assignment a
    * writer would range-partition on.
    *
    * Scale shape: the key is narrow per-row integer arithmetic (no
    * shuffle); the production write is `repartitionByRange(zval)` +
    * sortWithinPartitions — one range exchange, the same cost as any
    * sorted write. Determinism: integer ops only, engine-exact.
    */
  def zorderEvents(events: DataFrame, bits: Int = 8): DataFrame =
    events
      .select(col("event_id"),
        (col("user_id") % lit(256L)).as("du"),
        expr("((hour(ts) * 60 + minute(ts)) * 256) div 1440").as("dt"))
      .select(col("event_id"), col("du"), col("dt"),
        expr(zvalExprText("du", "dt", bits, "div")).as("zval"))
      .withColumn("zfile", expr("zval div 1024"))
      .orderBy("zval", "event_id")

  /** Curriculum assignment: cut the corpus into quality quartiles
    * (phase 1 = highest [[TextOps.qualityModelScore]] quartile) — the
    * schedule curriculum-learning training loops consume easy-to-hard.
    * NOT a global ntile window (single-partition at scale): the three
    * quartile thresholds come from ONE aggregate, broadcast back, and
    * the phase is a narrow per-row CASE — one tiny exchange total.
    *
    * Determinism: ranks never touch raw doubles — the sort domain is
    * fixed-point `floor(score·1e12)` BIGINTs, and exact quartiles of
    * integers at binary-fraction q (.25/.5/.75) interpolate
    * IEEE-exactly in both engines.
    */
  def curriculumPhases(documents: DataFrame): DataFrame = {
    val scored = TextOps.qualityModelScore(documents)
      .select(col("doc_id"), floor(col("q_score") * lit(1.0e12)).as("score_e12"))
    val th = scored.agg(
      expr("percentile(score_e12, 0.75)").as("q75"),
      expr("percentile(score_e12, 0.5)").as("q50"),
      expr("percentile(score_e12, 0.25)").as("q25"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("score_e12"),
        when(col("score_e12") >= col("q75"), lit(1))
          .when(col("score_e12") >= col("q50"), lit(2))
          .when(col("score_e12") >= col("q25"), lit(3))
          .otherwise(lit(4)).as("phase"))
      .orderBy("doc_id")
  }

  /** Deterministic split assignment: bucket = first byte of
    * md5(doc_id) (uniform over 0..255), thresholds at 204/230 →
    * ~80/10/10 train/val/test. Hash-based (not row-order-based) so
    * membership is stable under repartitioning, appends, and reruns —
    * and implicitly stratified: any subpopulation hashes uniformly.
    */
  def splitAssign(documents: DataFrame,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame =
    documents
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int").as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpper, lit("train"))
          .when(col("bucket") < valUpper, lit("val"))
          .otherwise(lit("test")))
      .orderBy("doc_id")

  /** Leakage-safe train/val/test split: the hash is taken over the
    * near-dup COMPONENT root instead of the doc id, so an entire
    * near-dup cluster lands in one split — the standard fix for
    * eval contamination, where a test document's near-twin sits in
    * train and the benchmark silently measures memorization.
    * `pairs` is the LSH candidate edge list; unpaired docs hash their
    * own id (their component is themselves). Plan: bounded-round
    * connected components (pointer jumping) + ONE left keyed join of
    * the corpus against the node→component map (component map is
    * paired-docs-only, usually a small fraction of the corpus) + the
    * same md5-bucket assignment as [[splitAssign]] — no new shuffle
    * shapes beyond the components step itself.
    */
  def splitLeakageSafe(documents: DataFrame, pairs: DataFrame,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame = {
    val comps = graft.operators.GraphOps.connectedComponents(pairs)
      .select(col("doc_id"), col("component"))
    documents.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("component"), col("doc_id")))
      .withColumn("bucket",
        conv(substring(md5(col("group_key").cast("string")), 1, 2), 16, 10)
          .cast("int"))
      .select(col("doc_id"), col("group_key"),
        when(col("bucket") < trainUpper, lit("train"))
          .when(col("bucket") < valUpper, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  /** Split-leakage audit — the measurement that justifies
    * [[splitLeakageSafe]]: for each split scheme, how many near-dup
    * pairs STRADDLE a split boundary (a test doc whose near-twin is
    * in train = the eval-contamination unit). The naive per-doc hash
    * split leaks a predictable ~1 − Σ pᵢ² of the pair mass; the
    * component-hashed split must audit to exactly zero — and this
    * query is the regression tripwire that keeps it that way. Pairs
    * are candidate-scale, so both assignment joins broadcast onto the
    * pair list; two rows out at any corpus size.
    */
  def splitLeakageAudit(documents: DataFrame, pairs: DataFrame,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    def crossCount(assign: DataFrame, scheme: String) = p
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        "doc_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_cross"))
      .select(lit(scheme).as("scheme"), col("n_pairs"), col("n_cross"))
    crossCount(splitAssign(documents, trainUpper, valUpper), "naive")
      .unionByName(crossCount(
        splitLeakageSafe(documents, p, trainUpper, valUpper),
        "component_hashed"))
      .withColumn("cross_rate",
        when(col("n_pairs") === 0, lit(0.0d))
          .otherwise(round(col("n_cross").cast("double")
            / col("n_pairs").cast("double"), 9)))
      .orderBy("scheme")
  }

  /** Source-mixture shift under dedup — the "did dedup change my
    * data mix?" readout: per source, document count and corpus share
    * BEFORE and AFTER near-dup removal (lowest-id survivor per
    * cluster, the [[GraphOps.dedupSurvivors]] policy), plus the share
    * delta. A provider whose content duplicates heavily loses weight
    * in the final mixture — silently, unless this table is checked
    * against the intended sampling weights ([[mixtureWeights]] /
    * [[temperatureMixture]]). Plan: the candidate-scale components map
    * names the losers; the corpus is touched by ONE left-anti join +
    * two source-keyed counts; totals ride single-row broadcast
    * cross-joins. Shares and the delta are round-9 doubles computed
    * from exact counts with identical shape on both engines.
    */
  def mixtureShift(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = graft.operators.GraphOps.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    val docs = documents.select(col("doc_id"), col("source"))
    val before = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
    val after = docs.join(losers, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_after"))
    val joined = before.join(after, Seq("source"), "left")
      .na.fill(0L, Seq("n_after"))
    val totals = joined.agg(sum(col("n_before")).as("t_before"),
      sum(col("n_after")).as("t_after"))
    val shareB = round(col("n_before").cast("double")
      / col("t_before").cast("double"), 9)
    val shareA = round(col("n_after").cast("double")
      / col("t_after").cast("double"), 9)
    joined.crossJoin(broadcast(totals)) // single-row totals
      .select(col("source"), col("n_before"), col("n_after"),
        shareB.as("share_before"), shareA.as("share_after"),
        round(shareA - shareB, 9).as("share_shift"))
      .orderBy("source")
  }

  /** Leave-one-out target encoding with additive smoothing — the
    * feature-engineering workhorse for high-cardinality categoricals:
    * encode category c for row i as (S_c − xᵢ + m·prior)/(n_c − 1 + m),
    * where prior is the global target mean and m the smoothing
    * strength. Leaving the row's own target out is the part that
    * matters (plain mean encoding leaks the label into the feature —
    * the same failure class [[splitLeakageSafe]] closes for splits).
    * Exactness: targets accumulate as DECIMAL(18,2) sums (order-free),
    * the per-row formula runs in double with an identical expression
    * shape on both engines behind a round(…,9) barrier. Plan: one
    * category-keyed aggregate, broadcast back over the row scan
    * (category cardinality is bounded), one single-row global
    * cross-join — no row-scale shuffle at any corpus size beyond the
    * category aggregate itself.
    */
  def targetEncodeLoo(events: DataFrame, m: Double = 20.0): DataFrame = {
    val x = col("value").cast(DecimalType(18, 2))
    val grp = events.groupBy("event_type")
      .agg(sum(x).as("s_c"), count(lit(1)).as("n_c"))
    val glob = events.agg(sum(x).as("s_g"), count(lit(1)).as("n_g"))
    events.select(col("event_id"), col("event_type"), x.as("x"))
      .join(broadcast(grp), "event_type")
      .crossJoin(broadcast(glob)) // single-row global totals
      .select(col("event_id"), col("event_type"),
        round(((col("s_c") - col("x")).cast("double")
            + lit(m) * (col("s_g").cast("double") / col("n_g").cast("double")))
          / ((col("n_c") - 1).cast("double") + lit(m)), 9).as("enc_loo"))
      .orderBy("event_id")
  }

  /** Deterministic source-mixture interleave (data mixing): orders the
    * corpus so a sequential reader consumes sources in proportion to
    * `weights` — the dataset-assembly step that turns per-source
    * corpora into one mixed training stream. Doc with per-source rank
    * r (1-based by doc_id) gets mix_key = r / weight(source);
    * ascending mix_key IS the interleaved order (a weight-2 source
    * appears twice per unit of key space). Exactly one window shuffle
    * (per-source rank); the final global order is a range sort — at
    * 100 TB that is the write-ordering pass of the dataset build
    * (range partition + sortWithinPartitions), not a single-partition
    * bottleneck. Use exact binary-fraction weights (2.0, 0.5, …) for
    * bit-identical keys across engines.
    */
  def interleaveBySource(documents: DataFrame, weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val weightExpr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
        when(col("source") === k, lit(v)).otherwise(acc) }
    documents
      .select(col("doc_id"), col("source"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("mix_key", col("src_rank").cast("double") / weightExpr)
      .orderBy("mix_key", "source", "doc_id")
  }

  /** Deterministic epoch-style upsampling: each document repeats
    * `repeats(source)` times with an explicit epoch index — the
    * data-mixing step that shows a high-quality source to training
    * more than once per pass (the complement of [[stratifiedSample]]'s
    * downsampling). One bounded generate (`sequence` explode) — no
    * shuffle; the epoch index keeps every copy addressable for
    * downstream shuffling/sharding. A repeats value < 1 DROPS the
    * source (the filter guard matters: Spark's `sequence(1, 0)` infers
    * step -1 and would emit epochs [1, 0] instead of nothing).
    */
  def repeatUpsample(documents: DataFrame, repeats: Map[String, Int],
      defaultRepeats: Int = 1): DataFrame = {
    val rep = repeats.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRepeats)) { case (acc, (k, v)) =>
        when(col("source") === k, lit(v)).otherwise(acc) }
    documents
      .select(col("doc_id"), col("source"), rep.as("n_rep"))
      .filter(col("n_rep") >= 1)
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1, n_rep)")).as("epoch"))
      .orderBy("doc_id", "epoch")
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minShared` distinct word-trigram shingles with a benchmark/eval
    * set — the n-gram-overlap contamination check a training pipeline
    * runs before any eval-aware data release. The benchmark shingle set
    * is DISTINCT and benchmark-sized (eval suites are tiny next to the
    * corpus), so it broadcasts; the corpus side is one narrow
    * codegen'd shingle pass + the broadcast join + ONE groupBy(doc_id)
    * — a single shuffle no matter the corpus scale. Returns
    * (doc_id, n_shared) for flagged documents.
    *
    * 2x-audit note (r8 `pipe_decontaminate` ~3.5x a ~0.15 s oracle):
    * structural floor at bench scale — the whole operator is ~0.5 s of
    * fixed cost (one broadcast-build job for the benchmark shingle
    * set, one shuffle-scheduled corpus job) against a single-process
    * engine that pays neither. The plan is already the bounded one:
    * the benchmark side is the ONLY materialized shingle set, the
    * corpus side streams through codegen into the broadcast probe and
    * partial-aggregates map-side; there is no data-scale stage left to
    * remove, and the fixed overhead amortizes with corpus size.
    */
  def decontaminate(documents: DataFrame, benchmark: DataFrame,
      minShared: Long = 5L): DataFrame = {
    val bsh = benchmark
      .select(explode(GraftFunctions.word_shingles(col("text"), 3)).as("sh"))
      .distinct()
    documents
      .select(col("doc_id"),
        explode(GraftFunctions.word_shingles(col("text"), 3)).as("sh"))
      .join(broadcast(bsh), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared")) // shingles are per-doc distinct already
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: per-stratum keep rates (e.g.
    * downsample the dominant language) applied through a uniform
    * content-independent hash — u = first 8 md5 hex digits of the
    * doc_id mapped to [0,1), kept iff u < rate(stratum). Division by
    * 2^32 is exact in doubles, so membership is bit-reproducible
    * across engines and reruns; a narrow per-row filter, no shuffle,
    * and at 100 TB the sample decision rides inside the scan stage.
    */
  def stratifiedSample(documents: DataFrame, rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (e, (stratum, r)) =>
      when(col("lang") === stratum, lit(r)).otherwise(e)
    }
    documents
      .withColumn("__u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0d)
      .filter(col("__u") < rate)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Context-window chunking: each document's token stream cut into
    * consecutive `chunkTokens`-token windows (last partial). The chunk
    * array is built by one codegen'd kernel call per document
    * ([[graft.functions.WordChunks]]); posexplode yields (chunk_id,
    * chunk_text) with no re-tokenization after the generate.
    */
  def chunkTokens(documents: DataFrame, chunkTokens: Int): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(GraftFunctions.word_chunks(col("text"), chunkTokens))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_chunk_tokens",
        size(split(col("chunk_text"), " ")).cast("long"))
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .orderBy("doc_id", "chunk_id")

  /** Sliding-window chunking with OVERLAP — the RAG/pretraining
    * chunker where adjacent chunks share `size − stride` boundary
    * tokens so no span of context is ever split without a witness
    * ([[chunkTokens]] is the non-overlapping special case in spirit;
    * this one tokenizes with the engine-portable `[a-z0-9]+` regex so
    * the oracle is exact). Start offsets are a `sequence(0, max(n −
    * size, 0), stride)` explode — bounded fan-out (≤ n/stride + 1
    * rows per doc), narrow, no shuffle — PLUS the tail start `n −
    * size` whenever the stride grid does not land on it: without it,
    * up to stride−1 trailing tokens would appear in NO chunk, which
    * breaks the full-coverage contract (the extra tail chunk is
    * full-width and overlaps its predecessor by more than usual —
    * the standard tail treatment).
    */
  def chunkSliding(documents: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= size, "need 1 <= stride <= size")
    documents
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(
          s"array_sort(array_distinct(concat(" +
            s"sequence(0, greatest(size(toks) - $size, 0), $stride), " +
            s"array(greatest(size(toks) - $size, 0)))))"))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        expr(s"array_join(slice(toks, start + 1, $size), ' ')").as("chunk_text"),
        expr(s"size(slice(toks, start + 1, $size))").cast("long")
          .as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  /** The flagship composition: corpus cleaning = quality gates +
    * language-ID + exact-dedup survivorship in ONE pipeline. Rather
    * than joining the standalone operators (four scans + three join
    * shuffles of the same base table), the per-row signals — token
    * count, punctuation ratio, language scores, content fingerprint —
    * are computed in a single narrow pass (sharing one kernel token
    * array), and survivorship is a min-over-fingerprint window: the
    * whole clean is ONE shuffle at any scale. Semantics are exactly the
    * composed operators': [[TextOps.qualityScore]] ratios,
    * [[TextOps.languageId]] argmax, [[TextOps.dedupExact]] min-doc_id
    * survivor.
    *
    * 2x-audit note (`pipe_clean_corpus`, ~0.19 s oracle, ~0.64 s
    * fresh-artifact): one fingerprint-keyed exchange is the only
    * shuffle; the residual is the 0.4-0.7 s fixed job floor measured
    * across the suite's sub-second band — no removable stage.
    */
  def cleanCorpus(documents: DataFrame, minTokens: Long = 10L,
      maxPunctRatio: Double = 0.30): DataFrame = {
    val toks = GraftFunctions.word_shingles(col("text"), 1, distinct = false)
    val scored = TextOps.LangMarkers.foldLeft(
      documents.select(col("doc_id"), col("source"), col("text"),
        toks.as("__toks"))) { case (df, (language, words)) =>
      df.withColumn(s"score_$language",
        expr(s"size(filter(__toks, t -> t IN (${words.map("'" + _ + "'").mkString(",")})))")
          .cast("long"))
    }
    val w = Window.partitionBy(col("fp"))
    scored
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("punct_ratio",
        expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))").cast("double") /
          length(col("text")))
      .withColumn("lang_pred", TextOps.langBest)
      .withColumn("fp", md5(array_join(col("__toks"), " ")))
      .withColumn("__surv", min(col("doc_id")).over(w))
      // dedup first (survivor chosen among ALL docs), then the gates
      .filter(col("doc_id") === col("__surv") &&
        col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio &&
        col("lang_pred") =!= "und")
      .select("doc_id", "source", "n_tokens", "punct_ratio", "lang_pred")
      .orderBy("doc_id")
  }

  /** The end-to-end dataset build as ONE declarative pipeline — what a
    * user actually runs before training: clean (quality gates +
    * language-ID + exact-dedup survivorship), drop benchmark-
    * contaminated documents, assign deterministic train/val/test
    * splits, and pack each (split, source) lane into fixed token
    * budgets. Pure composition of [[cleanCorpus]], [[decontaminate]],
    * [[splitAssign]]'s bucket arithmetic and [[packByBudget]]'s prefix
    * window — Catalyst plans it as three shuffles total (clean's fp
    * window, the contamination groupBy, the packing window); the
    * contamination filter and split assignment are narrow
    * (broadcast anti-join + per-row hash arithmetic).
    *
    * 2x-audit note (`pipe_build_corpus`, ~0.23 s oracle, ~0.90 s
    * fresh-artifact): the composition runs the three shuffles listed
    * above as separately scheduled jobs; each is the minimal exchange
    * for its stage and the whole is the fused single-pipeline
    * equivalent of five curation steps — the fixed multi-job cost is
    * the entire gap, and it amortizes with corpus size.
    */
  def buildCorpus(documents: DataFrame, benchmark: DataFrame,
      budgetTokens: Long = 2000L, minShared: Long = 5L): DataFrame = {
    val cleaned = cleanCorpus(documents)
    val flagged = decontaminate(documents, benchmark, minShared).select("doc_id")
    val w = Window.partitionBy(col("split"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cleaned
      // flagged is contamination-hit-bounded (docs sharing ≥ minShared
      // shingles with the BENCHMARK — benchmark-overlap scale, not
      // corpus scale); fail-loudly broadcast per the dedup id-set rule
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int"))
      .withColumn("split",
        when(col("bucket") < 204, lit("train"))
          .when(col("bucket") < 230, lit("val")).otherwise(lit("test")))
      .withColumn("batch_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) /
          budgetTokens.toDouble).cast("long"))
      .select("doc_id", "source", "n_tokens", "lang_pred", "split", "batch_id")
      .orderBy("doc_id")
  }

  /** Fixed-budget sequential packing: documents are laid out in
    * (source, doc_id) order and cut into batches every time the running
    * token total crosses `budgetTokens` — batch_id = floor(prefix_sum /
    * budget). One window shuffle partitioned by source; the prefix sum
    * is the standard scalable formulation (a true greedy first-fit is
    * inherently sequential and would serialize the corpus).
    */
  def packByBudget(documents: DataFrame, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("source"),
        size(GraftFunctions.word_shingles(col("text"), 1, distinct = false))
          .cast("long").as("n_tokens"))
      .withColumn("batch_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) /
          budgetTokens.toDouble).cast("long"))
      .select("doc_id", "source", "n_tokens", "batch_id")
      .orderBy("source", "doc_id")
  }

  /** Token-weighted dedup cost per source — [[mixtureShift]] counts
    * DOCUMENTS, but training budgets are priced in TOKENS, and long
    * documents dominate both: this census reports how many tokens
    * each source loses to near-dup removal (cluster losers under the
    * lowest-id survivor policy) and at what rate. The number that
    * decides whether a dedup threshold is "cheap hygiene" or "just
    * deleted a tenth of provider X's budget". Plan: the
    * candidate-scale loser set left-joins the token-scored projection
    * once; one source-keyed rollup; exact integer token sums and a
    * round-9 rate.
    */
  def tokenLoss(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = graft.operators.GraphOps.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"), lit(1L).as("lost"))
    tokenScored(documents)
      .join(losers, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("tokens_before"),
        sum(when(col("lost").isNotNull, col("n_tokens")).otherwise(0L))
          .as("tokens_lost"))
      .select(col("source"), col("tokens_before"), col("tokens_lost"),
        round(col("tokens_lost").cast("double")
          / col("tokens_before").cast("double"), 9).as("loss_rate"))
      .orderBy("source")
  }

  /** Packing-efficiency census over [[packByBudget]] — per source: how
    * many batches the budget packer produced and what fraction of the
    * reserved token budget those batches actually fill. Low fill rate
    * means the padding bill (every batch trains at budget length) is
    * being paid for air — the readout that tunes budget size against
    * the corpus's document-length distribution. Pure rollup over the
    * packer's assignment: one source-keyed aggregate (batch ids are
    * dense per source, so n_batches = max + 1 — no distinct state),
    * exact integer token sums, one round-6 division.
    */
  def packEfficiency(documents: DataFrame, budgetTokens: Long): DataFrame =
    packByBudget(documents, budgetTokens)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (max(col("batch_id")) + lit(1L)).as("n_batches"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("n_batches"),
        col("total_tokens"),
        round(col("total_tokens").cast("double")
          / (col("n_batches") * lit(budgetTokens)).cast("double"), 6)
          .as("fill_rate"))
      .orderBy("source")

  /** doc_id + source + token count, the shared scoring projection of
    * the per-source curation operators below (narrow, runs in the
    * scan stage).
    */
  private def tokenScored(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("source"),
      size(GraftFunctions.word_shingles(col("text"), 1, distinct = false))
        .cast("long").as("n_tokens"))

  /** Per-source document cap — the per-domain cap of web-corpus
    * curation (a handful of domains dominate a crawl; capping them
    * re-balances the mixture). Keeps the `n` longest documents per
    * source, token count DESC with doc_id ASC tie-break: an
    * all-integer ordering, so ranks are deterministic across engines
    * and reruns.
    *
    * Default shape is ONE window shuffle partitioned by source — but a
    * skewed corpus sorts the giant source's whole partition to keep n
    * rows. `preFilter = true` is the 100 TB path: a FIRST window over
    * (source, physical-partition-id) — cardinality spread like a
    * salted join — keeps each input partition's local top-n, and only
    * that bounded survivor set (≤ n × partitions rows per source)
    * reaches the exact per-source window. The global top-n per source
    * is a subset of the union of local top-n's, so the result is
    * IDENTICAL, not approximate (spec-pinned against the plain twin).
    */
  def capPerSource(documents: DataFrame, n: Int,
      preFilter: Boolean = false): DataFrame = {
    val scored = tokenScored(documents)
    val base =
      if (!preFilter) scored
      else scored
        .withColumn("__p", spark_partition_id())
        .withColumn("__lr", row_number().over(
          Window.partitionBy(col("source"), col("__p"))
            .orderBy(col("n_tokens").desc, col("doc_id"))))
        .filter(col("__lr") <= n).drop("__p", "__lr")
    base
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_tokens").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= n)
      .select("doc_id", "source", "n_tokens", "rnk")
      .orderBy("source", "doc_id")
  }

  /** Per-source quality-quantile gate: keep documents at or above
    * their OWN source's `q`-quantile of token count — the relative
    * quality threshold of corpus curation (an absolute cutoff
    * over-prunes terse sources and under-prunes verbose ones). The
    * exact per-source quantile rides the SAME window shuffle as the
    * filter — one shuffle, one scan, no threshold-table join.
    *
    * Cross-engine determinism: use a binary-fraction `q` (0.25, 0.5,
    * 0.75) — the linear interpolation `lo + (hi−lo)·frac` over integer
    * token counts is then IEEE-exact in any engine, so boundary
    * documents cannot flip on a last-ulp difference.
    *
    * `approx = true` is the bounded-memory variant: per-source
    * `approx_percentile` (fixed-size sketch, map-side mergeable) in a
    * tiny aggregate broadcast back to the corpus — at petabyte scale
    * the window's full sort disappears and the gate becomes one scan +
    * one broadcast join. The sketch returns an OBSERVED value (rank
    * error bounded by `accuracy`), not the interpolated quantile —
    * spec-pinned equal to exact where the quantile is itself observed.
    */
  def qualityQuantileFilter(documents: DataFrame, q: Double,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val scored = tokenScored(documents)
    val gated =
      if (approx) {
        val thr = scored.groupBy("source")
          .agg(expr(s"approx_percentile(n_tokens, $q, $accuracy)")
            .cast("double").as("__thr"))
        scored.join(broadcast(thr), "source")
      } else
        scored.withColumn("__thr",
          expr(s"percentile(n_tokens, $q)")
            .over(Window.partitionBy(col("source"))))
    gated.filter(col("n_tokens") >= col("__thr"))
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
  }

  /** Data-mixture weights: per-language sampling fractions to hit a
    * target distribution under a global token budget — the step that
    * turns "we want 60% en / 30% de" into per-shard sample rates a
    * pipeline can apply ([[stratifiedSample]]'s rates come from
    * here). Observed tokens use the len/4 BPE-ish proxy summed as
    * exact BIGINTs; weight = min(1, budget·share / observed) — a
    * single double division of exact integers, bit-identical on any
    * IEEE engine. Languages absent from `shares` weight 0 (dropped
    * from the mix), languages whose corpus can't fill their target
    * cap at 1 (can't sample above 1 without upsampling — that is
    * [[repeatUpsample]]'s job). One tiny lang-keyed aggregate + a
    * broadcast share map: the corpus never shuffles.
    */
  def mixtureWeights(documents: DataFrame, budgetTokens: Long,
      shares: Map[String, Double]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val shareDf = shares.toSeq.toDF("lang", "share")
    documents.groupBy("lang")
      .agg(sum(expr("length(text) div 4")).as("est_tokens"))
      .join(broadcast(shareDf), Seq("lang"), "left")
      .select(col("lang"), col("est_tokens"),
        coalesce(col("share"), lit(0.0)).as("target_share"),
        least(lit(1.0),
          lit(budgetTokens.toDouble) * coalesce(col("share"), lit(0.0))
            / col("est_tokens")).as("weight"))
      .orderBy("lang")
  }

  /** Dataset card — the one-query corpus summary a release ships
    * with: document/token volume, exact-dup mass, median length, and
    * per-language shares, as (metric, value) rows. Composition of
    * aggregates the engine already serves individually; everything
    * reduces in two passes (one doc-level scan feeding a global
    * aggregate + one bounded lang rollup) with only sketch-size rows
    * crossing exchanges. At 100 TB the exact `percentile` and
    * `countDistinct` swap for their sketch twins (a7/a6 precedent);
    * the card's shape is unchanged.
    */
  def datasetCard(documents: DataFrame): DataFrame = {
    // tokenize once: count and fingerprint read the same staged array
    val toks = documents.select(col("doc_id"), col("lang"), col("n_chars"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("__t"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("__t")).cast("long").as("n_toks"),
        md5(array_join(col("__t"), " ")).as("fp"))
    val base = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("n_toks")).cast("double").as("n_tokens"),
      (count(lit(1)) - countDistinct(col("fp"))).cast("double").as("dup_docs"),
      expr("percentile(n_chars, 0.5D)").cast("double").as("p50_chars"))
    val baseRows = base.select(explode(array(
        struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").as("value")),
        struct(lit("dup_docs").as("metric"), col("dup_docs").as("value")),
        struct(lit("p50_chars").as("metric"), col("p50_chars").as("value"))))
        .as("r"))
      .select(col("r.metric").as("metric"), col("r.value").as("value"))
    val langRows = toks.groupBy("lang").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("n"))))
      .select(concat(lit("share_"), col("lang")).as("metric"),
        (col("c").cast("double") / col("n").cast("double")).as("value"))
    baseRows.unionByName(langRows).orderBy("metric")
  }

  /** Order-invariant dataset content fingerprint — the reproducibility
    * primitive of dataset versioning: an integer digest per source
    * plus the corpus rollup, computed as the exact-decimal SUM of a
    * 48-bit md5 prefix over each row's canonical string. Addition is
    * commutative, so the digest is independent of partitioning, task
    * order, and file layout — two builds of "the same" dataset compare
    * by one tiny table (the rows a `diff` would need 100 TB to check).
    * 48 bits per row keeps every per-row term exact in the oracle's
    * double-built integers while the decimal sum never wraps. One
    * narrow map + one source-keyed aggregate; flat at any scale.
    */
  def datasetHash(documents: DataFrame): DataFrame = {
    // Nullable attributes are coalesced to an explicit sentinel BEFORE
    // concatenation: concat_ws silently skips nulls (no separator
    // slot), so without the sentinel two distinct rows could collide
    // ("a", null ≡ "a") and the SQL oracle's `||` would instead
    // nullify the row, dropping it from the digest — either failure
    // silently corrupts a reproducibility primitive. doc_id and the
    // derived n_chars/md5(text) are the table's non-null key/metric
    // columns.
    val canon = concat_ws("|", col("doc_id").cast("string"),
      coalesce(col("lang"), lit("\\N")),
      coalesce(col("source"), lit("\\N")),
      col("n_chars").cast("string"), md5(col("text")))
    val rowH = conv(substring(md5(canon), 1, 12), 16, 10).cast("long")
    val perSource = documents
      .select(col("source"), rowH.as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast(DecimalType(38, 0))).as("digest"))
    perSource.unionByName(
        perSource.groupBy(lit("__all__").as("source"))
          .agg(sum(col("n_rows")).as("n_rows"), sum(col("digest")).as("digest")))
      .select(col("source"), col("n_rows"),
        col("digest").cast("string").as("digest"))
      .orderBy("source")
  }

  /** Deterministic exact-k uniform sample per stratum — "give me
    * exactly 40 docs per language, reproducibly" — via BOTTOM-k by
    * md5 priority through the bounded [[graft.functions.TopKAgg]]
    * aggregate. The hash priority makes the draw uniform AND stable
    * across engines/reruns (same property as [[splitAssign]]); the
    * aggregate makes it scale: the usual row_number window shuffles
    * and sorts the whole corpus per stratum, while this map-side
    * combines to ≤ k (priority, id) pairs per stratum per partition —
    * at 100 TB the exchange carries strata×k rows, not the corpus.
    * TopKAgg ranks score DESC, so the negated priority yields
    * ascending-hash order; ties are impossible below 2³² draws per
    * stratum (and break on id, matching the oracle's ORDER BY).
    */
  def bottomKSample(documents: DataFrame, k: Int = 40): DataFrame = {
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    documents
      .withColumn("neg_u", -u.cast("double")) // < 2^32: exact in double
      .groupBy("lang")
      .agg(GraftFunctions.top_k_agg(col("neg_u"), col("doc_id"), k).as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).as("rnk"),
        col("col.id").as("doc_id"),
        (-col("col.score")).cast("long").as("priority"))
      .orderBy("lang", "rnk")
  }

  /** Power-of-two length-bucketed corpus histogram — the batch-shape
    * planner of a training pipeline (padding waste is minimized by
    * batching sequences of similar length, and the bucket census
    * decides the batch sizes per bucket). The bucket is the largest
    * power of two ≤ token count, computed in INTEGER space as
    * `1 << (len(bin(n)) − 1)` — the binary-string length IS
    * floor(log2)+1, identical on both engines, with none of the
    * float-log edge cases (`floor(log2(8))` via doubles can land on 2
    * depending on the libm). Zero-token docs pool in bucket 0. Narrow
    * per-row map + ONE low-cardinality shuffle (≤ ~40 buckets ever,
    * since bucket count is logarithmic in max doc length).
    */
  def lengthBuckets(documents: DataFrame): DataFrame = {
    val nTok = size(TextOps.toksCol).cast("long")
    documents
      .select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("bucket", when(col("n_tokens") === 0L, lit(0L))
        .otherwise(expr(
          "shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens)) - 1)")
          .cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("bucket")
  }

  /** Deterministic WEIGHTED sample — Efraimidis–Spirakis A-ES: every
    * doc draws a reproducible uniform u ∈ (0,1] from the md5 of its
    * id (the repo-wide seedless-determinism idiom) and the k docs
    * with the largest u^(1/w) win, which is exactly weighted sampling
    * without replacement. Computed in the log domain (ln u / w — same
    * argmax, no tiny-power underflow) and rounded to 12 dp before
    * ranking, the repo's ulp barrier for libm functions (ln is not
    * required to be correctly rounded and may differ in the last bit
    * across engines). Weight = chars (length-proportional inclusion —
    * the token-budget-fair sampling a corpus subset wants); swap the
    * weight column for quality scores for quality-weighted draws.
    * Plan: narrow per-row keying, then ONE global bounded
    * [[graft.functions.TopKAgg]] heap (single group, map-side
    * combined, ≤ k rows per partition cross the exchange) — no global
    * sort of the corpus, the 100 TB shape of top-k sampling.
    */
  def weightedSample(documents: DataFrame, k: Int = 200): DataFrame = {
    val h32 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h32 + 1.0d) / lit(4294967296.0d)
    val w = greatest(col("n_chars").cast("double"), lit(1.0d))
    documents
      .select(col("doc_id"), round(log(u) / w, 12).as("es_key"))
      .agg(GraftFunctions.top_k_agg(col("es_key"), col("doc_id"), k).as("tk"))
      .select(posexplode(col("tk")))
      .select(col("col.id").as("doc_id"), (col("pos") + 1).as("rnk"),
        col("col.score").as("es_key"))
      .orderBy("rnk")
  }

  /** Temperature-scaled mixture weights — the multilingual sampling
    * formula (share^α renormalized, α < 1 upsamples the tail): the
    * standard answer to "English is 60% of the corpus but must not be
    * 60% of training". Two group-scale aggregates (per-lang token
    * sums, then the normalizer) stitched with single-row broadcasts.
    * Engine parity: `pow` is a libm call with no correct-rounding
    * guarantee, so each share^α rounds to 12 dp FIRST and the
    * normalizer sums those rounded terms in exact DECIMAL(24,14) (the
    * a28 PSI discipline) — the division then sees identical inputs on
    * both engines.
    */
  def temperatureMixture(documents: DataFrame, alpha: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = documents.groupBy("lang")
      .agg(sum(expr("length(text) div 4")).as("est_tokens"))
    val tot = counts.agg(sum(col("est_tokens")).as("total_tokens"))
    val withPa = counts.crossJoin(broadcast(tot)) // single-row total
      .withColumn("pa", round(pow(
        col("est_tokens").cast("double") / col("total_tokens").cast("double"),
        lit(alpha)), 12))
    val z = withPa.agg(sum(col("pa").cast(DecimalType(24, 14))).as("z"))
    withPa.crossJoin(broadcast(z)) // single-row normalizer
      .select(col("lang"), col("est_tokens"),
        round(col("est_tokens").cast("double") /
          col("total_tokens").cast("double"), 12).as("p_raw"),
        round(col("pa") / col("z").cast("double"), 12).as("p_temp"))
      .orderBy("lang")
  }

  /** Epoch/repetition plan under a token budget — the "how many
    * epochs of each source fit" arithmetic every corpus-mixing run
    * starts from (cf. the repetition-budget analyses in the data-
    * constrained-scaling literature): the budget is `budgetEpochs`×
    * the whole corpus, split UNIFORMLY across sources, and each
    * source repeats up to `maxEpochs` before its surplus is stranded.
    * One corpus pass sums exact whitespace-token counts per source
    * (BIGINT, order-free); the per-source plan is then pure IEEE
    * arithmetic over a source-cardinality-bounded table against the
    * broadcast single-row total — division/multiplication/floor are
    * exactly-rounded on both engines, so no per-term decimal staging
    * is needed (contrast the ln/pow operators).
    */
  def epochPlan(documents: DataFrame, budgetEpochs: Int = 2,
      maxEpochs: Double = 4.0): DataFrame = {
    val perSource = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.toksCol).cast("long")).as("tokens"))
    val tot = perSource.agg(sum(col("tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    val budget = lit(budgetEpochs.toLong) * col("total_tokens")
    val target = budget.cast("double") / col("n_sources").cast("double")
    val epochs = least(lit(maxEpochs), target / col("tokens").cast("double"))
    perSource.crossJoin(broadcast(tot)) // single row
      .select(col("source"), col("n_docs"), col("tokens"),
        round(epochs, 9).as("epochs"),
        floor(epochs * col("tokens").cast("double")).cast("long")
          .as("realized_tokens"),
        round(floor(epochs * col("tokens").cast("double")) /
          budget.cast("double"), 9).as("budget_share"))
      .orderBy("source")
  }

  /** Survivor-policy sensitivity: across the near-dup components, how
    * often does "keep the lowest doc_id" (the reproducible default)
    * pick a DIFFERENT survivor than "keep the longest document" (the
    * quality-first policy, ties to the lowest id)? High disagreement
    * means the corpus's dedup output genuinely depends on the policy
    * knob — the audit a release manager wants before declaring
    * survivor choice "arbitrary". Components come from the shared
    * verified pair graph; both argmins fold as component-keyed
    * aggregates (the longest-doc pick via max(struct(len, -id)), the
    * engine-exact argmax idiom), so nothing here exceeds
    * candidate-component scale.
    */
  def survivorPolicySensitivity(documents: DataFrame,
      pairs: DataFrame): DataFrame = {
    val comp = GraphOps.connectedComponents(pairs)
    val cm = comp.join(
      documents.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val byId = cm.groupBy(col("component"))
      .agg(min(col("doc_id")).as("s_min"))
    val byQ = cm.groupBy(col("component"))
      .agg(max(struct(col("n_chars").cast("long").as("c"),
        (-col("doc_id")).as("nid"))).as("w"))
      .select(col("component"), (-col("w.nid")).as("s_q"))
    byId.join(byQ, "component")
      .agg(count(lit(1)).as("n_components"),
        sum(when(col("s_min") =!= col("s_q"), 1L).otherwise(0L))
          .as("n_disagree"))
      .select(col("n_components"), col("n_disagree"),
        round(col("n_disagree").cast("double") /
          col("n_components").cast("double"), 9).as("disagree_share"))
  }

  /** Shard load-balance audit over the [[shardShuffle]] assignment:
    * per shard, document count, exact token mass, and the load ratio
    * against the uniform share — the straggler predictor every
    * training run reads before launch (a 1.3× shard finishes 30%
    * late no matter how many workers you add). One corpus pass sums
    * exact BIGINT token counts into a shard-cardinality aggregate
    * plus one broadcast single-row total.
    */
  def shardBalance(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val key = ((col("doc_id") % lit(1000003L)) * lit(1103515245L) +
      lit(12345L)) % lit(2147483648L)
    val perShard = documents
      .select((key % lit(nShards.toLong)).as("shard"),
        size(TextOps.toksCol).cast("long").as("tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
    val tot = perShard.agg(sum(col("tokens")).as("total_tokens"))
    perShard.crossJoin(broadcast(tot)) // single row
      .select(col("shard"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") /
          (col("total_tokens").cast("double") / lit(nShards.toDouble)), 9)
          .as("load_ratio"))
      .orderBy("shard")
  }

  /** Survivor-bias audit: does keep-lowest-id dedup make the corpus
    * SHORTER on average? Compares mean document length across the
    * three populations a dedup pass creates — untouched docs,
    * surviving component roots, and dropped members — in one row.
    * A large survivor-vs-dropped gap says the arbitrary id policy is
    * systematically picking a different document than quality-first
    * would (cf. [[survivorPolicySensitivity]], which counts the
    * disagreements; this measures their direction). Components come
    * from the shared pair graph; the census is three conditional
    * exact-integer sums over a doc-scale left join.
    */
  def survivorBias(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = GraphOps.connectedComponents(pairs)
      .withColumn("is_root", col("doc_id") === col("component"))
    val tagged = documents.select(col("doc_id"),
        col("n_chars").cast("long").as("len"))
      .join(comp, Seq("doc_id"), "left_outer")
      .select(col("len"),
        when(col("component").isNull, "untouched")
          .when(col("is_root"), "survivor")
          .otherwise("dropped").as("pop"))
    val g = tagged.groupBy(col("pop"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("chars"))
    g.select(col("pop"), col("n_docs"),
        round(col("chars").cast("double") / col("n_docs").cast("double"), 9)
          .as("mean_chars"))
      .orderBy("pop")
  }

  /** Quality-vs-quantity tradeoff curve: for each candidate quality
    * cutoff, how many documents and what share of the corpus' TOKENS
    * a [[graft.operators.TextOps.qualityModelScore]] gate would
    * retain — the table that turns "filter harder" from a vibe into a
    * priced decision. The linear-model score computes once per row
    * (the text_quality feature shapes, identical IEEE on both
    * engines); every cutoff is a conditional sum over that one pass.
    */
  def qualitySweep(documents: DataFrame,
      cutoffs: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4)): DataFrame = {
    val scored = TextOps.qualityModelScore(documents)
      .select(col("q_score"), col("doc_id"))
      .join(documents.select(col("doc_id"),
        size(TextOps.toksCol).cast("long").as("tok")), Seq("doc_id"))
    val sums = count(lit(1)).as("n_docs") +:
      sum(col("tok")).as("total_tokens") +:
      cutoffs.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(col("q_score") >= c, 1L).otherwise(0L)).as(s"k$i"),
        sum(when(col("q_score") >= c, col("tok")).otherwise(0L))
          .as(s"t$i"))
      }
    val agg = scored.agg(sums.head, sums.tail: _*)
    val rows = cutoffs.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("cutoff"), col(s"k$i").as("n_kept"),
        round(col(s"k$i").cast("double") / col("n_docs").cast("double"), 9)
          .as("doc_share"),
        round(col(s"t$i").cast("double") /
          col("total_tokens").cast("double"), 9).as("token_share"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.cutoff").as("cutoff"), col("r.n_kept").as("n_kept"),
        col("r.doc_share").as("doc_share"),
        col("r.token_share").as("token_share"))
      .orderBy("cutoff")
  }

  /** Context-window census: for each candidate serving/training
    * window length, how many documents overflow it and what fraction
    * of the corpus' tokens a hard truncation would discard — the
    * table that prices "just truncate" against "chunk properly"
    * ([[chunkTokens]]) per window size. One narrow token-count pass;
    * each limit is a conditional sum over the same per-doc counts
    * (no per-limit re-scan), then one broadcast single-row total.
    */
  def contextWindowCensus(documents: DataFrame,
      limits: Seq[Int] = Seq(512, 2048, 8192)): DataFrame = {
    val perDoc = documents
      .select(size(TextOps.toksCol).cast("long").as("tok"))
    val sums = count(lit(1)).as("n_docs") +:
      sum(col("tok")).as("total_tokens") +:
      limits.flatMap(l => Seq(
        sum(when(col("tok") > l, 1L).otherwise(0L)).as(s"over_$l"),
        sum(when(col("tok") > l, col("tok") - l).otherwise(0L))
          .as(s"waste_$l")))
    val agg = perDoc.agg(sums.head, sums.tail: _*)
    val rows = limits.map(l => struct(lit(l).as("window_len"),
      col(s"over_$l").as("n_over"),
      round(col(s"over_$l").cast("double") / col("n_docs").cast("double"), 9)
        .as("share_over"),
      round(col(s"waste_$l").cast("double") /
        col("total_tokens").cast("double"), 9).as("waste_share")))
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.window_len").as("window_len"),
        col("r.n_over").as("n_over"),
        col("r.share_over").as("share_over"),
        col("r.waste_share").as("waste_share"))
      .orderBy("window_len")
  }

  /** Collection novelty curve — the marginal-value-of-more-data
    * readout: bucket the corpus into ten collection batches (by
    * doc_id range, the arrival proxy) and measure, per batch, what
    * fraction of its distinct word-trigram shingles no EARLIER batch
    * contributed. A flattening curve says new data is mostly
    * repeating old data — the empirical basis for dedup-aware
    * collection budgeting. First-occurrence folds as a min-bucket
    * aggregate over the (bucket, shingle) distinct frame: two keyed
    * aggregates over the shingle exchange every dedup operator
    * already rides, no corpus-scale window anywhere (the bucket
    * boundary is one broadcast max).
    */
  def noveltyCurve(documents: DataFrame, buckets: Int = 10): DataFrame = {
    val mx = documents.agg(max(col("doc_id")).as("mx"))
    val b = DedupOps.shingleRows(documents)
      .crossJoin(broadcast(mx)) // single row
      .select(least(lit(buckets - 1),
        expr(s"doc_id * $buckets div (mx + 1)")).cast("int").as("bucket"),
        col("sh"))
      .distinct()
    val perBucket = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_shingles"))
    val novel = b.groupBy(col("sh")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_novel"))
    perBucket.join(novel, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_shingles").cast("double"), 9).as("novelty_rate"))
      .orderBy("bucket")
  }
}
