package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CDC merge core (SURVEY.md §2.3/§2.5): last-write-wins upsert of a
  * delta batch into a base table on the PK, soft-delete propagation, and
  * within-batch dedup. This is the reference's
  * `INSERT … ON CONFLICT DO UPDATE` + `DELETE … WHERE IsDeleted`
  * (`query_poll_table.py:107-152`) re-expressed as a single-shuffle
  * full-outer-join rewrite.
  *
  * Scale posture: one shuffle on the PK for the join (AQE handles skew);
  * the within-batch dedup window shuffles only the (small) delta. Delete
  * ordering matters — a PK inserted then soft-deleted inside one delta
  * must vanish (`query_poll_table.py:119-152`), which the last-wins dedup
  * + post-merge filter preserves.
  */
object MergeOps {

  /** J4 — at most one row per PK survives; later timestamp wins, with a
    * deterministic tiebreak column list (reference: later page wins,
    * consequence of `query_poll_table.py:124-127`).
    */
  def dedupLastWins(delta: DataFrame, pk: String, ts: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val ordering = (col(ts).desc +: tiebreak.map(col(_).desc))
    val w = Window.partitionBy(col(pk)).orderBy(ordering: _*)
    delta.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** J1 — upsert merge: delta row wins wholesale when the PK collides
    * (ON CONFLICT … SET (cols) = (EXCLUDED.cols) updates every column,
    * `query_poll_table.py:124-127`). Columns = base's columns; the delta
    * must carry all of them (plus optionally the soft-delete flag).
    */
  def upsert(base: DataFrame, delta: DataFrame, pk: String): DataFrame = {
    val cols = base.columns
    val d = delta.select(cols.map(c => col(c).as(s"__d_$c")): _*)
    base.join(d, col(pk) === col(s"__d_$pk"), "full_outer")
      .select(cols.map { c =>
        when(col(s"__d_$pk").isNotNull, col(s"__d_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** J1+J2 — full merge transaction body: dedup delta, upsert, then
    * propagate soft deletes (delete AFTER upsert, same transaction —
    * `query_poll_table.py:119-152`). `isDeleted` names a boolean column
    * of the delta; rows whose final image is deleted are dropped.
    */
  def merge(base: DataFrame, delta: DataFrame, pk: String, ts: String,
      isDeleted: Option[String] = None): DataFrame = {
    val deduped = dedupLastWins(delta, pk, ts)
    isDeleted match {
      case None => upsert(base, deduped, pk)
      case Some(flag) =>
        // Upsert ALL delta rows first (deleted rows included — faithful
        // to the reference's insert-then-delete ordering), then anti-join
        // away PKs whose latest delta image is deleted.
        val withFlag = base.columns :+ flag
        val baseFlagged = base.withColumn(flag, lit(false))
        val merged = upsert(baseFlagged, deduped.select(withFlag.map(col): _*), pk)
        merged.filter(!coalesce(col(flag), lit(false))).drop(flag)
    }
  }

  /** C2 — zero-delta fast path: nothing to merge, base unchanged
    * (`query_poll_table.py:165-168`). `delta.isEmpty` triggers one cheap
    * job over the delta only; at scale the delta is the small side.
    */
  def mergeIfNonEmpty(base: DataFrame, delta: DataFrame, pk: String, ts: String,
      isDeleted: Option[String] = None): DataFrame =
    if (delta.isEmpty) base else merge(base, delta, pk, ts, isDeleted)

  /** Per-chunk content digest: rows bucket into PK ranges of
    * `chunkSize`, each row hashes to an md5-derived 32-bit value, and
    * the chunk digest is the SUM of row hashes — order-free, so
    * partial aggregation combines map-side and no sort ever happens.
    * md5 over a `concat_ws('|', …)` of stringified columns keeps the
    * digest engine-independent (the repo's cross-engine hash
    * primitive); doubles must be decimal-cast by the caller so both
    * engines render identical strings.
    *
    * NULL discipline: `concat_ws` SKIPS nulls on Spark — ('a', NULL,
    * 'b') would collide with ('a', 'b', NULL), and a null-PROPAGATING
    * oracle (`'||'` concatenation → NULL md5 dropped from the SUM)
    * would diverge silently. Every hash column is therefore coalesced
    * to a `\u0001` sentinel after stringification; a cross-engine
    * oracle must mirror it as `coalesce(CAST(c AS VARCHAR), chr(1))`.
    * Like the decimal-cast caveat, values containing a raw `\u0001`
    * byte are out of contract. Output is one tiny row per chunk
    * regardless of table size.
    */
  def chunkDigests(df: DataFrame, keyCol: String, hashCols: Seq[Column],
      chunkSize: Long): DataFrame = {
    val cols = hashCols.map(c => coalesce(c.cast("string"), lit("\u0001")))
    df.select(expr(s"$keyCol div $chunkSize").as("chunk"),
        conv(substring(md5(concat_ws("|", cols: _*)), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy("chunk")
      .agg(sum(col("h")).as("digest"), count(lit(1)).as("n_rows"))
  }

  /** Sync drift check — the CDC validation primitive (reference flow:
    * continuous SF→PG replication with no built-in consistency proof;
    * cf. `query_poll_table.py`'s idempotent-merge assumption). Compare
    * [[chunkDigests]] of source and target and report only the chunks
    * that disagree, classified as missing on one side vs content
    * drift. At 100 TB each side is one full scan collapsing to
    * #chunks rows before the join — the repair step then re-syncs
    * ONLY the flagged PK ranges instead of the whole table.
    */
  def driftCheck(source: DataFrame, target: DataFrame, keyCol: String,
      hashCols: Seq[Column], chunkSize: Long): DataFrame = {
    val s = chunkDigests(source, keyCol, hashCols, chunkSize)
      .withColumnRenamed("digest", "digest_src")
      .withColumnRenamed("n_rows", "n_src")
    val t = chunkDigests(target, keyCol, hashCols, chunkSize)
      .withColumnRenamed("digest", "digest_tgt")
      .withColumnRenamed("n_rows", "n_tgt")
    s.join(t, Seq("chunk"), "full_outer")
      .filter(col("digest_src").isNull || col("digest_tgt").isNull ||
        col("digest_src") =!= col("digest_tgt") || col("n_src") =!= col("n_tgt"))
      .select(col("chunk"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"),
        when(col("digest_src").isNull, lit("missing_in_source"))
          .when(col("digest_tgt").isNull, lit("missing_in_target"))
          .otherwise(lit("content_drift")).as("status"))
      .orderBy("chunk")
  }

  /** SCD Type-2 history build — the warehouse-dimension complement of
    * the CDC merge: collapse each key's attribute stream into
    * effective-dated rows (`valid_from`, `valid_to`, `is_current`),
    * keeping a row only where the tracked attribute CHANGED from its
    * predecessor. Two window passes over ONE (key, time) partitioning
    * — Catalyst reuses the single exchange+sort for the change filter
    * (lag) and the range stitch (lead) — so the whole dimension build
    * is one shuffle at any scale. Ordering ties break on the event id
    * (total order), and the open row is exactly the one with no
    * successor.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_t", lag(col("event_type"), 1).over(w))
      .filter(col("prev_t").isNull || col("event_type") =!= col("prev_t"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("status"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Partial-aggregate snapshot for incremental materialized-view
    * maintenance: (event_type, day) → exact count + exact decimal sum.
    * Counts and decimal sums are COMMUTATIVE MONOID state — two
    * snapshots over disjoint row sets merge by addition into the
    * snapshot of the union, which is what lets a 100 TB rollup stay
    * fresh by aggregating ONLY each day's delta and merging, never
    * rescanning the base. (Avg/extrema derive from the same state;
    * non-distributive aggregates need sketch state — see the HLL/KLL
    * aggregates in [[graft.functions]].)
    */
  def mvPartials(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("sval"))

  /** Combine two partial-aggregate snapshots into one, STAYING in
    * partials shape (exact decimal `sval`, pinned to DECIMAL(28,2) so
    * every merged generation round-trips parquet with one schema):
    * full-outer on the group key, fields add (absent side = identity
    * 0). One shuffle on the MV key — whose cardinality is the GROUP
    * count, not the row count, so at 100 TB this touches megabytes
    * while the naive refresh rescans the base. Correctness does not
    * depend on the delta cut falling on a group boundary: a day split
    * mid-stream across base and delta merges to the exact
    * full-recompute row.
    */
  def mvCombine(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val acc = org.apache.spark.sql.types.DecimalType(28, 2)
    val zero = lit(0).cast(acc)
    val d = delta
      .withColumnRenamed("cnt", "d_cnt").withColumnRenamed("sval", "d_sval")
    snapshot.join(d, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("sval").cast(acc), zero) +
          coalesce(col("d_sval").cast(acc), zero)).cast(acc).as("sval"))
  }

  /** Serve a partials snapshot: exact decimal accumulator → the
    * consumer-facing double, ordered on the MV key.
    */
  def mvFinalize(partials: DataFrame): DataFrame =
    partials.select(col("event_type"), col("day"), col("cnt"),
        col("sval").cast("double").as("sum_value"))
      .orderBy("event_type", "day")

  /** One-shot batch form: merge a delta's partials into a snapshot and
    * serve the result (see [[mvCombine]]/[[mvFinalize]]).
    */
  def mvMergeDelta(snapshot: DataFrame, delta: DataFrame): DataFrame =
    mvFinalize(mvCombine(snapshot, delta))

  /** Snapshot reconciliation census — classify every primary key
    * across two table versions as added / removed / changed /
    * unchanged (the audit step between two sync runs, and the
    * validation pass after a backfill). ONE pk-keyed full outer join
    * — both sides shuffle once on the key and the census is a
    * group-4 rollup, so the plan is two scans + one exchange at any
    * scale; no per-column diffing fan-out (the compare columns fold
    * into a single struct inequality).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, pk: String,
      compareCols: Seq[String]): DataFrame = {
    val left = v1.select(col(pk).as("pk1"),
      struct(compareCols.map(col): _*).as("c1"))
    val right = v2.select(col(pk).as("pk2"),
      struct(compareCols.map(col): _*).as("c2"))
    left
      .join(right, col("pk1") === col("pk2"), "full_outer")
      .select(when(col("pk1").isNull, "added")
        .when(col("pk2").isNull, "removed")
        .when(col("c1") =!= col("c2"), "changed")
        .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }
}
