package graft.sync

import java.sql.Connection
import org.apache.spark.sql.{DataFrame, Row}
import graft.sink.SqlDialect
import graft.sources.salesforce.{BatchInfo, BulkManifest, JobInfo}

/** K2 + C4 assembled: the one-call truncate-and-load of a completed
  * bulk extract job (`csv_to_postgres.py:48-97`) ending in sync-state
  * bootstrap registration (`synctable.py:83-106`). All inside ONE
  * transaction on the driver connection:
  *
  *   1. abort on any Failed batch; refuse a zero-record job (the
  *      empty-job guard protecting the destination from a broken
  *      extract, `csv_to_postgres.py:66,91-92`);
  *   2. truncate the destination;
  *   3. load every Completed batch (F4 filter — NotProcessed chunking
  *      artifacts skipped, `csv_to_postgres.py:73-81`);
  *   4. register `__sync` with the JOB's systemModstamp — the server
  *      timestamp of the extract, never the wall clock — status ready
  *      (C4), so incremental sync takes over from exactly where the
  *      full load stopped.
  *
  * A crash anywhere rolls the whole transaction back: the destination
  * keeps its previous contents and `__sync` its previous watermark.
  *
  * Scale split: batch DataFrames stream through the driver connection
  * in JDBC batches — faithful to the reference's COPY-through-client
  * design and bounded by the job's extract size; a cluster-parallel
  * variant would write per-partition via the dialect's shared-staging
  * path (`IncrementalSync.stageFromExecutors`).
  */
object BulkLoad {

  /** @param batchData resolves one Completed batch to its rows (the
    *                   connector partition, a staged CSV, or a fixture)
    * @return rows loaded
    */
  def bulkLoad(job: JobInfo, cfg: SyncConfig, conn: Connection,
      dialect: SqlDialect, state: SyncStateStore,
      batchData: BatchInfo => DataFrame): Long = {
    val failed = BulkManifest.failedBatches(job)
    require(failed.isEmpty,
      s"bulk job ${job.id} has failed batches: ${failed.map(_.id).mkString(", ")}")
    BulkManifest.requireNonEmpty(job)
    val modstamp = job.systemModstamp.getOrElse(throw new IllegalArgumentException(
      s"bulk job ${job.id} carries no systemModstamp — cannot register sync state"))
    val dest = dialect.qualified(cfg.schema, cfg.tablename)
    try {
      exec(conn, dialect.truncateSql(dest))
      var total = 0L
      BulkManifest.loadableBatches(job).foreach { b =>
        total += insertRows(conn, dialect, dest, batchData(b))
      }
      state.register(cfg.tablename, modstamp)
      conn.commit() // truncate + load + C4 registration: atomic
      total
    } catch {
      case e: Throwable =>
        conn.rollback()
        throw e
    }
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  /** Loads one batch through the driver connection: the dialect's COPY
    * fast path when the wire protocol offers one
    * (`csv_to_postgres.py:86-89`), else 1000-row batched INSERTs.
    */
  private def insertRows(conn: Connection, dialect: SqlDialect,
      dest: String, df: DataFrame): Long = {
    val cols = df.columns.toSeq
    // FORCE_NULL only for NON-STRING nullable columns: encodeRow emits
    // NULL as an unquoted empty field and '' as a quoted one, but
    // FORCE_NULL erases that distinction (quoted empty → NULL too), so
    // string columns under COPY would diverge from the batched-INSERT
    // fallback (which stores ''). Non-string types have no empty-string
    // value, so FORCE_NULL is exactly the null-restoration they need.
    dialect.copyInSql(dest, cols,
        df.schema.fields.filter(f => f.nullable &&
          f.dataType != org.apache.spark.sql.types.StringType).map(_.name).toSeq)
      .flatMap(sql => graft.sink.CopyStager.copyInto(conn, sql, df))
      .getOrElse {
        val sql = s"INSERT INTO $dest (${cols.map(dialect.quoteIdent).mkString(", ")})" +
          s" VALUES (${cols.map(_ => "?").mkString(", ")})"
        val ps = conn.prepareStatement(sql)
        try {
          var count = 0L
          df.toLocalIterator().forEachRemaining { row: Row =>
            cols.indices.foreach(i => ps.setObject(i + 1, row.get(i)))
            ps.addBatch()
            count += 1
            if (count % 1000 == 0) ps.executeBatch()
          }
          ps.executeBatch()
          count
        } finally ps.close()
      }
  }
}
