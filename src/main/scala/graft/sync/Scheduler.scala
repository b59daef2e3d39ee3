package graft.sync

import java.sql.Timestamp
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** C5/C7/C8 — the orchestration shell around IncrementalSync
  * (`sync:13-20`, `abort_refresh.py`, `delete_old_jobs_data.sh`).
  *
  * Fan-out: the reference spawns one OS process per due table; here
  * each due table gets its own sync round on a bounded thread pool,
  * tagged with a Spark job group so a table's round is cancellable
  * (C7) without touching its siblings. Each worker needs its OWN
  * JDBC connection (the reference's per-process psycopg2 singleton,
  * `pg.py:63-75`) — hence the factory.
  */
final class Scheduler(spark: SparkSession,
    mkWorker: String => SyncWorker) {

  def jobGroup(table: String): String = s"sync-$table"

  /** C5 — run every due table's sync round in parallel. Each worker is
    * closed when its table's round ends, so a long-running scheduler
    * holds at most `parallelism` connections at a time instead of
    * leaking one per due table per round.
    */
  def runDue(now: Timestamp, stateProbe: SyncStateStore,
      cfgs: Map[String, (SyncConfig, Option[Timestamp] => DataFrame)],
      parallelism: Int = 8): Map[String, SyncResult] = {
    val due = stateProbe.dueTables(now).filter(cfgs.contains)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, math.max(1, due.size))))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = due.map { table =>
      Future {
        val worker = mkWorker(table)
        try {
          spark.sparkContext.setJobGroup(jobGroup(table),
            s"incremental sync of $table", interruptOnCancel = true)
          try table -> worker.syncer.syncTable(cfgs(table)._1, cfgs(table)._2)
          finally spark.sparkContext.clearJobGroup()
        } finally worker.close()
      }
    }
    try Await.result(Future.sequence(futures), Duration.Inf).toMap
    finally pool.shutdown()
  }

  /** C7 — abort a running table: cancel its Spark jobs, then mark the
    * state row 'error' so auto-sync halts until an operator re-registers
    * (`abort_refresh.py:18-68` semantics).
    */
  def abort(table: String, state: SyncStateStore): Unit = {
    spark.sparkContext.cancelJobGroup(jobGroup(table))
    state.markError(table)
  }
}

/** A per-table sync round's resources: syncer + state store over one
  * JDBC connection (the reference's per-process psycopg2 singleton,
  * `pg.py:63-75`), plus the underlying closeables — the scheduler
  * closes them when the round completes.
  */
final case class SyncWorker(syncer: IncrementalSync, state: SyncStateStore,
    resources: AutoCloseable*) extends AutoCloseable {
  override def close(): Unit = resources.foreach { r =>
    try r.close() catch { case _: Exception => () }
  }
}

/** C8 — staging-area retention sweep (`delete_old_jobs_data.sh`). */
object StagingGc {
  def sweep(dir: java.io.File, maxAgeDays: Int,
      now: Long = System.currentTimeMillis()): Int = {
    val cutoff = now - maxAgeDays.toLong * 24 * 3600 * 1000
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val old = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.lastModified() < cutoff)
    old.foreach(rm)
    old.length
  }
}
