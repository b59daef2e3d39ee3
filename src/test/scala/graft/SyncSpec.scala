package graft

import java.sql.{Connection, DriverManager, Timestamp}
import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import graft.sink.DerbyDialect
import graft.sync.{IncrementalSync, SyncConfig, SyncResult, SyncStateStore}

/** End-to-end CDC loop against embedded Derby (the JDBC database that
  * ships with Spark): state machine C3-C6, incremental transaction C1,
  * zero-delta C2, idempotent re-application, watermark-from-landed-data
  * A2, soft-delete propagation J2. PostgreSQL SQL generation is covered
  * separately by golden-string tests in SinkSqlSpec.
  */
class SyncSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private var conn: Connection = _
  private var state: SyncStateStore = _
  private var sync: IncrementalSync = _
  private val dialect = new DerbyDialect

  private def ts(s: String) = Timestamp.valueOf(s)

  override def beforeAll(): Unit = {
    super.beforeAll()
    conn = DriverManager.getConnection("jdbc:derby:memory:syncspec;create=true")
    conn.setAutoCommit(false)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE "contacts" (
        |  "pk" BIGINT NOT NULL PRIMARY KEY,
        |  "name" VARCHAR(80),
        |  "amount" DOUBLE,
        |  "modstamp" TIMESTAMP,
        |  "is_deleted" BOOLEAN
        |)""".stripMargin)
    st.close()
    state = new SyncStateStore(conn)
    state.install()
    state.register("contacts", ts("2024-01-01 00:00:00"))
    conn.commit()
    sync = new IncrementalSync(conn, dialect, state)
  }

  override def afterAll(): Unit = {
    try conn.close() catch { case _: Throwable => () }
    super.afterAll()
  }

  private val cfg = SyncConfig("contacts", "pk", "modstamp", Some("is_deleted"))

  private def delta(rows: (Long, String, Double, String, Boolean)*): DataFrame =
    rows.map { case (pk, n, a, t, d) => (pk, n, a, ts(t), d) }
      .toDF("pk", "name", "amount", "modstamp", "is_deleted")

  private def destRows(): Seq[(Long, String, Double)] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery("""SELECT "pk", "name", "amount" FROM "contacts" ORDER BY "pk"""")
      val out = Seq.newBuilder[(Long, String, Double)]
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
      out.result()
    } finally st.close()
  }

  test("initial delta lands, watermark advances to max(landed ts)") {
    val r = sync.syncTable(cfg, wm => {
      assert(wm.contains(ts("2024-01-01 00:00:00")))
      delta(
        (1L, "ann", 10.0, "2024-01-02 08:00:00", false),
        (2L, "bob", 20.0, "2024-01-02 09:30:00", false))
    })
    assert(r.isInstanceOf[SyncResult.Merged])
    assert(destRows() == Seq((1L, "ann", 10.0), (2L, "bob", 20.0)))
    assert(state.get("contacts").flatMap(_.syncuntil).contains(ts("2024-01-02 09:30:00")))
    assert(state.get("contacts").exists(_.status == "ready"))
  }

  test("second round: upsert + soft delete in one transaction") {
    val r = sync.syncTable(cfg, _ => delta(
      (2L, "bob2", 25.0, "2024-01-03 10:00:00", false),
      (1L, "ann", 10.0, "2024-01-03 11:00:00", true),   // delete
      (3L, "cid", 30.0, "2024-01-03 09:00:00", false)))
    assert(r.isInstanceOf[SyncResult.Merged])
    assert(destRows() == Seq((2L, "bob2", 25.0), (3L, "cid", 30.0)))
  }

  test("re-applying an already-landed delta is idempotent") {
    val before = destRows()
    sync.syncTable(cfg, _ => delta(
      (2L, "bob2", 25.0, "2024-01-03 10:00:00", false),
      (3L, "cid", 30.0, "2024-01-03 09:00:00", false)))
    assert(destRows() == before)
  }

  test("zero delta takes the fast path: no writes, state touched") {
    val r = sync.syncTable(cfg, _ => delta().filter($"pk" < 0))
    assert(r == SyncResult.NoChange)
  }

  test("COPY stager: pgsf CSV payload streams correctly; no-PG falls back") {
    val df = Seq((1L, Option("a\"b"), Option(true)), (2L, None, None))
      .toDF("pk", "name", "flag")
    val reader = graft.sink.CopyStager.csvReader(df)
    val text = {
      val sb = new StringBuilder; val buf = new Array[Char](7)
      var n = reader.read(buf, 0, buf.length)
      while (n >= 0) { sb.appendAll(buf, 0, n); n = reader.read(buf, 0, buf.length) }
      sb.result()
    }
    // T1 encoding: header, quote doubling, t/f booleans, NULL as empty
    assert(text ==
      "\"pk\",\"name\",\"flag\"\n1,\"a\"\"b\",t\n2,,\n")
    // this build has no PostgreSQL driver: the reflective seam reports
    // None on a Derby connection and loads take the INSERT path
    assert(graft.sink.CopyStager.copyInto(conn,
      "COPY x FROM STDIN", df).isEmpty)
  }

  test("oversized delta preflight switches to full reload without fetching") {
    // wire-count says 1M rows pending: poll path must stop BEFORE
    // fetching and hand control to the bulk path (README.rst:68)
    var countedFrom: Option[Timestamp] = None
    val r = sync.syncTable(cfg,
      _ => fail("preflight must prevent the fetch"),
      countDelta = Some { wm => countedFrom = wm; 1000000L },
      maxDeltaRows = 50000L)
    assert(r == SyncResult.NeedsFullReload(1000000L))
    assert(countedFrom.isDefined) // counted WITH the watermark predicate
    assert(state.get("contacts").exists(_.status == "ready")) // lock released
    // a small delta sails through the same preflight
    val r2 = sync.syncTable(cfg, _ => delta().filter($"pk" < 0),
      countDelta = Some(_ => 10L), maxDeltaRows = 50000L)
    assert(r2 == SyncResult.NoChange)
  }

  test("lock is exclusive: running table refuses a second sync") {
    assert(state.tryLock("contacts"))
    conn.commit()
    val r = sync.syncTable(cfg, _ => fail("should not fetch"))
    assert(r == SyncResult.LockBusy)
    state.recoverAll() // C6
    conn.commit()
    assert(state.get("contacts").exists(_.status == "ready"))
  }

  test("failure marks error state and halts future syncs") {
    intercept[RuntimeException] {
      sync.syncTable(cfg, _ => throw new RuntimeException("source down"))
    }
    assert(state.get("contacts").exists(_.status == "error"))
    assert(sync.syncTable(cfg, _ => fail("must not run")) == SyncResult.LockBusy)
    state.recoverAll()
    conn.commit()
    // recoverAll only clears stale 'running' locks, not 'error'
    assert(state.get("contacts").exists(_.status == "error"))
    state.register("contacts", ts("2024-01-03 11:00:00"))
    conn.commit()
  }

  test("dueTables respects refresh cadence") {
    state.register("t_due", ts("2024-01-01 00:00:00"), refreshMinutes = 10)
    state.register("t_fresh", ts("2024-01-01 00:00:00"), refreshMinutes = 100000)
    conn.commit()
    // last_refresh was just set by register; t_due is due 10 min later
    val now = new Timestamp(System.currentTimeMillis() + 11 * 60 * 1000)
    val due = state.dueTables(now)
    assert(due.contains("t_due"))
    assert(!due.contains("t_fresh"))
  }

  test("parallel staging: executors insert partitions, merge stays one txn") {
    // fresh IncrementalSync with the URL so executor tasks can connect
    val psync = new graft.sync.IncrementalSync(conn, dialect, state,
      Some("jdbc:derby:memory:syncspec"))
    val pcfg = cfg.copy(parallelStaging = true)
    val r = psync.syncTable(pcfg, _ => delta(
      (20L, "p1", 1.0, "2024-01-05 00:00:00", false),
      (21L, "p2", 2.0, "2024-01-05 00:00:01", false),
      (2L, "bob3", 26.0, "2024-01-05 00:00:02", false)).repartition(3))
    assert(r.isInstanceOf[SyncResult.Merged])
    val rows = destRows()
    assert(rows.exists(_ == (20L, "p1", 1.0)))
    assert(rows.exists(_ == (21L, "p2", 2.0)))
    assert(rows.exists(_ == (2L, "bob3", 26.0)))
    assert(state.get("contacts").flatMap(_.syncuntil)
      .contains(ts("2024-01-05 00:00:02")))
  }

  test("parallelStaging fails fast when the dialect only stages session-locally") {
    val tempOnly = new graft.sink.SqlDialect {
      override def quoteIdent(n: String): String = dialect.quoteIdent(n)
      override def createStagingSql(s: String, d: String): String =
        dialect.createStagingSql(s, d)
      override def upsertSql(dest: String, staging: String, cols: Seq[String],
          pk: String, isDeleted: Option[String]): String =
        dialect.upsertSql(dest, staging, cols, pk, isDeleted)
      override def deleteSql(dest: String, staging: String, pk: String,
          isDeleted: String): String = dialect.deleteSql(dest, staging, pk, isDeleted)
      override def supportsParallelStaging: Boolean = false
    }
    val s = new graft.sync.IncrementalSync(conn, tempOnly, state,
      Some("jdbc:derby:memory:syncspec"))
    val e = intercept[IllegalArgumentException] {
      s.syncTable(cfg.copy(parallelStaging = true), _ => delta())
    }
    assert(e.getMessage.contains("cross-session"))
    // fail-fast precedes the CAS lock: the table is still lockable
    assert(state.tryLock("contacts"))
    conn.rollback() // undo the probe lock
  }

  test("delta insert-then-delete of a new PK never survives") {
    val r = sync.syncTable(cfg, _ => delta(
      (9L, "ghost", 90.0, "2024-01-04 00:00:00", false),
      (9L, "ghost", 91.0, "2024-01-04 00:00:01", true)))
    assert(r.isInstanceOf[SyncResult.Merged])
    assert(!destRows().exists(_._1 == 9L))
  }
}
