package graft.sink

import java.sql.Connection
import org.apache.spark.sql.DataFrame
import graft.reverse.BulkUpload

/** The PostgreSQL COPY fast path for driver-side staging loads
  * (`csv_to_postgres.py:86-89` `copy_expert`): rows stream through the
  * wire protocol as CSV — one stream instead of one batched INSERT per
  * 1000 rows. The JDBC driver is reached by reflection
  * (`org.postgresql.copy.CopyManager`), so this module carries no
  * compile-time PostgreSQL dependency; environments without the driver
  * (this build's Derby tests) report `None` and callers fall back to
  * batched INSERTs.
  */
object CopyStager {

  /** Streams `df`'s rows (driver-side iteration — the same bounded
    * scope as the INSERT path) as pgsf-encoded CSV through COPY.
    * @return rows copied, or None when the connection has no COPY
    *         protocol (caller falls back)
    */
  def copyInto(conn: Connection, copySql: String, df: DataFrame): Option[Long] =
    copyManager(conn).map { case (cm, copyInMethod) =>
      copyInMethod.invoke(cm, copySql, csvReader(df)).asInstanceOf[Long]
    }

  /** The COPY payload: header + pgsf-encoded rows (T1 encoding —
    * booleans t/f, NULL as empty, NUL stripped, ISO8601 timestamps;
    * `query_poll_table.py:21-50`), exposed as a streaming Reader so the
    * whole delta never materializes as one string.
    */
  def csvReader(df: DataFrame): java.io.Reader = new java.io.Reader {
    private val rows = df.toLocalIterator()
    private var buf: String = BulkUpload.header(df.schema) + "\n"
    private var pos = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      while (pos >= buf.length) {
        if (!rows.hasNext) return -1
        buf = BulkUpload.encodeRow(rows.next()) + "\n"
        pos = 0
      }
      val n = math.min(len, buf.length - pos)
      buf.getChars(pos, pos + n, cbuf, off)
      pos += n
      n
    }
    override def close(): Unit = ()
  }

  /** (CopyManager instance, copyIn(String, Reader) method) when the
    * PostgreSQL driver is on the classpath and `conn` unwraps to a PG
    * connection; None otherwise.
    */
  private def copyManager(conn: Connection)
      : Option[(AnyRef, java.lang.reflect.Method)] =
    try {
      val bc = Class.forName("org.postgresql.core.BaseConnection")
        .asInstanceOf[Class[AnyRef]]
      if (!conn.isWrapperFor(bc)) None
      else {
        val cmClass = Class.forName("org.postgresql.copy.CopyManager")
        val cm = cmClass.getConstructor(bc).newInstance(conn.unwrap(bc))
        val m = cmClass.getMethod("copyIn", classOf[String], classOf[java.io.Reader])
        Some(cm.asInstanceOf[AnyRef] -> m)
      }
    } catch {
      case _: ClassNotFoundException => None
      case _: java.sql.SQLException => None
    }
}
