package graft.operators

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File/JDBC source-sink surface (SURVEY.md §2.1 S4/S5/K4, §2.4 T2). */
object FileOps {

  /** S4+K4+T2 — staged CSV round trip in the reference dialect (header
    * row, `,` delimiter, `"` quote doubled): writing then reading is
    * canonicalizing by construction (`upload_table.py:29-40`). Schema is
    * pinned explicitly on read — never inferred — matching the
    * reference's describe-driven typing.
    */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, stagingDir: String): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")   // "" doubling, pgsf/COPY dialect
      .csv(stagingDir)
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .schema(df.schema)
      .csv(stagingDir)
  }

  /** S5 — catalog scan over a JDBC database (the reference reads
    * `information_schema.columns`, `tabledesc.py:79-94`; embedded Derby
    * exposes the same shape via SYS.SYSCOLUMNS⋈SYSTABLES).
    */
  def jdbcCatalogColumns(spark: SparkSession, url: String,
      tableName: String): DataFrame = {
    // literal-escape the name (Spark's JDBC source has no bind
    // parameters for `query`) and reject identifiers no catalog could
    // contain — user input must not reach the SQL text raw
    require(tableName.matches("[A-Za-z0-9_$.]{1,128}"),
      s"suspicious catalog table name: '$tableName'")
    val q =
      s"""SELECT c.COLUMNNAME AS "column_name",
         |       CAST(c.COLUMNNUMBER AS INT) AS "ordinal_position"
         |FROM SYS.SYSCOLUMNS c
         |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
         |WHERE t.TABLENAME = '${tableName.replace("'", "''")}'""".stripMargin
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", q)
      .load()
      .orderBy("ordinal_position")
  }

  /** Seed an embedded-Derby table for the catalog-scan demo; idempotent. */
  def seedDerbyCatalogDemo(url: String, tableName: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(
        s"""CREATE TABLE $tableName (
           |  "Id" VARCHAR(18) NOT NULL PRIMARY KEY,
           |  "Name" VARCHAR(80),
           |  "Amount" DECIMAL(18,2),
           |  "SystemModstamp" TIMESTAMP
           |)""".stripMargin)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    } finally conn.close()
  }
}
