package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provisioned parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file; at 100 TB these would be partitioned
  * directories — the read path is identical (`spark.read.parquet(dir)`),
  * and every query below relies on Catalyst pushing filters/projections
  * into the scan rather than materializing full tables.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS), which Spark rejects by
      // default ([PARQUET_TYPE_ILLEGAL]). Read nanos as long, truncate to
      // micros (identical to DuckDB's nanos→micros conversion).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
