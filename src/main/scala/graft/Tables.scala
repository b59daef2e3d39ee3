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
      // events.parquet has shipped with two `ts` encodings across
      // testdata generations: TIMESTAMP(NANOS) (which Spark rejects by
      // default, [PARQUET_TYPE_ILLEGAL]) and plain TIMESTAMP(MICROS).
      // Handle both: read nanos as long and truncate to micros
      // (identical to DuckDB's nanos→micros conversion); cast a native
      // timestamp to the same TimestampType the nanos path produces, so
      // downstream `ts` semantics (UTC session, micros precision) are
      // identical either way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
