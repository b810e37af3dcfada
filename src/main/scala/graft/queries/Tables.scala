package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver's test tables. */
object Tables {

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * map to its microsecond TimestampType. Read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to a
    * micros timestamp — identical to how DuckDB-on-micros would
    * truncate, so bucketed aggregates agree across engines.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // graft-built sessions already set this at build time
    // (GraftSession) — this is an idempotent fallback so the loader
    // also works on a foreign session; there is no per-read option
    // for it (only ParquetToSparkSchemaConverter reads the SQLConf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // integer `div`, NOT `/`: double division loses unit precision at
    // ~1.7e15 and rounds the microsecond up, diverging from DuckDB's
    // truncating ns→us conversion.
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
