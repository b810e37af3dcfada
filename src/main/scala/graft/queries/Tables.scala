package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver's test tables. */
object Tables {

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an events-shaped frame so `ts` is always Spark
    * `TimestampType` (UTC-adjusted micros), whatever the on-disk
    * layout. The driver has shipped three layouts so far:
    *
    *   - parquet TIMESTAMP(NANOS), which Spark 4 can only read as a
    *     raw long (`spark.sql.legacy.parquet.nanosAsLong`) →
    *     floor-convert ns→us (integer `div`, NOT `/`: double division
    *     loses unit precision at ~1.7e15 and rounds the microsecond
    *     up, diverging from DuckDB's truncating conversion);
    *   - parquet TIMESTAMP(isAdjustedToUTC=false, MICROS) → Spark
    *     `TIMESTAMP_NTZ`. The session TZ is pinned UTC
    *     (GraftSession), so NTZ→TimestampType is the identity on the
    *     underlying micros — but the cast matters because
    *     `unix_micros` (and friends) accept only TimestampType;
    *   - plain TIMESTAMP(UTC) micros → already the target type.
    *
    * Every reader of the events table — batch AND streaming — must
    * come through here, so a future layout change is one edit (and
    * one red spec: see TestDataLayoutSpec).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  /** Events table with `ts` normalized to TimestampType micros (see
    * [[normalizeEventTs]]).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // graft-built sessions already set this at build time
    // (GraftSession) — this is an idempotent fallback so the loader
    // also works on a foreign session; there is no per-read option
    // for it (only ParquetToSparkSchemaConverter reads the SQLConf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }
}
