package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: local[32] sized for the test rig, AQE
  * on, shuffle partitions matched to cores (not the 200 default),
  * UTC, Kryo. On a real cluster the same settings apply except
  * master, which spark-submit provides.
  *
  * Session-scoped compatibility settings live HERE, not as hidden
  * side effects inside readers/operators:
  *   - `nanosAsLong`: the events table carries parquet
  *     TIMESTAMP(NANOS), which Spark 4 otherwise refuses; reading the
  *     nanos as longs lets [[graft.queries.Tables.events]] convert
  *     them explicitly (truncating, matching DuckDB).
  *   - State store provider: left at Spark's default (HDFS-backed,
  *     in-memory maps) — the right store for bounded watermark-sized
  *     state like windowed counts, with none of RocksDB's per-batch
  *     open/commit overhead. `transformWithState` needs multi-column-
  *     family state, which only the RocksDB provider supports, so
  *     those queries run under
  *     [[graft.streaming.EventsPipeline.withRocksDBStateStore]],
  *     which scopes the provider to the query and restores the
  *     session default after; a production job holding larger-than-
  *     heap state would likewise opt in per job.
  */
object GraftSession {

  def build(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      // Partition count decouples from the core count via
      // SPARK_GRAFT_SHUFFLE_PARTITIONS: shuffle partitions must scale
      // with DATA (so per-partition state — sort runs, hash-join build
      // sides — stays bounded as input grows), while cores are a
      // machine property. The sf10 scale sweep runs 128 partitions on
      // the same 32 cores for exactly this reason; on a cluster the
      // same number rides spark-submit --conf.
      shufflePartitions: String = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
  ): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
