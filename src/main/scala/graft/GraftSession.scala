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
  *   - RocksDB state store: `transformWithState` needs multi-column-
  *     family state, which only the RocksDB provider supports — also
  *     the recommended provider for any large-state production job.
  */
object GraftSession {

  def build(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
