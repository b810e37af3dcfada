package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming code; this is the greenfield
  * north-star surface (SURVEY.md §2.7): file/Kafka source →
  * watermark → windowed/sessionized aggregation → sink, with
  * `Trigger.AvailableNow` giving the batch-incremental semantics the
  * Stage/Runs planner provides for files (checkpoint dir = runs
  * table). In production the source line becomes
  * `readStream.format("kafka")...`; everything downstream is
  * unchanged.
  */
object EventsPipeline {

  /** Parquet schema of the events table with `ts` as raw nanos
    * (Spark cannot map parquet TIMESTAMP(NANOS); see
    * graft.queries.Tables).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Streaming source over event parquet files under `dir` matching
    * `glob`; ts nanos → micros (truncating, matching batch/oracle).
    * The file-stream source requires a directory, so callers pass the
    * containing dir plus a glob filter for the file(s).
    */
  def readStream(spark: SparkSession, dir: String,
                 glob: String = "*.parquet"): DataFrame = {
    // set at build time by GraftSession; idempotent foreign-session fallback
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windows per event type: count + exact value sum.
    * Output column shapes match the batch/oracle form (window start
    * as `bucket_ts`).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("bucket_ts"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (1 hour every 15 min) per event type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_ts"), col("event_type"), col("n"))

  /** Session windows per user (30-minute inactivity gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream inner join (click attribution): each click pairs
    * with every view by the same user in the 2 hours before it.
    * Both sides carry watermarks, which is what lets Spark BOUND the
    * join state: a buffered view can stop waiting once the click
    * watermark passes `view_ts + 2 h`, so state is
    * watermark-sized, not stream-sized — the property that keeps a
    * forever-running attribution job at a fixed memory footprint.
    * The join itself shuffles both sides on `user_id` (a keyed
    * equi-join with a range residual, never a cross product).
    *
    * Works as a self-join of one source stream: the two sides are
    * derived by filtering the same input. `joinType` may be
    * "left_outer": unmatched views emit with null click columns once
    * the click watermark passes their join window — under
    * `AvailableNow` the terminal watermark advance flushes them all,
    * so the run-to-completion result equals the batch left join.
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      joinType: String = "inner"): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "4 hours")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "4 hours")
    v.join(c,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"),
        joinType)
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Exactly-once event stream: watermarked dedup on event_id. */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Kafka source with the same downstream schema as the file
    * source: JSON events on a topic → parsed/typed columns. Requires
    * the `spark-sql-kafka` connector on the classpath (not present
    * in this container, so this constructor is compile-checked and
    * production-documented rather than locally driven; every
    * transformation downstream of it is exercised via the file
    * source, which is the point of keeping the schemas identical).
    */
  def readKafkaStream(spark: SparkSession, bootstrapServers: String,
                      topic: String): DataFrame =
    parseKafkaEnvelope(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load())

  /** JSON event payload schema carried in the Kafka record value. */
  val kafkaEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Kafka wire envelope → typed event rows: exactly the transform
    * [[readKafkaStream]] applies after `load()`. Factored out so the
    * parse logic runs under test against a memory stream carrying the
    * connector's wire schema (binary key/value + topic/partition/
    * offset) — only the socket itself needs the connector jar.
    */
  def parseKafkaEnvelope(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), kafkaEventSchema).as("e"))
      .select("e.*")

  /** Stream-static enrichment join: each micro-batch joins against
    * the (broadcastable) static dimension — no streaming state at
    * all, the standard shape for dimension lookup at any scale.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left_outer")

  /** Arbitrary-state processing (`flatMapGroupsWithState`): per-user
    * running totals emitted on every update — the custom-state
    * surface that windowed aggregation can't express (e.g. decaying
    * counters, per-key ML state). State is a typed case class held
    * by the state store per user.
    */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val typed = events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]

    val updated = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) => {
          val prev = state.getOption.getOrElse(UserTotals(0L, 0.0))
          var n    = prev.n
          var sum  = prev.sum
          rows.foreach { case (_, v) => n += 1; sum += v }
          val next = UserTotals(n, sum)
          state.update(next)
          Iterator((userId, next.n, next.sum))
        })
      .toDF("user_id", "n_events", "total_value")
    updated
  }

  /** The same per-user running totals on the `transformWithState`
    * API (Spark 4's arbitrary-state v2): explicit `ValueState` held
    * by a [[StatefulProcessor]], with timers available for TTL — the
    * modern replacement for `flatMapGroupsWithState`.
    */
  def runningTotalsV2(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // transformWithState needs multi-column-family state, which only
    // the RocksDB provider supports — the ONE streaming op here that
    // does. The session default stays HDFS-backed (GraftSession):
    // plain windowed aggs carry bounded watermark-sized state and
    // RocksDB's per-batch open/commit overhead buys them nothing.
    // (Session-mutating, read at query start: later streams in this
    // session also get RocksDB — a perf, never correctness, matter.)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new TotalsProcessor(), TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "total_value")
  }

  /** Streaming MERGE sink — the "stream maintains a serving table"
    * pattern: per-user totals aggregate in update mode, and each
    * micro-batch's delta (the keys whose aggregate changed, at their
    * new values) upserts into a parquet table via `foreachBatch` +
    * [[graft.operators.Merge.upsertParquet]]. Upsert REPLACES a key
    * with its newest aggregate, so each run's table reflects that
    * run's input; pass a persistent `checkpoint` to make successive
    * runs incremental over only-new files while the aggregation
    * state carries forward (the runs-table semantics, on streams).
    * Returns the table's current contents.
    */
  def runUpsertSink(spark: SparkSession, dir: String, tablePath: String,
                    glob: String = "*.parquet",
                    stateShufflePartitions: Option[Int] = None,
                    checkpoint: Option[String] = None): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    stateShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    val agg = readStream(spark, dir, glob)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
    try {
      val writer = agg.writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.operators.Merge.upsertParquet(batch, tablePath, Seq("user_id"))
        }
      checkpoint.foreach(writer.option("checkpointLocation", _))
      val q = writer.start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // An input dir matching no files completes the stream without any
    // foreachBatch invocation, so the table path was never created —
    // return an empty result with the aggregate schema rather than
    // throwing path-not-found.
    val p  = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(tablePath)
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), agg.schema)
  }

  /** Run a streaming aggregation to completion over the files that
    * exist now (`Trigger.AvailableNow` + memory sink, complete mode)
    * and return the result table — the streaming analogue of the
    * Stage planner's "process everything new, then stop".
    */
  /** `stateShufflePartitions` sizes the stateful-operator partition
    * count for THIS query (captured at query start, then the session
    * conf is restored). Stateful streaming cost scales with state
    * store INSTANCES — partitions × stores-per-operator (4 for a
    * symmetric-hash stream-stream join) — each paying per-batch
    * lifecycle + commit regardless of how little state it holds, so
    * the right setting tracks live-state volume (keys in flight), not
    * the batch-scan width the session default is sized for. Measured
    * at sf0.1: the attribution join runs 7.6 s at 32 partitions vs
    * 3.1 s at 8 for identical results. A restarted production query
    * must keep this constant per checkpoint (Spark pins it in the
    * checkpoint metadata).
    */
  def runToCompletion(spark: SparkSession, dir: String,
                      agg: DataFrame => DataFrame,
                      queryName: String,
                      glob: String = "*.parquet",
                      outputMode: String = "complete",
                      stateShufflePartitions: Option[Int] = None): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    stateShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = agg(readStream(spark, dir, glob))
        .writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.table(queryName)
  }
}

/** Per-user custom state for [[EventsPipeline.runningTotals]]. */
final case class UserTotals(n: Long, sum: Double)

/** StatefulProcessor for [[EventsPipeline.runningTotalsV2]]: one
  * `ValueState[UserTotals]` per user, updated per input batch and
  * emitted per update.
  */
final class TotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long, Double)] {

  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}
  import org.apache.spark.sql.{Encoder, Encoders}

  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    implicit val enc: Encoder[UserTotals] = Encoders.product[UserTotals]
    totals = getHandle.getValueState[UserTotals]("totals", enc,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val prev = Option(totals.get()).getOrElse(UserTotals(0L, 0.0))
    var n    = prev.n
    var sum  = prev.sum
    rows.foreach { case (_, v) => n += 1; sum += v }
    totals.update(UserTotals(n, sum))
    Iterator((key, n, sum))
  }
}
