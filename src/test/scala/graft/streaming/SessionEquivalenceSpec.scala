package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The two session definitions the library ships — e1's batch
  * gaps-and-islands (lag + cumulative sum) and s2's streaming
  * `session_window` — asserted EQUAL on the same fixture with the
  * same gap. Each is oracle-gated separately, but each gate replays
  * its own definition, so a drift between them at the exact-gap
  * boundary would be invisible to both oracles (the fixture has no
  * exact-gap event). This spec closes that hole twice over:
  *
  *   1. the REAL paths — batch islands vs a run-to-completion
  *      streaming session_window query — on the events fixture;
  *   2. a synthetic boundary fixture with gaps just-under, exactly-
  *      at, and just-over the threshold, where the two definitions
  *      must agree event-for-event. MEASURED semantics (this spec
  *      first ran with the opposite assumption and the engine said
  *      no): session_window MERGES an event arriving exactly at the
  *      gap — adjacent windows coalesce — so the islands rule that
  *      matches is `is_new iff gap > threshold`, exactly e1's.
  */
final class SessionEquivalenceSpec extends SparkTestBase {

  private val GapUs = 1800L * 1000000L

  /** The e1 islands form, parameterized over any (user_id, event_id,
    * ts) relation — emits session_window-shaped rows: start = first
    * event, end = last event + gap (session_window's exclusive end).
    */
  private def islandSessions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    ev.withColumn("is_new", when(gap.isNull || gap > GapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select(col("user_id"), col("start_us"),
        (col("last_us") + GapUs).as("end_us"), col("n_events"))
  }

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("batch islands equal run-to-completion streaming session windows on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val batch = islandSessions(graft.queries.Tables.events(spark, dir))
    val streamed = EventsPipeline.runToCompletion(
        spark, dir, EventsPipeline.sessionCounts,
        queryName = s"sess_equiv_${System.nanoTime()}",
        glob = "events.parquet",
        stateShufflePartitions = Some(8))
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))
    val b = canon(batch); val s = canon(streamed)
    assert(b.nonEmpty && b == s,
      s"batch islands (${b.size} sessions) != streaming session windows (${s.size})")
  }

  test("boundary: just-under and exactly-at merge, just-over splits — in BOTH definitions") {
    import spark.implicits._
    val t0 = 1700000000000000L // µs
    // user 1: second event exactly at the gap — MERGES in both
    // definitions (session_window coalesces adjacent windows; islands'
    // `>` keeps it); user 2: 1 µs under — merges; user 3: 1 µs over —
    // splits; user 4: chain of under-gap events — one session spanning
    // more than a gap in total
    val rows = Seq(
      (1L, 1L, t0), (1L, 2L, t0 + GapUs),
      (2L, 3L, t0), (2L, 4L, t0 + GapUs - 1L),
      (3L, 5L, t0), (3L, 6L, t0 + GapUs + 1L),
      (4L, 7L, t0), (4L, 8L, t0 + GapUs - 1L), (4L, 9L, t0 + 2L * (GapUs - 1L))
    )
    val ev = rows.toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"), timestamp_micros(col("us")).as("ts"))
      .localCheckpoint(true)
    val islands = canon(islandSessions(ev))
    // the engine's own session_window, batch-evaluated — the same
    // expression the streaming path groups by (stream ≡ batch for the
    // expression itself; the streaming machinery is test 1's subject)
    val sw = canon(ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events")))
    assert(islands == sw, s"islands $islands != session_window $sw")
    // and the boundary shape is what the scaladoc claims: user 3
    // splits into two 1-event sessions; users 1 (exactly-at), 2
    // (just-under), and 4 (under-gap chain) each form one session
    def nSessions(u: Long) = islands.count(_.head == u)
    assert(nSessions(3L) == 2)
    assert(nSessions(1L) == 1 && nSessions(2L) == 1 && nSessions(4L) == 1)
    assert(islands.filter(_.head == 1L).forall(_(3) == 2L))
    assert(islands.filter(_.head == 4L).forall(_(3) == 3L))
  }
}
