package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

final class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("ordered funnel: steps must occur in order; later steps null out") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE the first view — funnel stops at stage 1
      (2L, ts(3), "click"), (2L, ts(4), "view"),
      // user 3: purchase before click — stages = 2 (view, click), purchase not after click
      (3L, ts(0), "view"), (3L, ts(1), "purchase"), (3L, ts(2), "click"),
      // user 4: never viewed — not in the output at all
      (4L, ts(0), "click"), (4L, ts(1), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val out = Funnel.ordered(events, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
      .toMap

    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (Some(ts(0)), Some(ts(5)), Some(ts(9)), 3))
    assert(out(2L) == (Some(ts(4)), None, None, 1), "pre-view click must not count")
    assert(out(3L) == (Some(ts(0)), Some(ts(2)), None, 2), "pre-click purchase must not count")
  }

  test("a same-timestamp step counts (>= semantics), and min picks the earliest qualifying event") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(0), "click"),          // simultaneous: qualifies
      (1L, ts(2), "click"),                               // later click ignored by min
      (5L, ts(1), "view"), (5L, ts(0), "view"), (5L, ts(3), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.ordered(events, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2), r.getInt(3))).toMap
    assert(out(1L) == ((ts(0), ts(0), 2)))
    assert(out(5L) == ((ts(0), ts(3), 2)), "earliest view is the anchor")
  }
}
