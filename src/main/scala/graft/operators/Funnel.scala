package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step conversion funnel over an event stream: for each
  * user, the earliest step-0 event, then the earliest step-1 event
  * at/after it, then the earliest step-2 event at/after THAT, and so
  * on — the "view → click → purchase" question every event pipeline
  * eventually answers.
  *
  * Relational shape (why this scales): each step is one keyed
  * aggregation over the events of that type, joined to the previous
  * step's (user, ts) table on the user key — filters reach the scan
  * (event_type is a pushable predicate), every join and aggregation
  * shuffles on `user_id` only, and the per-step tables are one row
  * per user, monotonically shrinking down the funnel. No window over
  * the full event stream, no per-user event sorting, no state.
  *
  * Output: one row per user who completed step 0 — `user_id`,
  * `step_ts_0..step_ts_{n-1}` (null once the funnel broke), and
  * `stages` = number of completed steps.
  */
object Funnel {

  def ordered(events: DataFrame, steps: Seq[String],
              userCol: String = "user_id", tsCol: String = "ts",
              typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val s0 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts_0"))
    val stageTables = steps.zipWithIndex.drop(1).foldLeft(Vector(s0)) {
      case (acc, (step, i)) =>
        val prev = acc.last
        val t = events.filter(col(typeCol) === step)
          .join(prev, Seq(userCol))
          .filter(col(tsCol) >= col(s"step_ts_${i - 1}"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"step_ts_$i"))
        acc :+ t
    }
    val assembled = stageTables.tail.foldLeft(stageTables.head) { (l, r) =>
      l.join(r, Seq(userCol), "left_outer")
    }
    val stages = steps.indices.drop(1)
      .map(i => when(col(s"step_ts_$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    assembled.withColumn("stages", stages.cast("int"))
  }
}
