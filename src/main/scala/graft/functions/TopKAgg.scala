package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Map-side top-k: a typed [[Aggregator]] whose buffer is a bounded
  * "keep the k best (score, tag) pairs" collection.
  *
  * The window-function formulation (`row_number() over (partition by
  * key order by score) <= k`) shuffles *every* row to its key's
  * partition and sorts it. This aggregator keeps at most k rows per
  * key per partition (partial aggregation) and merges buffers
  * associatively, so only `k × partitions` rows per key cross the
  * wire — the right plan when k ≪ rows-per-key, the usual 100 TB
  * top-k case.
  *
  * Result: array of (score, tag) structs, best first; descending
  * score with ascending-tag tie-break for determinism.
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredTag, Seq[ScoredTag], Seq[ScoredTag]] {
  require(k > 0)

  private def better(a: ScoredTag, b: ScoredTag): Boolean =
    a.score > b.score || (a.score == b.score && a.tag < b.tag)

  override def zero: Seq[ScoredTag] = Vector.empty

  override def reduce(buf: Seq[ScoredTag], v: ScoredTag): Seq[ScoredTag] = {
    if (buf.length == k && better(buf.last, v)) buf
    else ((v +: buf).sortWith(better)).take(k)
  }

  override def merge(a: Seq[ScoredTag], b: Seq[ScoredTag]): Seq[ScoredTag] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[ScoredTag]): Seq[ScoredTag] = buf

  override def bufferEncoder: Encoder[Seq[ScoredTag]] =
    ExpressionEncoder[Seq[ScoredTag]]()

  override def outputEncoder: Encoder[Seq[ScoredTag]] =
    ExpressionEncoder[Seq[ScoredTag]]()
}

final case class ScoredTag(score: Double, tag: Long)

object TopKAgg {
  /** `top_k(score, tag, k)` column: array<struct<score,tag>>. */
  def apply(score: Column, tag: Column, k: Int): Column = {
    val agg = new TopKAgg(k)
    org.apache.spark.sql.functions
      .udaf(agg, Encoders.product[ScoredTag])
      .apply(score, tag)
  }
}
