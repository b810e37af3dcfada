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
  * `dedupTags = true` additionally keeps at most one entry per tag
  * (the best-scored one) — it subsumes a
  * `dropDuplicates(key, tag)` ahead of the top-k, which would
  * otherwise shuffle the full candidate multiset (with whatever wide
  * payload columns it carries) just to dedup before ranking.
  *
  * Result: array of (score, tag) structs, best first; descending
  * score with ascending-tag tie-break for determinism.
  *
  * Ordering is the TOTAL order `java.lang.Double.compare` (NaN
  * greatest, matching Spark's own `desc` sort order), not primitive
  * `>`/`==`: a NaN score — e.g. a zero-norm vector's cosine — is
  * false under both primitive comparisons, which would make its
  * placement depend on arrival order and let it slip past the
  * full-buffer early-reject, diverging from the window formulation
  * this aggregator replaces.
  */
final class TopKAgg(k: Int, dedupTags: Boolean = false)
    extends Aggregator[ScoredTag, Seq[ScoredTag], Seq[ScoredTag]] {
  require(k > 0)

  private def better(a: ScoredTag, b: ScoredTag): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.tag < b.tag)
  }

  private def cap(s: Seq[ScoredTag]): Seq[ScoredTag] = {
    val sorted = s.sortWith(better)
    (if (dedupTags) sorted.distinctBy(_.tag) else sorted).take(k)
  }

  override def zero: Seq[ScoredTag] = Vector.empty

  override def reduce(buf: Seq[ScoredTag], v: ScoredTag): Seq[ScoredTag] = {
    // a full buffer whose worst member beats v can only absorb v as a
    // duplicate-or-worse — safe to reject without looking at tags
    if (buf.length == k && better(buf.last, v)) buf
    else cap(v +: buf)
  }

  override def merge(a: Seq[ScoredTag], b: Seq[ScoredTag]): Seq[ScoredTag] =
    cap(a ++ b)

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

  /** Top-k with at most one (best) entry per tag — replaces
    * `dropDuplicates(key, tag)` + window in one bounded aggregation.
    */
  def distinct(score: Column, tag: Column, k: Int): Column = {
    val agg = new TopKAgg(k, dedupTags = true)
    org.apache.spark.sql.functions
      .udaf(agg, Encoders.product[ScoredTag])
      .apply(score, tag)
  }
}

/** [[TopKAgg]] with one extra long riding alongside each kept row —
  * for top-k results that must carry a second column (r1 keeps the
  * raw co-occurrence count next to the Jaccard score) without a
  * join-back against the full scored relation to recover it. The
  * payload never participates in ordering: ranking stays (score
  * desc, tag asc), byte-identical to the window formulation.
  */
final class TopKPayloadAgg(k: Int)
    extends Aggregator[ScoredTagP, Seq[ScoredTagP], Seq[ScoredTagP]] {
  require(k > 0)

  // total order (NaN greatest, = Spark desc) — see TopKAgg scaladoc
  private def better(a: ScoredTagP, b: ScoredTagP): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.tag < b.tag)
  }

  override def zero: Seq[ScoredTagP] = Vector.empty

  override def reduce(buf: Seq[ScoredTagP], v: ScoredTagP): Seq[ScoredTagP] = {
    if (buf.length == k && better(buf.last, v)) buf
    else ((v +: buf).sortWith(better)).take(k)
  }

  override def merge(a: Seq[ScoredTagP], b: Seq[ScoredTagP]): Seq[ScoredTagP] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[ScoredTagP]): Seq[ScoredTagP] = buf

  override def bufferEncoder: Encoder[Seq[ScoredTagP]] =
    ExpressionEncoder[Seq[ScoredTagP]]()

  override def outputEncoder: Encoder[Seq[ScoredTagP]] =
    ExpressionEncoder[Seq[ScoredTagP]]()
}

final case class ScoredTagP(score: Double, tag: Long, payload: Long)

object TopKPayloadAgg {
  /** `top_k(score, tag, payload, k)`: array<struct<score,tag,payload>>. */
  def apply(score: Column, tag: Column, payload: Column, k: Int): Column = {
    val agg = new TopKPayloadAgg(k)
    org.apache.spark.sql.functions
      .udaf(agg, Encoders.product[ScoredTagP])
      .apply(score, tag, payload)
  }
}

/** Bounded bottom-k over LONGS — the KMV/bottom-k-sketch building
  * block. A double-scored [[TopKAgg]] cannot hold 60-bit hash values
  * exactly (doubles lose integer precision past 2^53), so the k
  * minima keep native long ordering end to end. Output: ascending
  * array of the k smallest values. Same partial-aggregation contract
  * as TopKAgg: ≤k longs per key per partition cross the wire, where
  * the window form sorts the whole relation inside each key's single
  * partition — for a 3-flag KMV over a corpus-sized distinct-hash
  * relation that is 3 tasks sorting everything.
  */
final class BottomKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    if (buf.length == k && buf.last < v) buf
    else ((v +: buf).sorted).take(k)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BottomKAgg {
  /** `bottom_k(x, k)`: ascending array<long> of the k smallest x. */
  def apply(x: Column, k: Int): Column = {
    val agg = new BottomKAgg(k)
    org.apache.spark.sql.functions
      .udaf(agg, Encoders.scalaLong)
      .apply(x)
  }
}
