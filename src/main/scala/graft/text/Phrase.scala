package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact phrase search — "these tokens, adjacent, in order" — two
  * ways that must agree: directly from the corpus text, and served
  * from a POSITIONAL [[graft.index.TextIndex]] (`positional = true`,
  * which persists `(term, doc_id, pos)` bucketed on `term`). The
  * indexed form is the Lucene positional-postings intersection as
  * relational algebra: one bucket-pruned scan of the phrase terms'
  * positions, then an (n−1)-fold self-join on `(doc_id, pos + i)`.
  * At 100 TB the joined relations are term-frequency-sized (the
  * phrase's terms only), never corpus-sized, and the corpus text is
  * never read.
  */
object Phrase {

  /** (doc_id, n_matches) for documents containing the exact phrase,
    * computed DIRECTLY from a (doc_id, text) corpus.
    */
  def matchesDirect(docs: DataFrame, phrase: Seq[String]): DataFrame =
    matchesFrom(
      docs.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term"))),
      phrase)

  /** (doc_id, n_matches) served from the positional index — reads
    * ONLY the phrase terms' buckets of `<prefix>_positions`.
    *
    * The physical plan is forced HERE, under a pinned bucketed-scan
    * conf: the adjacency join runs on `(doc_id, pos)`, so the
    * planner sees the `term` bucketing as useless for distribution
    * and `DisableUnnecessaryBucketedScan` would switch the scans to
    * unbucketed — silently discarding the BUCKET PRUNING that bounds
    * a phrase lookup to its terms' buckets (the rule models exchange
    * elimination, not pruning benefit; at the sf1 tier a broadcast
    * join masked this, at sf10 the audit caught the full-table
    * read). Forcing `executedPlan` inside the scope pins the scans
    * (AQE re-optimizes exchanges above them, never the leaves), so
    * later actions on the returned frame keep the pruned plan.
    */
  def matchesIndexed(spark: SparkSession, prefix: String,
                     phrase: Seq[String]): DataFrame = {
    val out = matchesFrom(spark.table(s"${prefix}_positions"), phrase)
    Mlt.withBucketedScan(spark) { out.queryExecution.executedPlan }
    out
  }

  /** Proximity search — all `terms` within a `window`-token span,
    * any order (Lucene's sloppy-phrase relaxation) — computed
    * DIRECTLY from a (doc_id, text) corpus. Output: (doc_id,
    * min_span) for qualifying docs, min_span = the tightest span
    * containing one occurrence of every term.
    */
  def proximityDirect(docs: DataFrame, terms: Seq[String], window: Int): DataFrame =
    proximityFrom(
      docs.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term"))),
      terms, window)

  /** Proximity search served from the positional index — reads ONLY
    * the terms' buckets of `<prefix>_positions` (plan forced under
    * the pinned bucketed-scan conf, the [[matchesIndexed]] rationale:
    * the per-doc joins run on `doc_id`, so the planner would drop
    * the term-bucket pruning as distribution-useless).
    */
  def proximityIndexed(spark: SparkSession, prefix: String,
                       terms: Seq[String], window: Int): DataFrame = {
    val out = proximityFrom(spark.table(s"${prefix}_positions"), terms, window)
    Mlt.withBucketedScan(spark) { out.queryExecution.executedPlan }
    out
  }

  // one position-choice per term, per doc: the per-term relations
  // join on doc_id alone (term-frequency-sized — a doc's positions
  // for one term, never the corpus), span = greatest − least over
  // the chosen positions, and the per-doc MIN span is compared to
  // the window. Repeated terms would let one position satisfy two
  // slots, so the term set must be distinct.
  private def proximityFrom(positions: DataFrame, terms: Seq[String],
                            window: Int): DataFrame = {
    require(terms.nonEmpty, "proximity needs at least one term")
    require(terms.distinct == terms, "proximity terms must be distinct")
    require(window >= 0, "window must be >= 0")
    val legs = terms.zipWithIndex.map { case (term, i) =>
      positions.filter(col("term") === term)
        .select(col("doc_id"), col("pos").as(s"p$i"))
    }
    val joined = legs.reduceLeft((a, b) => a.join(b, Seq("doc_id")))
    val ps = terms.indices.map(i => col(s"p$i"))
    val span = (if (ps.size == 1) lit(0)
                else greatest(ps: _*) - least(ps: _*)).cast("long")
    joined.select(col("doc_id"), span.as("span"))
      .groupBy(col("doc_id"))
      .agg(min(col("span")).as("min_span"))
      .filter(col("min_span") <= window)
      .orderBy(col("doc_id"))
  }

  // the n-fold adjacency intersection over any (term, doc_id, pos)
  // relation: anchor on the first term's positions, then each
  // subsequent term must appear at pos + i. Distinct column names per
  // step keep the self-join unambiguous.
  private def matchesFrom(positions: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val anchor = positions.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (term, i)) =>
        acc.join(
          positions.filter(col("term") === term)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))
  }
}
