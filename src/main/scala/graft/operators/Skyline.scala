package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-front) operator: the rows no other row dominates,
  * where dominance = no-worse on every criterion and strictly better
  * on at least one. The multi-objective "best tradeoffs" query
  * (cheapest-and-largest, newest-and-highest-quality) that SQL has no
  * operator for.
  *
  * The naive form is an O(n²) non-equi self-join. This is the exact
  * two-phase prune instead:
  *   1. a deterministic hash-sample's own skyline is computed (tiny ×
  *      tiny), then broadcast;
  *   2. the full table drops everything the sample-skyline dominates
  *      — one broadcast anti-join, the corpus never shuffles;
  *   3. the surviving candidates (skyline-sized, not corpus-sized)
  *      resolve exactly among themselves.
  * Phase 2 is sound because dominance is transitive: a row dominated
  * by any row is dominated by a skyline row, and every true skyline
  * row survives to phase 3 to eliminate false candidates. The final
  * non-equi join is NLJ by nature, but over the pruned candidate set
  * — the prune, not the join strategy, is what scales. Ties (fully
  * equal criterion vectors) dominate nothing and are all kept.
  *
  * WORST CASE: the prune only helps when the skyline is small
  * relative to the data — the common case for correlated or
  * independent criteria (expected skyline ≈ O(logᵈ⁻¹ n)). On
  * ANTI-correlated criteria the true skyline is O(n): no prune can
  * help (the output itself is corpus-sized), the broadcast side
  * grows past the executor limit, and phase 3 degrades to a genuine
  * quadratic join. `maxCandidates` guards that cliff: if the pruned
  * candidate set is still larger, the operator fails fast with the
  * count rather than melting the cluster — at that size the caller
  * needs a different formulation (e.g. a per-grid-cell partitioned
  * skyline) or a different question.
  *
  * Rows with a NULL criterion are excluded (dominance is undefined).
  */
object Skyline {

  def pareto(df: DataFrame, minimize: Seq[String], maximize: Seq[String],
             maxCandidates: Long = 4_000_000L): DataFrame = {
    val dims = minimize ++ maximize
    require(dims.nonEmpty, "at least one criterion required")
    val base = df.na.drop(dims).localCheckpoint(eager = false)

    // b-side columns prefixed to avoid capture; dominance(b over a)
    val bCols = dims.map(c => col(c).as(s"__b_$c"))
    def dominance(a: String => Column, b: String => Column): Column = {
      val noWorse = (minimize.map(c => b(c) <= a(c)) ++
        maximize.map(c => b(c) >= a(c))).reduce(_ && _)
      val better = (minimize.map(c => b(c) < a(c)) ++
        maximize.map(c => b(c) > a(c))).reduce(_ || _)
      noWorse && better
    }
    def dom(right: DataFrame): Column =
      dominance(c => col(c), c => col(s"__b_$c"))
    def notDominatedBy(left: DataFrame, right: DataFrame): DataFrame =
      left.join(broadcast(right.select(bCols: _*)), dom(right), "left_anti")

    // deterministic ~8% hash sample (first md5 byte ≤ 0x14) — stable
    // across runs and partitionings, engine-replayable like every
    // other hash gate here
    val h = md5(concat_ws("|", dims.map(c => col(c).cast("string")): _*))
    val sample = base.filter(substring(h, 1, 2) <= "14")
    val sampleSky = notDominatedBy(sample, sample)
    val candidates = notDominatedBy(base, sampleSky)
      .localCheckpoint(eager = false)
    // anti-correlated-data guard: the count is on the CHECKPOINTED
    // candidates, so phase 3 reuses the same blocks — one extra job,
    // no recompute of the prune
    val nCand = candidates.count()
    if (nCand > maxCandidates)
      throw new IllegalStateException(
        s"skyline candidate set has $nCand rows (> $maxCandidates): the " +
          "criteria are anti-correlated enough that the skyline itself is " +
          "data-sized — the broadcast/NLJ resolution would be quadratic. " +
          "Partition the space (grid cells) or reconsider the criteria; " +
          "raise maxCandidates only with executor memory to match")
    notDominatedBy(candidates, candidates)
  }
}
