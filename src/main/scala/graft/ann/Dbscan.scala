package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN density clustering over an ε-neighbor graph — the
  * outlier-aware clustering step for embedding corpora (topic
  * islands, near-dup families, noise screening before expensive
  * per-cluster work).
  *
  * Decomposition: the ε-graph (cosine ≥ threshold pairs) comes from
  * [[Ann.cosineNearDupPairsLSH]] (bucketed candidates + exact verify,
  * recall tuned to 1.0 on the gate's config) or any exact pair
  * source; this operator then runs the density logic as pure keyed
  * dataflow:
  *   - core: |N_ε(p)| ≥ minPts, neighborhood INCLUDING p itself —
  *     one degree aggregate;
  *   - clusters: connected components over core–core edges (density
  *     reachability restricted to cores IS component connectivity),
  *     labeled by minimum core id via [[graft.dedup.Clusters]];
  *   - border: non-core adjacent to ≥ 1 core. Classic DBSCAN assigns
  *     the FIRST core's cluster (scan-order-dependent); this variant
  *     takes the MINIMUM adjacent core cluster, making the output a
  *     pure function of the graph — reproducible across runs,
  *     partitionings, and engines;
  *   - noise: everything else, cluster −1.
  *
  * Scale shape: degree count, two semi-joins, the CC loop
  * (O(log diameter) keyed rounds), one border min-aggregate — every
  * step keyed on node ids; vectors are never touched here at all.
  */
object Dbscan {

  /** nodes(id), pairs(a, b) — undirected distinct ε-neighbor pairs.
    * Returns (id, n_nbrs, role ∈ core|border|noise, cluster; −1 for
    * noise), one row per node.
    */
  def fromNeighbors(nodes: DataFrame, pairs: DataFrame, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val p = pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .localCheckpoint(eager = false)
    val sym = p.select(col("a").as("id"), col("b").as("nb"))
      .unionByName(p.select(col("b").as("id"), col("a").as("nb")))
    // degrees over the full node universe (an isolated node has 0 —
    // and IS core when minPts = 1, since the neighborhood includes
    // the point itself: core ⇔ n_nbrs ≥ minPts − 1)
    val deg = nodes.select(col("id"))
      .join(sym.groupBy(col("id")).agg(count(lit(1)).as("n_nbrs")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"))
      .localCheckpoint(eager = false)
    val core = deg.filter(col("n_nbrs") >= minPts - 1).select(col("id"))
      .localCheckpoint(eager = false)

    val coreEdges = p
      .join(core.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(core.select(col("id").as("b")), Seq("b"), "left_semi")
    val comps = graft.dedup.Clusters.connectedComponents(coreEdges)
    // isolated cores (no core neighbor) are their own cluster
    val coreLabeled = core
      .join(comps, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cluster_rep"), col("id")).as("cluster"),
        lit("core").as("role"))
      .localCheckpoint(eager = false)

    val borderLabeled = sym
      .join(coreLabeled.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .join(core, Seq("id"), "left_anti")
      .groupBy(col("id"))
      .agg(min(col("cluster")).as("cluster"))
      .withColumn("role", lit("border"))

    deg
      .join(coreLabeled.select(col("id"), col("cluster"), col("role"))
          .unionByName(borderLabeled.select(col("id"), col("cluster"), col("role"))),
        Seq("id"), "left_outer")
      .select(col("id"), col("n_nbrs"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
