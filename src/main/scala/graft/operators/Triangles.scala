package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the clustering /
  * community-structure primitive (clustering coefficient, spam and
  * bot detection, graph feature engineering).
  *
  * The algorithm is the degree-ordered orientation scheme (Suri &
  * Vassilvitskii's MapReduce formulation): orient every undirected
  * edge from its (degree, id)-smaller endpoint to the larger, so
  * each node's oriented out-degree is O(√m) on any graph — the
  * wedge self-join then generates each triangle's two "low" edges
  * exactly once from its smallest vertex, and one semi-join against
  * the oriented edge set closes it. No node ever enumerates its full
  * undirected neighborhood²: the hub that breaks the naive wedge
  * join is exactly the node the orientation demotes to in-degree.
  *
  * Scale shape: canonical dedup (1 shuffle), degree agg (1), two
  * endpoint-degree joins, one wedge self-join on src, one closure
  * join on (src, dst) — all keyed, AQE-splittable, nothing
  * driver-side.
  */
object Triangles {

  /** Per-node triangle participation counts over undirected edges
    * (u, v): one row per node, zero-inclusive — (id, n_tri), where
    * n_tri is the number of distinct triangles containing the node.
    * Self-loops and duplicate/reversed edges are tolerated (dropped /
    * canonicalized).
    */
  def perNode(edges: DataFrame): DataFrame = {
    val u = col("u"); val v = col("v")
    val canon = edges
      .select(least(u, v).as("u"), greatest(u, v).as("v"))
      .filter(u =!= v)
      .distinct()
      // read by degrees, orientation, wedges, AND closure — pin it
      .localCheckpoint(eager = false)
    val nodes = canon.select(u.as("id")).unionByName(canon.select(v.as("id")))
      .distinct()
    val deg = canon
      .select(explode(array(u, v)).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

    // total order (deg, id): lower endpoint -> higher endpoint
    val withDeg = canon
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val uLow = struct(col("du"), u) < struct(col("dv"), v)
    val oriented = withDeg.select(
        when(uLow, u).otherwise(v).as("src"),
        when(uLow, v).otherwise(u).as("dst"),
        when(uLow, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(eager = false)

    // wedges from each triangle's order-smallest vertex; endpoints
    // re-sorted by the same (deg, id) order so the closing edge is
    // looked up exactly as it was oriented
    val l = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
    val r = oriented.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
    // strict (deg, id) inequality keeps exactly ONE of each wedge's
    // two emissions — no b≠c filter + distinct shuffle needed, and
    // the kept orientation is the one the closing edge was stored as.
    // shuffle_hash on the EDGE side of both joins: wedges ≥ edges
    // always (each wedge is two edges), so hashing the edge side and
    // streaming wedges skips the O(W log W) sort-merge sort of the
    // wedge set — measured 10× on the sf0.1 co-purchase graph (41 M
    // wedges); per-partition hash state is |E|/partitions, never |W|.
    val wedges = l.join(r.hint("shuffle_hash"), Seq("src"))
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .select(col("src").as("a"), col("b").as("lo"), col("c").as("hi"))
    val triangles = wedges.join(
      oriented.select(col("src").as("lo"), col("dst").as("hi")).hint("shuffle_hash"),
      Seq("lo", "hi"), "left_semi")

    val perNodeCounts = triangles
      .select(explode(array(col("a"), col("lo"), col("hi"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    nodes.join(perNodeCounts, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
