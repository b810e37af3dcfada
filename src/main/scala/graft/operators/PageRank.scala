package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Fixed-iteration PageRank as pure DataFrame ops — the third
  * iterative algorithm here (alongside connected-components and the
  * k-means quantizer), same loop discipline: per round one keyed
  * join + one keyed aggregate, a lazy localCheckpoint to keep
  * lineage flat, and NO driver-side collection (the node count rides
  * as a broadcast 1-row scalar).
  *
  * Cross-engine determinism (the t11/a5 recipe): per-edge
  * contributions quantize to DECIMAL(24,12) before summing — decimal
  * sums are exact and order-independent, so partial-aggregation
  * order can't perturb ranks — and each round's rank rounds to 9
  * decimals, so another engine replaying the same recursion gets
  * bit-identical values. Dangling nodes contribute nothing (the
  * standard simplification; feed symmetric edges if every node must
  * have out-degree ≥ 1).
  *
  * At 100 TB: edges shuffle once per round on src (join) and dst
  * (aggregate); ranks are node-sized. Skewed hubs are AQE-split like
  * any aggregation key.
  */
object PageRank {

  /** Ranks after exactly `iters` rounds over directed (src, dst)
    * edges: (id, pr), Σpr ≤ 1 (dangling mass is dropped, not
    * redistributed).
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // the edge list is read by nodes, out-degrees, and every round's
    // contribution join — one lazy materialization instead of
    // re-deriving the (possibly expensive) upstream plan 2+iters times.
    //
    // PRE-PARTITIONED by src (guide §2.4 "two operations keyed the
    // same way can share one exchange"): the checkpoint leaf keeps
    // hashpartitioning(src), so the out-degree aggregate AND every
    // round's contribution join consume the edges without a shuffle —
    // previously each round re-shuffled the FULL edge list on src,
    // the only edge-sized exchange in the loop (the dst-keyed
    // contribution aggregate partial-aggregates map-side, so its
    // shuffle is node-sized). One up-front edge shuffle replaces
    // iters of them — the dominant byte-volume at 100 TB.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = false)
    val nN = nodes.agg(count(lit(1)).as("n_nodes"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var pr = nodes.crossJoin(broadcast(nN))
      .select(col("id"),
        round(lit(1.0) / col("n_nodes").cast(DoubleType), 9).as("pr"))
      .localCheckpoint(eager = false)
    for (_ <- 0 until iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          round(col("pr") / col("outdeg").cast(DoubleType), 12)
            .cast(DecimalType(24, 12)).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left_outer")
        .crossJoin(broadcast(nN))
        .select(col("id"),
          round(
            lit(1.0 - damping) / col("n_nodes").cast(DoubleType) +
              lit(damping) *
              coalesce(col("s"), lit(BigDecimal(0)).cast(DecimalType(24, 12)))
                .cast(DoubleType), 9).as("pr"))
        .localCheckpoint(eager = false)
    }
    pr
  }

  /** Weighted PageRank over (src, dst, w) edges: each node's rank
    * flows out proportionally to edge weight — pr·w/Σw(out) — so
    * strong relationships carry more rank (co-purchase counts, trade
    * volumes). Same determinism recipe and loop discipline as [[run]]
    * (quantized DECIMAL contributions, round-9 ranks, lazy
    * checkpoints); integer weights keep Σw exact. [[run]] is the
    * w ≡ 1 special case.
    */
  def runWeighted(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // pre-partitioned by src — the [[run]] rationale
    val e = edges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = false)
    val nN   = nodes.agg(count(lit(1)).as("n_nodes"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("sumw"))
    var pr = nodes.crossJoin(broadcast(nN))
      .select(col("id"),
        round(lit(1.0) / col("n_nodes").cast(DoubleType), 9).as("pr"))
      .localCheckpoint(eager = false)
    for (_ <- 0 until iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .join(outW, Seq("src"))
        .select(col("dst").as("id"),
          round(col("pr") * col("w").cast(DoubleType) / col("sumw").cast(DoubleType), 12)
            .cast(DecimalType(24, 12)).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left_outer")
        .crossJoin(broadcast(nN))
        .select(col("id"),
          round(
            lit(1.0 - damping) / col("n_nodes").cast(DoubleType) +
              lit(damping) *
              coalesce(col("s"), lit(BigDecimal(0)).cast(DecimalType(24, 12)))
                .cast(DoubleType), 9).as("pr"))
        .localCheckpoint(eager = false)
    }
    pr
  }
}
