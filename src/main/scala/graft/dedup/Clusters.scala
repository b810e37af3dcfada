package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup *pairs* (from
  * [[NgramJaccard]] / [[MinHashLSH]] / [[SimHash]]) are edges; the
  * canonical-document choice needs the *connected components* —
  * transitive closure of "is a near-dup of".
  *
  * Iterative min-label propagation: every node adopts the smallest
  * label among itself and its neighbors until fixpoint. Each
  * iteration is one join + one aggregation (all shuffles on node
  * id); iterations needed = graph diameter, which for dedup clusters
  * is tiny (pairs cluster around a few originals). For adversarial
  * long-chain graphs at extreme scale, swap the loop body for the
  * large-star/small-star algorithm (Kiveris et al.) — same
  * per-iteration relational shape, O(log n) rounds.
  */
object Clusters {

  /** pairs(a, b) → (id, cluster_rep) for every node appearing in a
    * pair, where cluster_rep is the minimum node id of its component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the edge list once — `pairs` may itself be an
    // expensive plan (e.g. a similarity join), and the loop below
    // would otherwise re-execute it every round
    val base = pairs.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
    val sym = base.union(base.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    // localCheckpoint (not persist): iterative algorithms must
    // truncate lineage every iteration or the logical plan deepens
    // geometrically (plan rendering alone OOMs after ~10 rounds)
    //
    // seed each node with min(id, min neighbor) — one aggregation,
    // same shuffle the identity-seeded distinct() would cost, but it
    // starts the loop one propagation round ahead
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(true)

    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      // (1) adopt the minimum label among self + neighbors, carrying
      // the previous label so convergence detection below is a plain
      // filter on the checkpointed rows (no extra shuffle join)
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nlabel")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("nlabel")).as("nbr_label"))
        .select(col("src").as("id"), col("nbr_label"))
      val afterNbr = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // (2) pointer jump: label ← label(label) — path halving makes
      // convergence O(log diameter) instead of O(diameter)
      val next = afterNbr
        .join(afterNbr.select(col("id").as("label"), col("label").as("jump")),
          Seq("label"), "left_outer")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("old") =!= col("label")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_rep"))
  }
}
