package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Dbscan}
import graft.dedup.{NgramJaccard, SimHash}

/** Large-scale correctness spot-check (VERDICT r10 #6).
  *
  * The DuckDB oracle gates every query at sf0.01; the sf1 sweep in
  * SCALE.md measures TIME only. This tool closes the gap for the
  * heaviest similarity operators, whose oracles are all-pairs SQL
  * that DuckDB cannot replay at sf1 (2.5e9 hamming / 2e8 cosine
  * pairs): each fast path is checked at sf1 against an INDEPENDENT
  * in-engine construction of the same contract —
  *
  *   - d15/d4: chunk-combination blocking at a different `m` — the
  *     pigeonhole theorem makes every m exact, so two m's agreeing
  *     at sf1 means the blocking (the only approximate-looking part)
  *     drops nothing at 100× the gate's scale;
  *   - d5/a2/v5: the LSH bucket graph vs the brute-force broadcast
  *     scorer — pair-set equality at sf1 proves recall stays 1.0 at
  *     τ=0.45 beyond the scale the config was tuned at (sims are the
  *     same fused [[graft.functions.DotProduct]] on both paths, so
  *     they must match bitwise, which the join also verifies);
  *   - v5 structure: DBSCAN postconditions re-derived from the
  *     ε-graph itself (core degrees, core-core cluster agreement,
  *     border = min adjacent core cluster, noise isolation);
  *   - g1: PageRank mass conservation at sf1 (Σ ranks = n within
  *     the DECIMAL quantization tolerance).
  *
  * Prints one PASS/FAIL line per invariant; exits non-zero on any
  * FAIL. Run: `sbt "runMain graft.tools.SpotSf1 <sf1Dir>"`.
  */
object SpotSf1 {

  private var failures = 0

  private def check(name: String)(ok: => Boolean, detail: => String): Unit = {
    val passed = try ok catch { case e: Exception =>
      println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}"); failures += 1; return
    }
    if (passed) println(s"PASS $name ($detail)")
    else { println(s"FAIL $name ($detail)"); failures += 1 }
  }

  /** (onlyLeft, onlyRight, common) row counts over the given key columns. */
  private def diff(l: DataFrame, r: DataFrame, keys: Seq[String]): (Long, Long, Long) = {
    val lk = l.select(keys.map(col): _*)
    val rk = r.select(keys.map(col): _*)
    (lk.exceptAll(rk).count(), rk.exceptAll(lk).count(), lk.intersectAll(rk).count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SpotSf1 <sfDir>")
    val dir = args(0)
    val spark = GraftSession.build("spot-sf1")
    spark.conf.set("spark.graft.streamSanityCheck", "false")
    try {
      def table(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      val docs = table("documents")
      val vecs = table("embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))

      // --- SimHash blocking exactness at sf1 (d15 then d4) ---
      val fps = SimHash.fingerprintsOfTokens(
        docs, "doc_id", NgramJaccard.shingles(col("text"), 3))
        .localCheckpoint(eager = false) // fingerprint once, probe twice
      for ((name, maxDist, m1, m2) <- Seq(("d15_blocking_m2_vs_m1", 4, 2, 1),
                                          ("d4_blocking_m3_vs_m4", 12, 3, 4))) {
        val p1 = SimHash.pairs(fps, maxDist, m1)
        val p2 = SimHash.pairs(fps, maxDist, m2)
        val (only1, only2, both) = diff(p1, p2, Seq("a", "b", "dist"))
        check(name)(only1 == 0 && only2 == 0,
          s"pairs=$both onlyM$m1=$only1 onlyM$m2=$only2")
      }

      // --- d5/a2: LSH pair graph ≡ brute-force at τ=0.45 ---
      val lsh = Ann.cosineNearDupPairsLSH(vecs, minCos = 0.45, dim = 64,
        planes = 6, tables = 48, seed = 42L).localCheckpoint(eager = false)
      val exact = Ann.cosinePairsExact(vecs, minCos = 0.45).localCheckpoint(eager = false)
      val (onlyLsh, onlyExact, both) = diff(lsh, exact, Seq("a", "b", "sim"))
      check("d5_lsh_recall_vs_brute")(onlyLsh == 0 && onlyExact == 0,
        s"pairs=$both onlyLsh=$onlyLsh missedByLsh=$onlyExact (sim compared bitwise)")

      // a2 = knnFromPairs over the same pair set; with pair equality
      // proven above, run the top-k step on BOTH graphs end-to-end
      // anyway (cheap — pair sets are ~1e4) to pin the full query.
      val knnL = Ann.knnFromPairs(lsh, k = 5)
      val knnE = Ann.knnFromPairs(exact, k = 5)
      val (ol, oe, kb) = diff(knnL, knnE, Seq("query_id", "nbr_id", "sim", "rank"))
      check("a2_knn_lsh_vs_brute")(ol == 0 && oe == 0, s"edges=$kb only=$ol/$oe")

      // --- v5: DBSCAN over LSH graph ≡ over exact graph, plus
      //     postconditions re-derived from the ε-graph itself ---
      val nodes = vecs.select(col("id"))
      val dbL = Dbscan.fromNeighbors(nodes, lsh.select(col("a"), col("b")), minPts = 2)
        .localCheckpoint(eager = false)
      val dbE = Dbscan.fromNeighbors(nodes, exact.select(col("a"), col("b")), minPts = 2)
      val (dl, de, db) = diff(dbL, dbE, Seq("id", "n_nbrs", "role", "cluster"))
      check("v5_dbscan_lsh_vs_exact_graph")(dl == 0 && de == 0,
        s"rows=$db only=$dl/$de")

      val sym = lsh.select(col("a").as("id"), col("b").as("nb"))
        .unionByName(lsh.select(col("b").as("id"), col("a").as("nb")))
      // minPts=2: core ⇔ degree ≥ 1; noise ⇔ isolated
      val roleBad = dbL.join(sym.groupBy("id").agg(count(lit(1)).as("deg")), Seq("id"), "left_outer")
        .withColumn("deg", coalesce(col("deg"), lit(0L)))
        .filter((col("role") === "core") =!= (col("deg") >= 1))
        .count()
      check("v5_core_iff_degree")(roleBad == 0, s"violations=$roleBad")
      val edgeBad = lsh.select(col("a"), col("b"))
        .join(dbL.select(col("id").as("a"), col("cluster").as("ca")), Seq("a"))
        .join(dbL.select(col("id").as("b"), col("cluster").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb")).count()
      check("v5_corecore_same_cluster")(edgeBad == 0, s"cross-cluster edges=$edgeBad")

      // --- g1: PageRank mass conservation at sf1 ---
      // Σ pr is invariantly 1 on this dangling-free symmetric graph
      // ((1−d) teleport + d·contributions preserve unit mass); the
      // round-9 rank quantization admits ≤ 5e-10 error per node.
      val pr = graft.SparkEntry.queries("g1_pagerank")(spark, dir)
      val Array(nNodes, mass) = pr.agg(count(lit(1)).cast("double"), sum(col("pr")))
        .collect().head.toSeq.map(v => v.toString.toDouble).toArray
      check("g1_mass_conservation")(math.abs(mass - 1.0) <= 2e-9 * nNodes + 1e-6,
        f"nodes=$nNodes%.0f mass=$mass%.9f")

      println(if (failures == 0) "ALL PASS" else s"$failures FAILED")
    } finally spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
