package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Dbscan}
import graft.dedup.{NgramJaccard, SimHash}

/** Decade-2 correctness audit (VERDICT r11 #1): the sf10 sweep in
  * SCALE.md measured TIME only, and sf10 is the tier where the
  * candidate-pair plans meet 10⁸+-candidate regimes and the gated
  * 48-table LSH config's recall model predicts ~1.7% loss — nothing
  * committed proved the model's claim that a table count sized by
  * [[graft.ann.Ann.tablesForRecall]] restores exactness there.
  *
  * Ground truth: [[bruteEpsPairs]], an INDEPENDENT brute-force
  * construction — the whole corpus is collected and broadcast as
  * primitive float arrays and every (a < b) pair is scored in a tight
  * per-partition JVM loop, bypassing Catalyst entirely (no join, no
  * codegen, no expression tree shared with the paths under audit).
  * The arithmetic replicates [[graft.functions.DotProduct]]'s exact
  * accumulation order (index-ascending `(double) a[i] * (double) b[i]`
  * sums, `sqrt` norms, one final division), so sims must match the
  * engine paths BITWISE — any diff() mismatch is a real disagreement,
  * not float noise. The driver-side collect is deliberate and
  * audit-only (53 MB at sf10): the library's operators never do this;
  * the auditor wants maximal construction independence, and the
  * Θ(n²) scan is ~100× cheaper through primitive arrays than through
  * a BroadcastNestedLoopJoin's per-row expression evaluation
  * (measured: the BNL form needs ~73 s for sf1's 2×10⁸ pairs — ~2 h
  * at sf10; this loop does sf10's 2×10¹⁰ in minutes).
  *
  * Checks, mirroring tools/SpotSf1 one tier up:
  *   - d5 gated config (6 planes × 48 tables): precision exactly 1
  *     (bitwise), misses MATCH the analytic model within 4σ;
  *   - d5 at the MODEL-SIZED table count — T from `tablesForRecall`
  *     fed the measured sf10 pair count — must be exact: recall 1.0,
  *     zero diffs either way, sims bitwise;
  *   - a2: knnFromPairs over both graphs, end to end;
  *   - v5: DBSCAN over the model-sized LSH ε-graph ≡ over the brute
  *     graph, plus graph-derived postconditions;
  *   - d15/d4: SimHash chunk-combination blocking at two different
  *     `m` (each provably exact by pigeonhole; agreement at 500 k
  *     docs checks the blocking drops nothing at the decade-2 tier);
  *   - g1: PageRank mass conservation at sf10.
  *
  * Run: `SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=128
  *       sbt "runMain graft.tools.SpotSf10 testdata-local/sf10"`
  * (the SCALE.md sf10 protocol: partitions scale with data).
  */
object SpotSf10 {

  private var failures = 0

  private def check(name: String)(ok: => Boolean, detail: => String): Unit = {
    val t0 = System.nanoTime()
    val passed = try ok catch { case e: Exception =>
      println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}"); failures += 1; return
    }
    val dt = (System.nanoTime() - t0) / 1e9
    if (passed) println(f"PASS $name ($detail) [$dt%.0fs]")
    else { println(f"FAIL $name ($detail) [$dt%.0fs]"); failures += 1 }
  }

  /** (onlyLeft, onlyRight, common) row counts over the given key columns. */
  private def diff(l: DataFrame, r: DataFrame, keys: Seq[String]): (Long, Long, Long) = {
    val lk = l.select(keys.map(col): _*)
    val rk = r.select(keys.map(col): _*)
    (lk.exceptAll(rk).count(), rk.exceptAll(lk).count(), lk.intersectAll(rk).count())
  }

  /** Brute-force exact ε-graph via a broadcast primitive-array scan —
    * the audit's independent ground truth (see object scaladoc). ids
    * are sorted so each row's scan starts past its own id: every
    * (a < b) pair is scored exactly once.
    */
  def bruteEpsPairs(vecs: DataFrame, minCos: Double): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val ds = vecs.select(col("id").cast("long"), col("vec")).as[(Long, Array[Float])]
    val rows = ds.collect().sortBy(_._1)
    val ids  = rows.map(_._1)
    val mat  = rows.map(_._2)
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val norms = mat.map(norm)
    val bc = spark.sparkContext.broadcast((ids, mat, norms))
    val nPart = spark.sparkContext.defaultParallelism * 4
    ds.rdd.repartition(nPart).mapPartitions { it =>
      val (ids, mat, norms) = bc.value
      it.flatMap { case (a, va) =>
        val na = norm(va)
        // first index with ids(j) > a (ids are sorted, unique)
        val hit = java.util.Arrays.binarySearch(ids, a)
        var j = if (hit >= 0) hit + 1 else -hit - 1
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        while (j < ids.length) {
          val vb = mat(j)
          var s = 0.0; var i = 0
          while (i < va.length) { s += va(i).toDouble * vb(i).toDouble; i += 1 }
          val sim = s / (na * norms(j))
          if (sim >= minCos) out += ((a, ids(j), sim))
          j += 1
        }
        out
      }
    }.toDF("a", "b", "sim")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SpotSf10 <sfDir>")
    val dir = args(0)
    val spark = GraftSession.build("spot-sf10")
    spark.conf.set("spark.graft.streamSanityCheck", "false")
    val tAll = System.nanoTime()
    try {
      def table(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      val vecs = table("embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))

      // --- ground truth: independent primitive-loop brute force ---
      var t0 = System.nanoTime()
      val exact = bruteEpsPairs(vecs, minCos = 0.45).localCheckpoint(eager = true)
      val nPairs = exact.count()
      println(f"INFO exact_pairs=$nPairs brute_time=${(System.nanoTime() - t0) / 1e9}%.0fs")

      // --- d5 gated config: precision exact, misses match the model ---
      t0 = System.nanoTime()
      val lsh48 = Ann.cosineNearDupPairsLSH(vecs, minCos = 0.45, dim = 64,
        planes = 6, tables = 48, seed = 42L).localCheckpoint(eager = false)
      val (falsePairs, missed48, both48) = diff(lsh48, exact, Seq("a", "b", "sim"))
      check("d5_lsh48_precision_exact")(falsePairs == 0,
        s"pairs=$both48 falsePairs=$falsePairs (sim compared bitwise)")
      val p6 = pow(lit(1.0) - acos(least(col("sim"), lit(1.0))) / lit(math.Pi), lit(6))
      val predicted = exact.agg(sum(pow(lit(1.0) - p6, lit(48)))).collect().head.getDouble(0)
      // tolerance = 4σ Poisson + 5% relative: miss events are NOT
      // independent across pairs — pairs share vectors and every pair
      // shares the same 48 table draws, so near-identical siblings of
      // a missed pair tend to miss together and the fluctuation of
      // the total exceeds √N. Measured: −7.8% relative at sf1, +2.9%
      // at sf10 (both directions, shrinking with scale — correlated
      // fluctuation around an exact expectation, not a model bias;
      // the hyperplanes are genuinely Gaussian so E is exact).
      val tol = 4.0 * math.sqrt(predicted) + 0.05 * predicted + 2.0
      check("d5_lsh48_recall_matches_model")(math.abs(missed48 - predicted) <= tol,
        f"missed=$missed48 predicted=$predicted%.1f ±$tol%.1f " +
          f"recall=${both48.toDouble / (both48 + missed48)}%.4f " +
          f"[lsh48 ${(System.nanoTime() - t0) / 1e9}%.0fs]")

      // --- d5 at the MODEL-SIZED table count: must be exact ---
      val tModel = Ann.tablesForRecall(minCos = 0.45, planes = 6,
        expectedPairs = nPairs.toDouble, maxExpectedMisses = 0.05)
      println(s"INFO model_tables=$tModel (tablesForRecall(0.45, 6, $nPairs, 0.05))")
      t0 = System.nanoTime()
      val lshT = Ann.cosineNearDupPairsLSH(vecs, minCos = 0.45, dim = 64,
        planes = 6, tables = tModel, seed = 42L).localCheckpoint(eager = false)
      val (onlyLsh, missedT, bothT) = diff(lshT, exact, Seq("a", "b", "sim"))
      check("d5_lsh_model_tables_exact")(onlyLsh == 0 && missedT == 0,
        f"pairs=$bothT onlyLsh=$onlyLsh missedByLsh=$missedT recall=${
          bothT.toDouble / (bothT + missedT)}%.4f (T=$tModel, sim bitwise) [lshT ${
          (System.nanoTime() - t0) / 1e9}%.0fs]")

      // --- a2: the top-k step end to end on both graphs ---
      val knnL = Ann.knnFromPairs(lshT, k = 5)
      val knnE = Ann.knnFromPairs(exact, k = 5)
      val (ol, oe, kb) = diff(knnL, knnE, Seq("query_id", "nbr_id", "sim", "rank"))
      check("a2_knn_lsh_vs_brute")(ol == 0 && oe == 0, s"edges=$kb only=$ol/$oe")

      // --- v5: DBSCAN over LSH graph ≡ over brute graph + postconditions ---
      val nodes = vecs.select(col("id"))
      val dbL = Dbscan.fromNeighbors(nodes, lshT.select(col("a"), col("b")), minPts = 2)
        .localCheckpoint(eager = false)
      val dbE = Dbscan.fromNeighbors(nodes, exact.select(col("a"), col("b")), minPts = 2)
      val (dl, de, db) = diff(dbL, dbE, Seq("id", "n_nbrs", "role", "cluster"))
      check("v5_dbscan_lsh_vs_exact_graph")(dl == 0 && de == 0, s"rows=$db only=$dl/$de")

      val sym = lshT.select(col("a").as("id"), col("b").as("nb"))
        .unionByName(lshT.select(col("b").as("id"), col("a").as("nb")))
      val roleBad = dbL.join(sym.groupBy("id").agg(count(lit(1)).as("deg")), Seq("id"), "left_outer")
        .withColumn("deg", coalesce(col("deg"), lit(0L)))
        .filter((col("role") === "core") =!= (col("deg") >= 1))
        .count()
      check("v5_core_iff_degree")(roleBad == 0, s"violations=$roleBad")
      val edgeBad = lshT.select(col("a"), col("b"))
        .join(dbL.select(col("id").as("a"), col("cluster").as("ca")), Seq("a"))
        .join(dbL.select(col("id").as("b"), col("cluster").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb")).count()
      check("v5_corecore_same_cluster")(edgeBad == 0, s"cross-cluster edges=$edgeBad")

      // --- d15/d4: blocking exactness at 500 k docs ---
      // joinHint = "merge": the coarse-m probes' per-partition build
      // sides outgrow SHUFFLE_HASH's non-spillable hash relation at
      // this tier; SortMergeJoin spills and completes (SpotSf1 note).
      val docs = table("documents")
      val fps = SimHash.fingerprintsOfTokens(
        docs, "doc_id", NgramJaccard.shingles(col("text"), 3))
        .localCheckpoint(eager = false)
      for ((name, maxDist, m1, m2) <- Seq(("d15_blocking_m2_vs_m1", 4, 2, 1),
                                          ("d4_blocking_m1_vs_m2", 3, 1, 2))) {
        val p1 = SimHash.pairs(fps, maxDist, m1, joinHint = "merge").localCheckpoint(eager = false)
        val p2 = SimHash.pairs(fps, maxDist, m2, joinHint = "merge").localCheckpoint(eager = false)
        val (only1, only2, both) = diff(p1, p2, Seq("a", "b", "dist"))
        check(name)(only1 == 0 && only2 == 0,
          s"pairs=$both onlyM$m1=$only1 onlyM$m2=$only2")
      }

      // --- r1: the round-14 re-plan vs an independent recompute ---
      // The re-planned r1 (baskets-once + map-side pair explode +
      // bounded TopKPayloadAgg) is recomputed here via the PLAN IT
      // REPLACED — distinct → basket self-join → two un-hinted
      // support joins → row_number window — a genuinely disjoint
      // dataflow sharing no operator with the production path. Every
      // (item, other, cxy, jaccard, rank) row must match exactly:
      // the scores divide identical integers, so even the doubles
      // compare bitwise.
      t0 = System.nanoTime()
      val r1New = graft.SparkEntry.queries("r1_item_similarity")(spark, dir)
        .localCheckpoint(eager = false)
      val li = table("lineitem").select(col("l_orderkey"), col("l_partkey")).distinct()
      val r1Old = {
        val cxO = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cx"))
        val pairs = li.select(col("l_orderkey"), col("l_partkey").as("u"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("v")), Seq("l_orderkey"))
          .filter(col("u") < col("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cxy"))
        val symO = pairs.select(explode(array(
            struct(col("u").as("item"), col("v").as("other"), col("cxy")),
            struct(col("v").as("item"), col("u").as("other"), col("cxy")))).as("e"))
          .select(col("e.item").as("item"), col("e.other").as("other"),
            col("e.cxy").as("cxy"))
        val j = symO
          .join(cxO.select(col("l_partkey").as("item"), col("cx").as("c1")), Seq("item"))
          .join(cxO.select(col("l_partkey").as("other"), col("cx").as("c2")), Seq("other"))
          .withColumn("j", col("cxy").cast("double") /
            (col("c1") + col("c2") - col("cxy")).cast("double"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("item")).orderBy(col("j").desc, col("other").asc)
        j.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
          .select(col("item"), col("other"), col("cxy"),
            round(col("j"), 6).as("jaccard"), col("rank").cast("int").as("rank"))
      }
      val (r1OnlyNew, r1OnlyOld, r1Both) =
        diff(r1New, r1Old, Seq("item", "other", "cxy", "jaccard", "rank"))
      check("r1_replan_vs_window_plan")(r1OnlyNew == 0 && r1OnlyOld == 0,
        f"rows=$r1Both onlyNew=$r1OnlyNew onlyOld=$r1OnlyOld " +
          f"[${(System.nanoTime() - t0) / 1e9}%.0fs]")

      // --- c8: max_by compaction vs the rn=1 window recompute ---
      // Same independence argument: the production path is a map-side
      // max_by combine; the audit recomputes the compacted table with
      // the row_number window it replaced. (o_custkey, o_orderkey) is
      // unique, so the formulations must agree row-for-row.
      t0 = System.nanoTime()
      val c8New = graft.SparkEntry.queries("c8_cdc_apply")(spark, dir)
      val c8Old = {
        val log = table("orders").select(
          col("o_custkey").as("cust"), col("o_orderkey").as("seq"),
          when(pmod(col("o_orderkey"), lit(9)) === 0, lit("D"))
            .otherwise(lit("U")).as("op"),
          col("o_totalprice"), col("o_orderstatus"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cust")).orderBy(col("seq").desc)
        log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .filter(col("op") =!= "D")
          .select(col("cust"), col("seq"), col("o_totalprice"), col("o_orderstatus"))
      }
      val (c8OnlyNew, c8OnlyOld, c8Both) =
        diff(c8New, c8Old, Seq("cust", "seq", "o_totalprice", "o_orderstatus"))
      check("c8_maxby_vs_window_plan")(c8OnlyNew == 0 && c8OnlyOld == 0,
        f"rows=$c8Both onlyNew=$c8OnlyNew onlyOld=$c8OnlyOld " +
          f"[${(System.nanoTime() - t0) / 1e9}%.0fs]")

      // --- g1: PageRank mass conservation at sf10 ---
      val pr = graft.SparkEntry.queries("g1_pagerank")(spark, dir)
      val Array(nNodes, mass) = pr.agg(count(lit(1)).cast("double"), sum(col("pr")))
        .collect().head.toSeq.map(v => v.toString.toDouble).toArray
      check("g1_mass_conservation")(math.abs(mass - 1.0) <= 2e-9 * nNodes + 1e-6,
        f"nodes=$nNodes%.0f mass=$mass%.9f")

      println(f"INFO total=${(System.nanoTime() - tAll) / 1e9}%.0fs")
      println(if (failures == 0) "ALL PASS" else s"$failures FAILED")
    } finally spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
