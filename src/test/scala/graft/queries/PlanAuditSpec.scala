package graft.queries

import graft.SparkTestBase

/** Scale-shape regression guard: no gated query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only
  * where a genuinely tiny (1-row scalar) side makes it the right
  * plan. This is the class of regression that turns a correct query
  * into a 100 TB scale-killer while every value-level gate stays
  * green — so the *plan* is the asserted artifact.
  *
  * Planning only (`executedPlan` string) — nothing executes.
  */
final class PlanAuditSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose plan legitimately contains a BroadcastNestedLoopJoin:
  //   - a broadcast of a 1-row aggregate (scalar count / corpus size):
  //     t6, q23
  //   - brute-force ANN, where "score the broadcast query batch
  //     against every corpus row" IS the operator — the corpus side
  //     never shuffles and each partition scans independently: a1
  //   - IVF's coarse quantizer: every vector scores against the
  //     broadcast |cells|-row centroid table (a3, a5 — a5's k-means
  //     training assigns against the same broadcast centroids)
  //   - the bloom filter: a 1-row occupied-slot array (≤ m ints)
  //     broadcast to every fact partition — the filter being tiny
  //     and shuffle-free is the operator's entire point: q46
  private val scalarBroadcastOk =
    Set("t6_tfidf_top_terms", "t11_unigram_logprob", "q23_correlated_subquery",
      "a1_ann_topk", "a3_ann_ivf", "a4_ann_quantized", "a5_ivf_kmeans",
      "d10_semdedup", "q46_bloom_prune",
      "t14_bm25",  // 1-row (n_docs, sum_dl) corpus-stats scalar
      "t15_collocations", // 1-row (n_uni, n_bi) corpus-totals scalar
      "q52_skyline", // dominance is non-equi by nature; the NLJ sides
                     // are the broadcast sample-skyline / pruned
                     // candidate set (skyline-sized, never the table)
      "v4_dbscan")   // exact ε-graph at an unselective τ is the a1
                     // brute-force shape: broadcast side, corpus
                     // never shuffles (LSH ≡-spec'd in DbscanSpec)

  // the streaming queries execute on construction; everything else
  // plans lazily and is audited here
  private val skipped = Set("s1_stream_tumbling", "s2_stream_sessions",
    "s3_stream_stream_join", "s4_stream_outer_join")

  test("filters and pruning reach the parquet scan (q1)") {
    val plan = graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "q1's shipdate filter must push down to the scan")
    // column pruning: the scan must not read the widest lineitem columns
    assert(!plan.contains("l_comment"), "q1 must not scan l_comment")
  }

  test("dimension joins broadcast (q5, q17)") {
    Seq("q5_join_broadcast", "q17_snowflake_join").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name must broadcast its dim side")
    }
  }

  test("no broadcast hint on an unbounded aggregate (t6, t11)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    // a force-broadcast of a keyed aggregate over the corpus (the
    // term vocabulary, per-term document frequencies) is unbounded at
    // scale and OOMs the build side; only grouping-key-less (1-row
    // scalar) aggregates may carry the hint in these plans
    Seq("t6_tfidf_top_terms", "t11_unigram_logprob", "t15_collocations").foreach { name =>
      val analyzed = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.analyzed
      val offending = analyzed.collect {
        case h: ResolvedHint if !h.child.collectFirst { case a: Aggregate => a }
            .exists(_.groupingExpressions.isEmpty) => h.simpleString(80)
      }
      assert(offending.isEmpty,
        s"$name force-broadcasts a keyed (unbounded) aggregate:\n${offending.mkString("\n")}")
    }
  }

  test("no gated query plans a cartesian product") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skipped(name) => None
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") && !scalarBroadcastOk(name)
        if (cartesian || bnl)
          Some(s"$name: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
        else None
    }
    assert(offenders.isEmpty, s"scale-killer plans detected:\n${offenders.mkString("\n")}")
  }
}
