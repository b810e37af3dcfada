package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of the
  * named queries (default: a representative set) against a scale
  * directory. Used to confirm scan pruning (`PushedFilters`,
  * `ReadSchema`), broadcast choices, and whole-stage codegen spans.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q5_join_broadcast", "q7_anti_join_theta",
        "q17_snowflake_join", "e2_incremental_antijoin", "d2_ngram_jaccard",
        "a1_ann_topk", "a4_ann_quantized", "c4_token_budget", "d10_semdedup",
        "q42_asof_native", "d11_dup_spans", "d13_span_cut", "q43_kmv_distinct",
        "q46_bloom_prune", "q47_countmin",
        "g2_triangles", "d14_fuzzy_join", "c8_cdc_apply", "v3_random_projection",
        "g3_bfs", "q52_skyline", "v4_dbscan", "t15_collocations", "e7_ohlc_bars")
    val spark = GraftSession.build("graft-explain")
    try {
      names.foreach { name =>
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    } finally spark.stop()
  }
}
