package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.index.TextIndex
import graft.text.Bm25

/** Decade audit of the stored text-retrieval path (x1/s10): the
  * sf0.01 oracle proves the indexed BM25 ranking is exact; this tool
  * measures what the oracle can't — that at 10²–10³× the gate corpus
  * the stored path still serves exactly, BUCKET-PRUNES its postings
  * scan to the query terms, and a lookup costs a small fraction of
  * re-deriving the ranking from the corpus text (the entire point of
  * persisting the index: at 100 TB the direct form re-tokenizes the
  * corpus per query set, the indexed form reads a few buckets of a
  * (term, doc_id, tf) table).
  *
  * Arms, per corpus:
  *   1. exactness: `Bm25.topKIndexed` ≡ `Bm25.topK` (two term sets,
  *      canonical rows) — the x1 contract re-proven off-fixture;
  *   2. append exactness: 80%-seed build + 20% append serves
  *      identically (the partial-stats-rows SUM contract at scale);
  *   3. bucket pruning: the serving plan's postings scan reports
  *      `SelectedBucketsCount` < nBuckets;
  *   4. lookup cost: min-of-3 wall of the indexed lookup vs the
  *      direct computation (collect of ≤k rows consumes the plan —
  *      no count()-pruning hazard), plus one-time build wall and
  *      on-disk bytes of the serving tables vs the corpus parquet —
  *      the amortization statement, reported not gated.
  *
  * Run: `sbt "runMain graft.tools.SpotText testdata-local/sf1"`
  * (and `testdata-local/sf10` for decade 2); output is committed as
  * `SPOTCHECK_text.txt`.
  */
object SpotText {

  private var failures = 0

  private def check(name: String)(ok: => Boolean, detail: => String): Unit = {
    val passed = try ok catch { case e: Exception =>
      println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}"); failures += 1; return
    }
    if (passed) println(s"PASS $name ($detail)")
    else { println(s"FAIL $name ($detail)"); failures += 1 }
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SpotText <sfDir>")
    val dir = args(0)
    val spark = GraftSession.build("spot-text")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val nBuckets = 32
    val terms1 = Seq("table", "query", "spark")
    val terms2 = Seq("data", "the")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      println(s"INFO n=$n corpus=$dir nBuckets=$nBuckets terms=$terms1 / $terms2")

      val idx = TextIndex("spottext_idx", nBuckets)
      idx.drop(spark)
      val (_, tBuild) = time(idx.build(docs))

      // (1) exactness at scale, both term sets
      for ((terms, i) <- Seq(terms1, terms2).zipWithIndex) {
        val (served, tServe) = time(canon(Bm25.topKIndexed(spark, "spottext_idx", terms, 20)))
        val (direct, tDirect) = time(canon(Bm25.topK(docs, terms, 20)))
        check(s"text_indexed_exact_$i")(served == direct,
          f"${served.size} rows, served $tServe%.2f s vs direct $tDirect%.2f s")
      }

      // (3) bucket pruning on the serving plan
      val plan = Bm25.topKIndexed(spark, "spottext_idx", terms1, 20)
        .queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan).map(m => (m.group(1).toInt, m.group(2).toInt))
      check("text_bucket_pruned")(
        sel.exists { case (s, t) => s < t && s <= terms1.size },
        s"postings scan $sel of $nBuckets buckets for ${terms1.size} terms")

      // (4) lookup cost: min-of-3 each, after the plans above warmed
      // the JIT; the collect consumes every aggregate (no count() trap)
      val tIdx = (1 to 3).map(_ =>
        time(Bm25.topKIndexed(spark, "spottext_idx", terms1, 20).collect())._2).min
      val tDir = (1 to 3).map(_ =>
        time(Bm25.topK(docs, terms1, 20).collect())._2).min
      val servingBytes = idx.tableNames.map(t =>
        dirBytes(s"spark-warehouse/$t")).sum
      val corpusBytes = dirBytes(s"$dir/documents.parquet")
      println(f"INFO lookup min-of-3: indexed $tIdx%.3f s vs direct $tDir%.3f s " +
        f"(${tDir / tIdx}%.1fx); build once $tBuild%.1f s; serving tables " +
        f"${servingBytes / 1e6}%.1f MB vs corpus ${corpusBytes / 1e6}%.1f MB")
      check("text_lookup_cheaper")(tIdx < tDir,
        f"indexed $tIdx%.3f s < direct $tDir%.3f s")

      // (5) batch serving: one plan for 3 queries must beat 3 single
      // lookups (the amortization x4 exists for) and match them
      // query for query
      val batches = Map(0 -> terms1, 1 -> terms2, 2 -> Seq("hash", "merge"))
      val batchDf = {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            batches.toSeq.flatMap { case (q, ts) => ts.map(t => Row(q, t)) }, 1),
          StructType(Seq(StructField("query_id", IntegerType, nullable = false),
            StructField("term", StringType, nullable = false))))
      }
      val (batchRows, tBatch) = time(
        graft.text.Bm25.topKIndexedBatch(spark, "spottext_idx", batchDf, 20).collect())
      val singles = batches.toSeq.sortBy(_._1).map { case (qid, ts) =>
        qid -> time(Bm25.topKIndexed(spark, "spottext_idx", ts, 20).collect())
      }
      val tSingles = singles.map(_._2._2).sum
      val batchEqSingles = batches.keys.forall { qid =>
        val b = batchRows.filter(_.getInt(0) == qid)
          .map(r => (r.getLong(1), r.getDouble(2))).toSet
        val s = singles.find(_._1 == qid).get._2._1
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        b == s
      }
      check("text_batch_exact")(batchEqSingles,
        s"3-query batch matches the single-query path per query")
      // the amortization claim is STRUCTURAL (wall-clock at this
      // corpus size is per-plan overhead, not I/O): the whole batch
      // issues the same 2 postings scans (df + scoring) as ONE single
      // query — 3 singles issue 6 — and both stay bucket-pruned
      val batchPlan = graft.text.Bm25
        .topKIndexedBatch(spark, "spottext_idx", batchDf, 20)
        .queryExecution.executedPlan.toString
      val nPostScans = batchPlan.linesIterator.count(l =>
        l.contains("FileScan") && l.contains("spottext_idx_postings"))
      check("text_batch_one_scan_pair")(
        nPostScans <= 2 && batchPlan.contains("SelectedBucketsCount"),
        s"$nPostScans postings scans for the whole batch (3 singles issue 6), pruned")
      println(f"INFO batch wall $tBatch%.3f s vs 3 singles $tSingles%.3f s " +
        f"(overhead-bound at this tier; the scan count is the scale claim)")

      // (2) append ≡ fresh serving at scale (partial stats rows sum)
      val split = maxId * 4 / 5
      idx.build(docs.filter(col("doc_id") <= split))
      idx.append(docs.filter(col("doc_id") > split))
      check("text_append_exact")(
        canon(Bm25.topKIndexed(spark, "spottext_idx", terms1, 20)) ==
          canon(Bm25.topK(docs, terms1, 20)),
        s"seed<=id $split + append, stats rows = " +
          spark.table("spottext_idx_stats").count())

      idx.drop(spark)
      println(if (failures == 0) "ALL PASS" else s"$failures FAILURES")
      if (failures > 0) sys.exit(1)
    } finally spark.stop()
  }
}
