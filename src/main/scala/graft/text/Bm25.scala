package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Robertson BM25 (k1 = 1.2, b = 0.75) — ONE shared expression tree
  * for every surface that ranks by it (the direct t14 query and the
  * stored-index serving path below), so the two cannot drift: the
  * per-term score is double math over exact integer statistics,
  * quantized to DECIMAL(24,9) before the order-independent per-doc
  * sum (the t11 log recipe), ties in the rounded score broken by
  * doc_id.
  *
  * Reference behavior: the reference exposes corpus-frequency
  * analysis over JSON datasets (reference:
  * src/main/resources/pipeline/frequencyanalysis/frequencyAnalysis.py);
  * keyword retrieval over the same documents table is the
  * training-data-pipeline extension of that surface (inverted index
  * + ranked lookup, the Lucene/ES primitive re-expressed as Spark
  * relational algebra).
  */
object Bm25 {

  /** Per-(doc, term) BM25 contribution from exact integer stats:
    * `idf(df) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))` with
    * `avgdl = sum_dl / n_docs`, written as `dl·n_docs/sum_dl` so both
    * engines evaluate the identical double tree. Quantized to
    * DECIMAL(24,9) so the per-doc sum is order-independent.
    */
  def perTermScore(tf: Column, df: Column, dl: Column,
                   nDocs: Column, sumDl: Column): Column = {
    def D(c: Column) = c.cast(DoubleType)
    val idf = log((D(nDocs) - D(df) + lit(0.5)) / (D(df) + lit(0.5)) + lit(1.0))
    val denom = D(tf) + lit(1.2) * (lit(0.25) + lit(0.75) *
      (D(dl) * D(nDocs)) / D(sumDl))
    round(idf * (D(tf) * lit(2.2)) / denom, 9).cast(DecimalType(24, 9))
  }

  /** Shared ranking tail: per-doc sum of quantized per-term scores →
    * (doc_id, score, n_terms), top `k` by (score desc, doc_id).
    */
  private def rankTail(perTerm: DataFrame, k: Int): DataFrame =
    perTerm
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")).cast(DoubleType), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** BM25 top-k computed DIRECTLY from a (doc_id, text) corpus — the
    * t14 surface: tokenize, derive (tf, df, dl, n_docs, sum_dl)
    * exactly, score only query-term postings. The corpus-wide token
    * table reduces to (doc, dl) + a 1-row stats scalar; nothing
    * vocabulary-sized broadcasts.
    */
  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    rankTail(
      tf.join(df, Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          perTermScore(col("tf"), col("df"), col("dl"),
            col("n_docs"), col("sum_dl")).as("s")),
      k)
  }

  /** BM25 top-k served from a persisted [[graft.index.TextIndex]] —
    * the corpus text is never touched, and NOTHING doc-keyed is read:
    * the scan reads ONLY the query-term postings (the postings table
    * is bucketed on `term`, so the `isin` filter prunes to the query
    * terms' buckets), df is the per-term postings count (postings
    * rows are unique per (term, doc)), the doc length rides IN each
    * posting row (the Lucene norm-in-posting layout — measured at
    * sf10, a doclens join was the entire serving floor), and the
    * corpus stats are the SUM over the per-batch partial rows the
    * index maintains — exact under any build/append history, no
    * re-measurement. Total serve cost is bounded by the query terms'
    * buckets plus two broadcast-tiny sides. Scoring is byte-identical
    * to [[topK]] (same [[perTermScore]] tree, same rank tail), which
    * is what lets t14's exact oracle gate the entire stored path.
    */
  def topKIndexed(spark: SparkSession, prefix: String,
                  terms: Seq[String], k: Int): DataFrame = {
    val post = spark.table(s"${prefix}_postings")
      .filter(col("term").isin(terms: _*))
    val df = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = spark.table(s"${prefix}_stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    rankTail(
      post.join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          perTermScore(col("tf"), col("df"), col("dl"),
            col("n_docs"), col("sum_dl")).as("s")),
      k)
  }

  /** BM25 top-k for a BATCH of queries in one plan — the production
    * serving shape: `queryTerms` is (query_id, term), one row per
    * query term. The batch's distinct vocabulary is collected to the
    * driver (query batches are request-sized by definition — this is
    * what turns the postings scan into a literal `isin` that
    * BUCKET-PRUNES like the single-query path; a join-based restrict
    * would force a full postings scan), each matching posting fans
    * out to the queries containing its term via a broadcast of the
    * (query_id, term) pairs, per-(query, doc) scores aggregate on
    * exactly the candidate rows, and the per-query top-k is the
    * bounded [[graft.functions.TopKAgg]] tail (≤k rows per query per
    * partition cross the final shuffle — never the scored candidate
    * multiset). Scoring per query is byte-identical to [[topK]], so
    * the batch form is gated by the same per-query oracle replay.
    * Output: (query_id, doc_id, score, rank).
    */
  def topKIndexedBatch(spark: SparkSession, prefix: String,
                       queryTerms: DataFrame, k: Int): DataFrame = {
    // one driver round-trip materializes the batch (request-sized by
    // definition); the list-backed createDataFrame makes q a true
    // LocalRelation — no job, no RDD scan, to re-derive it per use —
    // and the vocabulary is a plain literal list
    val pairs = queryTerms.select(col("query_id"), col("term")).distinct().collect()
    val q = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(pairs: _*), queryTerms.select(
        col("query_id"), col("term")).schema))
    val vocab = pairs.map(_.getString(1)).distinct.toSeq
    val post = spark.table(s"${prefix}_postings")
      .filter(col("term").isin(vocab: _*))
    val df = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = spark.table(s"${prefix}_stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val scored = post
      .join(q, Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        perTermScore(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("sum_dl")).as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("s")).cast(DoubleType), 6).as("score"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.tag").as("doc_id"),
        col("t.score").as("score"), (col("pos") + 1).as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
