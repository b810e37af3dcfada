package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** "More like this": rank documents by SPARSE tf-idf term-overlap
  * similarity to one source document — the Lucene MoreLikeThis shape,
  * and the sparse complement of the dense-embedding near-dup family
  * (d5/d10): no embeddings required, the stored inverted index IS the
  * vector space.
  *
  * The source doc's representative terms are capped at
  * `maxQueryTerms` by (tf desc, term asc) — Lucene's maxQueryTerms
  * dial, and the property that makes serving scale-sane: the term
  * list is request-bounded by construction, collected once, and
  * turns the candidate scan into a literal `isin` that BUCKET-PRUNES
  * the postings table exactly like a BM25 lookup. Nothing
  * vocabulary- or corpus-sized is ever broadcast.
  *
  * Score(C) = Σ_t (tf_S·idf_t) · (tf_C·idf_t) / (dl_S · dl_C) over
  * the capped terms, idf_t = ln((n_docs + 1)/(df_t + 1)) (the t6
  * TF-IDF formula), lengths from the norm-in-posting dl column —
  * a length-normalized sparse dot product. Per-term contributions
  * are double math over exact integer stats quantized to
  * DECIMAL(32,15) before the order-independent per-doc sum; the
  * final score rounds to 9 with ties broken by doc_id.
  */
object Mlt {

  /** The source doc's capped term profile, read from the doc_id-
    * bucketed `<prefix>_profile` FORWARD table the index persists
    * for exactly this doc-keyed access (the same move as IvfPqIndex's
    * id-bucketed `_vecs`): the predicate prunes to one bucket, so
    * fetching one document's ≤`maxQueryTerms` rows costs one bucket
    * read — never a scan of the corpus-sized postings table, whose
    * term-bucketing a doc_id predicate cannot prune. Exposed so the
    * spec can pin that plan shape.
    */
  /** Pin bucketed scans on while planning/running `f`: a pure
    * filter+limit plan has no join or aggregate that needs the
    * bucket distribution, so `DisableUnnecessaryBucketedScan` turns
    * the bucketed read off — and with it the BUCKET PRUNING that is
    * the entire point of the doc_id-bucketed profile read. The rule
    * optimizes for exchange elimination and does not model pruning
    * benefit; scoped here, restored after.
    */
  private[graft] def withBucketedScan[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private[graft] def sourceProfile(spark: SparkSession, prefix: String,
                                   srcDocId: Long, maxQueryTerms: Int): DataFrame = {
    val profileTable = s"${prefix}_profile"
    require(spark.catalog.tableExists(profileTable),
      s"more-like-this serves the source profile from the doc_id-bucketed " +
        s"$profileTable table — build the TextIndex with forward = true")
    spark.table(profileTable)
      .filter(col("doc_id") === srcDocId)
      .select(col("term"), col("tf"), col("dl"))
      .orderBy(col("tf").desc, col("term"))
      .limit(maxQueryTerms)
  }

  /** Top-k most-similar documents to `srcDocId`, served from a
    * persisted [[graft.index.TextIndex]] built with `forward = true`.
    * Output: (doc_id, n_shared_terms, score, rank-free ordered rows).
    */
  def topKIndexed(spark: SparkSession, prefix: String, srcDocId: Long,
                  k: Int, maxQueryTerms: Int = 25): DataFrame = {
    val post = spark.table(s"${prefix}_postings")
    // the capped profile is request-sized by construction
    // (≤ maxQueryTerms rows), one bucket-pruned driver round-trip
    val srcRows = withBucketedScan(spark) {
      sourceProfile(spark, prefix, srcDocId, maxQueryTerms).collect()
    }
    val terms = srcRows.map(_.getString(0)).toSeq
    // list-backed createDataFrame -> a true LocalRelation (≤25 rows)
    val src = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(srcRows: _*),
      post.select(col("term"), col("tf").as("tf_s"), col("dl").as("dl_s")).schema))
    val cand = post.filter(col("term").isin(terms: _*))
    val df = cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = spark.table(s"${prefix}_stats")
      .agg(sum(col("n_docs")).as("n_docs"))
    val idf = log((col("n_docs").cast(DoubleType) + lit(1.0)) /
      (col("df").cast(DoubleType) + lit(1.0)))
    def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val out = cand.filter(col("doc_id") =!= srcDocId)
      .join(src, Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"),
        round((D(col("tf_s")) * idf) * (D(col("tf")) * idf) /
          (D(col("dl_s")) * D(col("dl"))), 15)
          .cast(DecimalType(32, 15)).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_terms"),
        round(sum(col("s")).cast(DoubleType), 9).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // force the plan under the pinned conf (the Phrase.matchesIndexed
    // rationale): every join here is broadcast by construction, so the
    // candidate scan's bucket pruning survives only as long as the
    // planner deems the term bucketing useful — pin it, don't hope
    withBucketedScan(spark) { out.queryExecution.executedPlan }
    out
  }

  /** More-like-this for a BATCH of source docs in ONE plan — the x4
    * batching move applied to the sparse-similarity surface (the
    * "related documents for a whole result page" serving shape). All
    * sources' capped profiles come from ONE bucket-pruned scan of
    * the forward table (the batch ids are a literal `isin` on the
    * bucketing key; the per-source cap is a window over the ≤|batch|
    * fetched docs' rows, then one driver round-trip — request-sized
    * by construction). The batch vocabulary turns the candidate scan
    * into a literal `isin` exactly like the single-source path,
    * candidates fan out per source via the broadcast profile rows,
    * and each source's top-k is the bounded [[graft.functions
    * .TopKPayloadAgg]] tail (≤k rows per source per partition cross
    * the final shuffle, the shared-term count riding as the
    * payload). Per-source scoring is byte-identical to
    * [[topKIndexed]], so the batch form is gated by per-source
    * oracle replay. Output: (src_id, doc_id, n_shared_terms, score,
    * rank).
    */
  def topKIndexedBatch(spark: SparkSession, prefix: String, srcDocIds: Seq[Long],
                       k: Int, maxQueryTerms: Int = 25): DataFrame = {
    require(srcDocIds.nonEmpty, "batch needs at least one source doc")
    require(srcDocIds.distinct == srcDocIds, "batch source ids must be distinct")
    val profileTable = s"${prefix}_profile"
    require(spark.catalog.tableExists(profileTable),
      s"more-like-this serves source profiles from the doc_id-bucketed " +
        s"$profileTable table — build the TextIndex with forward = true")
    import org.apache.spark.sql.expressions.Window
    val capped = spark.table(profileTable)
      .filter(col("doc_id").isin(srcDocIds: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("tf").desc, col("term"))))
      .filter(col("rn") <= maxQueryTerms)
      .select(col("doc_id").as("src_id"), col("term"),
        col("tf").as("tf_s"), col("dl").as("dl_s"))
    val profRows = withBucketedScan(spark) { capped.collect() }
    val src = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(profRows: _*), capped.schema))
    val vocab = profRows.map(_.getString(1)).distinct.toSeq
    val post = spark.table(s"${prefix}_postings")
    val cand = post.filter(col("term").isin(vocab: _*))
    val df = cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = spark.table(s"${prefix}_stats")
      .agg(sum(col("n_docs")).as("n_docs"))
    val idf = log((col("n_docs").cast(DoubleType) + lit(1.0)) /
      (col("df").cast(DoubleType) + lit(1.0)))
    def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val scored = cand
      .join(src, Seq("term"))
      .filter(col("doc_id") =!= col("src_id"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("src_id"), col("doc_id"),
        round((D(col("tf_s")) * idf) * (D(col("tf")) * idf) /
          (D(col("dl_s")) * D(col("dl"))), 15)
          .cast(DecimalType(32, 15)).as("s"))
      .groupBy(col("src_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared_terms"),
        round(sum(col("s")).cast(DoubleType), 9).as("score"))
    val out = scored
      .groupBy(col("src_id"))
      .agg(graft.functions.TopKPayloadAgg(
        col("score"), col("doc_id"), col("n_shared_terms"), k).as("top"))
      .select(col("src_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("src_id"), col("t.tag").as("doc_id"),
        col("t.payload").as("n_shared_terms"), col("t.score").as("score"),
        (col("pos") + 1).as("rank"))
      .orderBy(col("src_id"), col("rank"))
    withBucketedScan(spark) { out.queryExecution.executedPlan }
    out
  }
}
