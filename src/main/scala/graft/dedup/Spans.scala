package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring spans — substring-level dedup in the
  * style of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better"), recast from suffix arrays to set
  * operations over hashed rolling windows so it distributes:
  *
  *   1. slide a fixed-length character window (stride `stride`) over
  *      each document and hash every window;
  *   2. a window hash occurring ≥ 2 times anywhere in the corpus
  *      (other documents OR elsewhere in the same one) marks all its
  *      occurrences as duplicated;
  *   3. per document, overlapping/adjacent duplicated windows merge
  *      into maximal [span_start, span_end) spans — the regions a
  *      training-data build would cut.
  *
  * Unlike a suffix array this is stride-quantized (spans are accurate
  * to `stride` chars and substrings shorter than `windowLen` are
  * invisible), which is the standard large-scale trade: every stage
  * is a keyed shuffle. At 100 TB: window hashing rides the scan
  * (`len/stride` rows per doc), duplicate detection is one
  * map-side-combined group-by on the hash, the semi-join back
  * re-shuffles only (hash, doc, pos) triples — text never shuffles —
  * and span merging is a per-document sort-window, parallel across
  * docs. Nothing is all-pairs anywhere.
  */
object Spans {

  /** Maximal duplicated spans per document:
    * (doc_id, span_start, span_end, n_windows), spans half-open
    * character intervals over `trim(text)`, `n_windows` the count of
    * duplicated windows merged into the span.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      windowLen: Int = 40, stride: Int = 10): DataFrame = {
    val wins = df
      .select(col(idCol).as("doc_id"), trim(col(textCol)).as("t"))
      .filter(length(col("t")) >= windowLen)
      .select(col("doc_id"),
        explode(sequence(
          lit(0L), (length(col("t")) - windowLen).cast("long"),
          lit(stride.toLong))).as("pos"),
        col("t"))
      .select(col("doc_id"), col("pos"),
        md5(substr(col("t"), col("pos") + 1, lit(windowLen)).cast("binary")).as("h"))
    // a window is duplicated if its hash occurs >= 2 times corpus-wide
    val dupH = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("h")
    val occ = wins.join(dupH, Seq("h"), "left_semi")
    // gaps-and-islands interval merge: a window starts a new span iff
    // it begins after every earlier window's end
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMaxEnd = max(col("pos") + windowLen)
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    occ
      .withColumn("brk",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + windowLen).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }

  /** The transformation [[duplicatedSpans]] marks: cut every
    * duplicated span out of each document and return the cleaned
    * text (all docs, zero-inclusive — span-free docs pass through).
    * Relational throughout so any engine replays it: keep-segments
    * are the gaps between consecutive spans (lag window) plus the
    * tail after the last span, each segment substrings out, and the
    * doc reassembles with an order-pinned concat — no per-row UDF,
    * and the only shuffles are the span pipeline's plus one window
    * and one doc-keyed aggregation.
    */
  def cutSpans(df: DataFrame, idCol: String, textCol: String,
               windowLen: Int = 40, stride: Int = 10): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), trim(col(textCol)).as("t"))
    val spans = duplicatedSpans(df, idCol, textCol, windowLen, stride)
    val byStart = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    // gap before each span, then the tail after the last span
    val gaps = spans
      .withColumn("keep_start",
        coalesce(lag(col("span_end"), 1).over(byStart), lit(0L)))
      .select(col("doc_id"), col("keep_start"), col("span_start").as("keep_end"))
    val tails = spans.groupBy(col("doc_id"))
      .agg(max(col("span_end")).as("keep_start"))
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("keep_start"),
        length(col("t")).cast("long").as("keep_end"))
    val cleaned = gaps.unionByName(tails)
      .filter(col("keep_end") > col("keep_start"))
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("keep_start"),
        substr(col("t"), col("keep_start") + 1,
          (col("keep_end") - col("keep_start")).cast("int")).as("seg"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("keep_start"), col("seg")))),
        x => x.getField("seg"))).as("clean_text"))
    // a doc whose every char sits in a span has spans but no
    // segments — its clean text is empty, not the original
    val hasSpans = spans.select(col("doc_id")).distinct()
      .withColumn("has_spans", lit(1))
    docs
      .join(cleaned, Seq("doc_id"), "left_outer")
      .join(hasSpans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("has_spans").isNotNull, coalesce(col("clean_text"), lit("")))
          .otherwise(col("t")).as("clean_text"),
        length(col("t")).cast("long").as("n_chars"))
      .withColumn("clean_len", length(col("clean_text")).cast("long"))
      .withColumn("n_cut", col("n_chars") - col("clean_len"))
  }

  /** Per-document duplication accounting over [[duplicatedSpans]]:
    * every document reports its total duplicated character count and
    * fraction (zeros included, so the whole corpus hashes). The
    * companion report a corpus build uses to decide cut thresholds.
    */
  def spanReport(df: DataFrame, idCol: String, textCol: String,
                 windowLen: Int = 40, stride: Int = 10): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, windowLen, stride)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("dup_chars"))
    df.select(col(idCol).as("doc_id"), length(trim(col(textCol))).cast("long").as("n_chars"))
      .join(spans, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"), col("n_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        round(coalesce(col("dup_chars"), lit(0L)).cast("double") /
          greatest(col("n_chars"), lit(1L)), 6).as("dup_frac"))
  }
}
