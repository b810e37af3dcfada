package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.dedup.MinHashLSH

final class DocsPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // ~15-word docs; a near-dup changes the last word (3 of 13 shingles
  // differ → jaccard 10/16 = 0.625, above the spec threshold 0.5;
  // unrelated docs share no shingle at all)
  private def doc(id: Long, tail: String): (Long, String, String, String, Long) = {
    val text = s"shared prefix words for document content that the pipeline " +
      s"shingles into overlapping grams $tail"
    (id, text, "en", "spec", text.length.toLong)
  }
  private def uniq(id: Long, words: String): (Long, String, String, String, Long) =
    (id, words, "en", "spec", words.length.toLong)

  private val seedDocs = Seq(
    doc(1L, "alpha"), // near-dup source for 101
    doc(3L, "gamma"), // near-dup source for 204
    uniq(5L, "entirely separate vocabulary nothing here repeats any shingle from other fixture documents at all"))
  private val batch1 = Seq(
    doc(101L, "alphaz"), // ≈ 1
    uniq(102L, "another fully distinct set of words carrying no gram overlap with anything else present"))
  private val batch2 = Seq(
    doc(201L, "alphaz"), // exact dup of 101 (cross-batch new↔new)
    doc(204L, "gammaz"), // ≈ 3 (existing↔batch2)
    uniq(205L, "final standalone document with its very own tokens sharing not one single gram anywhere"))

  private def allDocsDF: DataFrame =
    (seedDocs ++ batch1 ++ batch2)
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def writeRawFile(df: DataFrame, dest: String): Unit = {
    val stage = dest + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dest))
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect().toSet

  test("streamed near-dup gate over multiple batches equals the batch incremental run") {
    val srcDir  = tmpDir("docs-nd-src")
    val workDir = tmpDir("docs-nd-work")
    val df = allDocsDF
    // one file per batch; the file source processes oldest-mtime
    // first, matching the id-monotone arrival contract
    writeRawFile(df.filter($"doc_id" < 100), s"$srcDir/f0.parquet")
    writeRawFile(df.filter($"doc_id" >= 100 && $"doc_id" < 200), s"$srcDir/f1.parquet")
    writeRawFile(df.filter($"doc_id" >= 200), s"$srcDir/f2.parquet")
    Seq("f0", "f1", "f2").zipWithIndex.foreach { case (f, i) =>
      assert(new java.io.File(s"$srcDir/$f.parquet")
        .setLastModified(1000000000000L + i * 60000L))
    }

    val streamed = DocsPipeline.runNearDupGate(spark, srcDir, workDir,
      glob = "*.parquet", splitId = 100L,
      numHashes = 24, bands = 8, n = 3, minJaccard = 0.5,
      maxFilesPerTrigger = Some(1))

    val batch = MinHashLSH.nearDuplicatesIncremental(
      existing = df.filter($"doc_id" < 100),
      incoming = df.filter($"doc_id" >= 100),
      "doc_id", "text", numHashes = 24, bands = 8, n = 3, minJaccard = 0.5)

    val got = pairsOf(streamed)
    assert(got == pairsOf(batch))
    // the planted pairs are all present and every emitted b is new
    val ab = got.map(p => (p._1, p._2))
    assert(Set((1L, 101L), (1L, 201L), (101L, 201L), (3L, 204L)).subsetOf(ab))
    assert(got.forall(_._2 >= 100L))
  }

  test("text-index ingestion replays a committed batchId as a no-op (at-least-once closed)") {
    // foreachBatch re-offers a batch whose body completed but whose
    // stream commit-log write did not; the ingest-log marker makes
    // that replay skip instead of double-appending postings/stats
    val idx = graft.index.TextIndex("dps_ingest", nBuckets = 2)
    idx.drop(spark)
    try {
      val p1 = allDocsDF.filter($"doc_id" < 100).select($"doc_id", $"text")
      val p2 = allDocsDF.filter($"doc_id" >= 100).select($"doc_id", $"text")
      idx.build(p1)
      DocsPipeline.appendBatchOnce(idx, batchId = 0L, p2)
      val once = spark.table("dps_ingest_postings").collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|")))
      // the replay: same batchId, marker present -> nothing appended
      DocsPipeline.appendBatchOnce(idx, batchId = 0L, p2)
      val twice = spark.table("dps_ingest_postings").collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|")))
      assert(once.toSeq == twice.toSeq, "replayed batchId double-appended postings")
      assert(spark.table("dps_ingest_stats").count() == 2,
        "replayed batchId appended a second partial stats row")
      assert(spark.table("dps_ingest_ingest_log").as[Long].collect().toSeq == Seq(0L))
      // a NEW batchId appends normally
      DocsPipeline.appendBatchOnce(idx, batchId = 1L,
        Seq(uniq(900L, "late straggler document with words")).toDF(
          "doc_id", "text", "lang", "source", "n_chars").select($"doc_id", $"text"))
      assert(spark.table("dps_ingest_stats").count() == 3)
      // rebuild resets the log: pre-rebuild batch ids describe an
      // index that no longer exists
      idx.build(p1)
      assert(!spark.catalog.tableExists("dps_ingest_ingest_log"))
    } finally idx.drop(spark)
  }

  test("an input dir with no gated files yields an empty, correctly-shaped report") {
    val srcDir  = tmpDir("docs-nd-empty-src")
    val workDir = tmpDir("docs-nd-empty-work")
    writeRawFile(allDocsDF.filter($"doc_id" < 100), s"$srcDir/f0.parquet")
    val out = DocsPipeline.runNearDupGate(spark, srcDir, workDir,
      glob = "*.parquet", splitId = 100L, minJaccard = 0.5)
    assert(out.columns.toSeq == Seq("a", "b", "jaccard"))
    assert(out.count() == 0)
  }
}
