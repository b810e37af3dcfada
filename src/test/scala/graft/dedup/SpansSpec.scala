package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class SpansSpec extends SparkTestBase {

  import spark.implicits._

  // windowLen 10, stride 5 keeps fixtures readable: windows at
  // 0, 5, 10, ... over trim(text). Fillers use non-repeating chars so
  // they never create accidental duplicate windows of their own.
  private def spans(docs: Seq[(Long, String)]) =
    Spans.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowLen = 10, stride = 5)
      .orderBy(col("doc_id"), col("span_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("a substring shared across two docs marks a span in both") {
    val shared = "ABCDEFGHIJ" // exactly one window
    val got = spans(Seq(
      1L -> s"${shared}klmnopqrstuvwxy",
      2L -> s"${shared}KLMNOPQRSTUVWXY"))
    // each doc: the window at pos 0 is duplicated; windows at 5+ differ
    assert(got.toSeq == Seq((1L, 0L, 10L, 1L), (2L, 0L, 10L, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    val shared = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val got = spans(Seq(
      1L -> s"${shared}uvwxyz._!?",
      2L -> s"01234${shared}56789"))
    // doc 1: duplicated windows at 0,5,10 -> one span [0,20);
    // doc 2: the same three windows sit at 5,10,15 -> [5,25)
    assert(got.toSeq == Seq((1L, 0L, 20L, 3L), (2L, 5L, 25L, 3L)))
  }

  test("within-document repetition counts as duplication") {
    val w = "ABCDEFGHIJ"
    val got = spans(Seq(1L -> s"$w$w"))
    // windows at 0 and 10 hash equal (the window at 5 spans the seam
    // and is unique); [0,10) and [10,20) touch, so they merge
    assert(got.toSeq == Seq((1L, 0L, 20L, 2L)))
  }

  test("disjoint duplicated regions stay separate spans") {
    val a = "ABCDEFGHIJ"
    val b = "QRSTUVWXYZ"
    val got = spans(Seq(
      1L -> s"${a}klmnopwxy?$b",
      2L -> s"${a}0123456789$b"))
    // a matches at pos 0, b at pos 20; the middles differ, so the two
    // duplicated regions must NOT merge across the unique gap
    assert(got.toSeq == Seq(
      (1L, 0L, 10L, 1L), (1L, 20L, 30L, 1L),
      (2L, 0L, 10L, 1L), (2L, 20L, 30L, 1L)))
  }

  test("docs shorter than the window produce no rows and zero report") {
    val got = spans(Seq(1L -> "short", 2L -> "also tiny"))
    assert(got.isEmpty)
    val rep = Spans.spanReport(
        Seq((1L, "short"), (2L, "also tiny")).toDF("doc_id", "text"),
        "doc_id", "text", windowLen = 10, stride = 5)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rep.toSeq == Seq((1L, 0L, 0L, 0.0), (2L, 0L, 0L, 0.0)))
  }

  test("cutSpans excises marked spans and passes clean docs through") {
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val rows = Spans.cutSpans(
        Seq((1L, s"${shared}uvwxyz._!?"), (2L, s"01234${shared}56789"),
            (3L, "entirely unique text with no duplicate windows at all"),
            (4L, "tiny"))
          .toDF("doc_id", "text"),
        "doc_id", "text", windowLen = 10, stride = 5)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    // doc 1 loses [0,20): tail survives; doc 2 loses [5,25): prefix+tail
    assert(rows.toSeq == Seq(
      (1L, "uvwxyz._!?", 20L),
      (2L, "0123456789", 20L),
      (3L, "entirely unique text with no duplicate windows at all", 0L),
      (4L, "tiny", 0L)))
  }

  test("a doc fully covered by a span cuts to empty, not to the original") {
    val w = "ABCDEFGHIJ"
    val rows = Spans.cutSpans(
        Seq((1L, s"$w$w"), (2L, s"zz$w${w}zz")).toDF("doc_id", "text"),
        "doc_id", "text", windowLen = 10, stride = 5)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 1 is exactly the duplicated region [0,20) -> empty; doc 2
    // keeps its unique fringe... windows at 0,5,10 of doc2 differ from
    // doc1's (offset 2), so only the doc1-internal repeat cuts
    assert(rows.head == (1L -> ""))
  }

  test("span report fractions account every doc, zeros included") {
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val rep = Spans.spanReport(
        Seq((1L, s"${shared}uvwxyz._!?"), (2L, s"${shared}0123+-*/=%"),
            (3L, "entirely unique text with no duplicate windows at all"))
          .toDF("doc_id", "text"),
        "doc_id", "text", windowLen = 10, stride = 5)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1/2: span [0,20) -> 20 dup chars of 30; doc 3: zero spans
    assert(rep.toSeq == Seq((1L, 30L, 1L, 20L), (2L, 30L, 1L, 20L), (3L, 53L, 0L, 0L)))
  }
}
