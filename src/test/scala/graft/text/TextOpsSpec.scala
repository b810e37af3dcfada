package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("token stats") {
    val df = Seq((1L, "hello  world foo"), (2L, "   "), (3L, "a b a")).toDF("id", "text")
    val res = df.select(
      col("id"),
      TextOps.nTokens(col("text")).as("n"),
      TextOps.nDistinctTokens(col("text")).as("nd")
    ).collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(res(1L) == ((3, 3)))
    assert(res(2L) == ((0, 0)))
    assert(res(3L) == ((3, 2)))
  }

  test("bpe-ish token count") {
    val df = Seq((1L, "don't stop 123!")).toDF("id", "text")
    // tokens: don | ' | t | stop | 123 | !
    val n = df.select(TextOps.nBpeTokens(col("text")).cast("long")).head().getLong(0)
    assert(n == 6)
  }

  test("language id picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog went to the house of a friend"),
      (2L, "le chat et la maison des amis dans un jardin pour le soir"),
      (3L, "el gato y la casa de los amigos es una historia que contar"),
      (4L, "der hund und die katze sind ein gutes team mit viel energie"),
      (5L, "这 是 一段 中文 文本 关于 猫 和 狗")
    ).toDF("id", "text")
    val res = df.select(col("id"), TextOps.langId(col("text")).getField("lang").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res(1L) == "en")
    assert(res(2L) == "fr")
    assert(res(3L) == "es")
    assert(res(4L) == "de")
    assert(res(5L) == "zh")
  }

  test("pii redaction scrubs urls, emails, ips, phones; leaves clean text alone") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "docs at https://docs.example.com/a?b=1 and http://x.io"),
      (3L, "server 192.168.1.200 and 10.0.0.7 respond"),
      (4L, "call +1 555-123-4567 or 555 987 6543 now"),
      (5L, "perfectly clean text with numbers 12345 and dots a.b")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "docs at <URL> and <URL>")
    assert(out(3L) == "server <IP> and <IP> respond")
    assert(out(4L) == "call +1 <PHONE> or <PHONE> now")
    assert(out(5L) == "perfectly clean text with numbers 12345 and dots a.b")
    // idempotent: a second pass changes nothing
    val twice = df.select(TextOps.redactPii(TextOps.redactPii(col("text"))).as("r"))
      .collect().map(_.getString(0)).toSet
    assert(twice == out.values.toSet)
  }

  test("content fingerprint is order- and duplication-insensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha alpha"),
      (3L, "alpha beta delta")
    ).toDF("id", "text")
    val fps = df.select(col("id"), TextOps.contentFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("quality score is in [0,1] and favors natural text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the hills with a friend of mine"),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&&")
    ).toDF("id", "text")
    val q = df.select(col("id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }
}
