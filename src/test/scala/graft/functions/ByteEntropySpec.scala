package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class ByteEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def h(s: String): Option[Double] =
    Option(Seq(s).toDF("t")
      .select(ByteEntropy(col("t").cast("binary")).as("h"))
      .collect().head.get(0)).map(_.asInstanceOf[Double])

  test("known entropies: uniform alphabets hit log2(k) to quantization precision") {
    // terms are DECIMAL(24,12)-quantized, so exact up to ~1e-12
    assert(math.abs(h("aaaa").get - 0.0) < 1e-11)
    assert(math.abs(h("ab").get - 1.0) < 1e-11)
    assert(math.abs(h("abcd").get - 2.0) < 1e-11)
    assert(math.abs(h("aabb" * 10).get - 1.0) < 1e-11)
  }

  test("all-256-distinct-bytes payload scores 8 bits/byte; empty is NULL") {
    val full = (0 until 256).map(_.toByte).toArray
    val row = Seq((full, Array.empty[Byte])).toDF("full", "empty")
      .select(ByteEntropy(col("full")).as("f"), ByteEntropy(col("empty")).as("e"))
      .collect().head
    assert(math.abs(row.getDouble(0) - 8.0) < 1e-12)
    assert(row.isNullAt(1))
  }

  test("skewed text scores strictly below its uniform-alphabet ceiling") {
    val skew = h("aaaaaaaaab").get // 2 symbols but heavily skewed
    assert(skew > 0.0 && skew < 1.0)
  }

  test("SQL registration and codegen path agree with interpreted eval") {
    graft.GraftFunctions.register(spark)
    val docs = Seq("the quick brown fox", "aaaa", "abcdefgh").toDF("t")
    val viaSql = docs.selectExpr("byte_entropy(cast(t as binary)) AS h")
      .as[Double].collect().toSeq
    val interpreted = docs.collect().map { r =>
      ByteEntropyImpl.compute(r.getString(0).getBytes("UTF-8")).doubleValue()
    }.toSeq
    assert(viaSql == interpreted)
  }
}
