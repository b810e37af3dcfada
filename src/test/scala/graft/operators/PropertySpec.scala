package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.ann.Quantize
import graft.functions.Md5Bucket60

/** Property sweeps over randomized inputs (deterministic scalacheck
  * seeds) for the algebraic invariants the example-based specs can't
  * cover exhaustively: quantization error bounds, hash-sampling
  * monotonicity and partitioning-independence, hash-bucket range,
  * token-budget prefix stability.
  */
final class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, next) = (g.apply(Gen.Parameters.default, s), s.next)
      (next, v)
    }.drop(1).map(_._2).flatten.take(n).toSeq

  test("quantize: every element within scale/2 of original, quantized range bounded") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e4f, 1e4f))
    val vecs = sample(vecGen, 200, seed = 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("id", "vec")
    val rows = Quantize.int8(vecs)
      .join(vecs.select(col("id"), col("vec").as("orig")), Seq("id"))
      .select(col("id"), col("scale"), col("qvec"), col("orig"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val qv    = r.getSeq[Int](2)
      val orig  = r.getSeq[Float](3)
      assert(qv.forall(q => q >= -127 && q <= 127), s"id=${r.getLong(0)} out of int8 range")
      orig.zip(qv).foreach { case (x, q) =>
        assert(math.abs(x.toDouble - q * scale) <= scale / 2 + 1e-9,
          s"id=${r.getLong(0)}: $x vs ${q * scale} at scale $scale")
      }
    }
  }

  test("md5 bucket is always in [0, 2^60) and stable across partitionings") {
    val keys = sample(Gen.alphaNumStr.suchThat(_.nonEmpty), 300, seed = 13L)
      .distinct.toDF("k")
    val b1 = keys.select(col("k"), Md5Bucket60(col("k")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b2 = keys.repartition(17).select(col("k"), Md5Bucket60(col("k")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b1 == b2, "bucket must be a pure function of the key")
    assert(b1.values.forall(b => b >= 0L && b < Md5Bucket60.Space))
  }

  test("hash sampling: monotone in rate for arbitrary key sets") {
    val keys = sample(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2), 500, seed = 17L)
      .distinct.toDF("id")
    val rates = Seq(0.1, 0.25, 0.5, 0.9)
    val kept = rates.map { r =>
      r -> Sampling.hashSample(keys, col("id"), r).collect().map(_.getLong(0)).toSet
    }
    kept.sliding(2).foreach {
      case Seq((rl, sl), (rh, sh)) =>
        assert(sl.subsetOf(sh), s"rate $rl sample must be a subset of rate $rh")
      case _ => ()
    }
  }

  test("token budget: kept set is a stable prefix across budgets and partitionings") {
    val docs = sample(Gen.chooseNum(1, 50), 400, seed = 19L).zipWithIndex
      .map { case (n, i) => (i.toLong, s"s${i % 3}", n.toLong) }
      .toDF("id", "stratum", "n_tokens")
    def keptAt(b: Long, parts: Int): Set[Long] =
      Sampling.tokenBudget(docs.repartition(parts), col("id"), col("stratum"),
          col("n_tokens"), b)
        .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    val budgets = Seq(100L, 500L, 2000L)
    val atP5 = budgets.map(keptAt(_, 5))
    // partitioning-independent
    assert(budgets.map(keptAt(_, 23)) == atP5)
    // monotone prefix
    atP5.sliding(2).foreach {
      case Seq(small, large) => assert(small.subsetOf(large))
      case _ => ()
    }
  }
}
