package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LineageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("truncate preserves rows and schema") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val t = Lineage.truncate(df)
    assert(t.schema == df.schema)
    assert(t.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("truncate resets compounded plan statistics (the CC driver-stall defect)") {
    // localCheckpoint carries origin stats; self-joining a relation
    // with itself k times in a loop therefore grows sizeInBytes'
    // BIT LENGTH geometrically (measured 63 -> 189,292 bits in 12
    // pointer-jump rounds, tools/StatsProbe) until planning stalls
    // in BigInteger arithmetic. truncate must return a relation
    // whose stats do NOT inherit the compounded product.
    var df = spark.range(100).select(col("id"), col("id").as("label"))
    for (_ <- 1 to 6) { // six self-join doublings
      df = df.join(df.select(col("label").as("id"), col("id").as("lab2")), Seq("id"))
        .select(col("id"), col("lab2").as("label"))
        .localCheckpoint(true)
    }
    val dirtyBits = df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    val clean     = Lineage.truncate(df)
    val cleanBits = clean.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(dirtyBits > 100, s"expected compounded stats, got $dirtyBits bits")
    assert(cleanBits <= 64, s"truncate must reset stats, got $cleanBits bits")
  }

  test("loopCheckpoint holds the amortized stat-bit ceiling over many rounds") {
    // The resetEvery=6 constant is load-bearing for EVERY iterative
    // operator (CC, PageRank, BFS): bare checkpoints compound stat
    // bits ~2× per self-referencing round until join planning stalls
    // in BigInteger.multiply (the sf10 driver hang). This pins the
    // invariant the constant buys — bit length stays ≤ ~64·2^6 at
    // every round, indefinitely — so a revert to bare localCheckpoint
    // inside a loop fails HERE, not as a scale-tier hang.
    def loop(rounds: Int,
             ck: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) = {
      var df = spark.range(50).select(col("id"), col("id").as("label"))
      (0 until rounds).map { r =>
        df = ck(df.join(df.select(col("label").as("id"), col("id").as("lab2")), Seq("id"))
          .select(col("id"), col("lab2").as("label")), r)
        df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      }
    }
    val ceiling = 64 << 6 // bits just before the 1-in-6 rewrap lands
    val bounded = loop(15, (d, r) => Lineage.loopCheckpoint(d, r))
    assert(bounded.forall(_ <= ceiling), s"amortized ceiling violated: $bounded")
    // ...and the ceiling holds BECAUSE of the rewrap: the same loop on
    // bare localCheckpoint blows through it within the same 15 rounds
    val bare = loop(15, (d, _) => d.localCheckpoint(true))
    assert(bare.max > ceiling, s"expected bare checkpoints to compound: $bare")
  }
}
