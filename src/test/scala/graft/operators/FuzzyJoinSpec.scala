package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

final class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Classic dynamic-programming Levenshtein, the spec's ground truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // planted typos at distance 1 (deletion, insertion, substitution)
  // and 2 (transposition = sub+sub, double edits), plus decoys
  private val words = Seq(
    "widget", "widgets", "widgt", "wigdet", "gadget",
    "anvil", "anvils", "axvil", "bolt", "bolts", "colt",
    "ring", "rang", "rng", "rim", "", "a", "b", "ab")

  private def bruteForce(k: Int): Set[(String, String)] =
    (for {
      a <- words; b <- words
      if lev(a, b) <= k
    } yield (a, b)).toSet

  private def viaJoin(k: Int): Set[(String, String)] = {
    val df = words.toDF("w")
    FuzzyJoin.editDistanceJoin(df, "w", df, "w", k)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("k=1 join equals the brute-force all-pairs result") {
    assert(viaJoin(1) == bruteForce(1))
  }

  test("k=2 join equals the brute-force all-pairs result") {
    assert(viaJoin(2) == bruteForce(2))
  }

  test("deletion neighborhood is complete: every lev<=k pair shares a variant") {
    // the blocking-correctness invariant, asserted directly on the
    // exploded neighborhoods rather than through the join
    val df = words.toDF("w")
    for (k <- 1 to 2) {
      val hoods = df.select($"w",
          FuzzyJoin.deletionNeighborhood($"w", k).as("vs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
      for { a <- words; b <- words if lev(a, b) <= k }
        assert(hoods(a).intersect(hoods(b)).nonEmpty,
          s"no shared $k-deletion variant for ($a, $b)")
    }
  }

  test("reported dist is the true edit distance; nothing above k survives") {
    val df = words.toDF("w")
    val out = FuzzyJoin.editDistanceJoin(df, "w", df, "w", 2).collect()
    out.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(d == lev(a, b) && d <= 2, s"($a,$b) dist $d vs ${lev(a, b)}")
    }
  }

  test("empty and single-char strings are handled (no negative sequence ranges)") {
    val df = Seq("", "a", "ab").toDF("w")
    val pairs = FuzzyJoin.editDistanceJoin(df, "w", df, "w", 1)
      .filter($"left_val" < $"right_val")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("", "a"), ("a", "ab")))
  }
}
