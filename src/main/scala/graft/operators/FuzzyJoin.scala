package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact edit-distance (Levenshtein ≤ k) similarity join without the
  * cartesian product — the entity-resolution / fuzzy-dedup primitive.
  *
  * Blocking is the SymSpell deletion-neighborhood scheme: if
  * lev(a, b) ≤ k then the longest common subsequence of a and b has
  * length ≥ max(|a|, |b|) − k, and that subsequence is reachable from
  * BOTH strings by deleting ≤ k characters — so a and b share at
  * least one member of their k-deletion neighborhoods. Candidates =
  * equi-join on deletion variants (complete, never misses a true
  * pair); an exact `levenshtein` verify then removes false
  * candidates. Every step is native codegen'd expressions — no UDFs.
  *
  * Scale shape: |D_k(s)| ≤ (|s| choose k) + … variants per distinct
  * value, each a SHORT string key in one equi-join — the classic
  * O(n²) all-pairs collapses to a hash join on blocked keys. Distinct
  * values are joined (not rows), so heavy value duplication never
  * multiplies the join. Long strings with large k explode the
  * neighborhood — this operator is for name/title/key-grade strings
  * (the SymSpell contract); document-grade text wants MinHash
  * (`dedup.MinHashLSH`) instead.
  */
object FuzzyJoin {

  /** All strings obtainable from `c` by deleting exactly one
    * character (empty input has no variants). Codegen-friendly:
    * sequence + transform + substr.
    */
  private def del1(c: Column): Column =
    when(length(c) > 0,
      array_distinct(transform(sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c))))))
      .otherwise(array().cast("array<string>"))

  /** The ≤ k-deletion neighborhood of `c`, including `c` itself. */
  def deletionNeighborhood(c: Column, k: Int): Column = {
    require(k >= 0, s"k must be >= 0, got $k")
    var acc = array(c)
    for (_ <- 1 to k) acc =
      array_distinct(concat(acc, flatten(transform(acc, x => del1(x)))))
    acc
  }

  /** All (left value, right value) pairs with levenshtein ≤ k.
    * Output columns: `left_val`, `right_val`, `dist` — one row per
    * distinct VALUE pair (join back on the value to recover rows).
    * Self-joins emit both (a,b) and (b,a); filter `left_val <
    * right_val` for unordered pairs.
    */
  def editDistanceJoin(left: DataFrame, leftCol: String,
                       right: DataFrame, rightCol: String, k: Int): DataFrame = {
    val lv = left.select(col(leftCol).as("left_val")).distinct()
      .select(col("left_val"),
        explode(deletionNeighborhood(col("left_val"), k)).as("__v"))
    val rv = right.select(col(rightCol).as("right_val")).distinct()
      .select(col("right_val"),
        explode(deletionNeighborhood(col("right_val"), k)).as("__v"))
    lv.join(rv, "__v")
      // length pre-filter is implied by a shared deletion variant but
      // cheap to restate; dedupe candidate pairs BEFORE the verify so
      // each pair pays exactly one levenshtein
      .filter(abs(length(col("left_val")) - length(col("right_val"))) <= k)
      .select(col("left_val"), col("right_val")).distinct()
      .withColumn("dist",
        levenshtein(col("left_val"), col("right_val")).cast(LongType))
      .filter(col("dist") <= k)
  }
}
