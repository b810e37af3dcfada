package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — both sides are intervals, keyed by a
  * partition column (the genomics shape: variants × regions per
  * chromosome; here sessions × sessions per user). Spark has no
  * native interval join; the naive formulation is an inequality
  * cross join per key — quadratic in the key's row count.
  *
  * Strategy: bin-and-residual, the interval generalization of
  * `TemporalJoins.rangeJoin`'s point-vs-window bucketing. Each
  * interval `[s, e)` explodes to the fixed-width bins it touches
  * (`floor(s/w) .. floor((e-1)/w)` — fan-out is `len/w + 1`, bounded
  * by the interval length, never by data volume), both sides shuffle
  * once on `(key, bin)`, and the equi-join's residual keeps real
  * overlaps: `s1 < e2 AND s2 < e1` (half-open).
  *
  * A pair that overlaps across several bins would match in each
  * common bin; instead of a post-hoc `distinct` (a second full
  * shuffle of the OUTPUT, which is the largest relation in the
  * plan), the residual pins each pair to its FIRST common bin:
  * `bin == floor(greatest(s1, s2) / w)`. The bin holding the later
  * start is always common to both intervals (it is the later side's
  * first bin, and it precedes the earlier side's end since the
  * intervals overlap), so every overlapping pair is emitted exactly
  * once, in codegen, for free.
  *
  * At 100 TB: one exchange per side on `(key, bin)`, AQE-skew-split
  * when a hot key×bin blows up; `w` trades fan-out (small w → more
  * bin rows) against residual selectivity (large w → more false
  * candidates sharing a bin) — set it near the median interval
  * length. Zero-length intervals (`s >= e`) match nothing and are
  * dropped at the scan.
  *
  * Contract: start/end columns are LONGs in the same unit as
  * `binSize` (use `unix_micros` for timestamps); apart from `key`
  * the two sides' column names must be disjoint (the join returns
  * both payloads side by side).
  */
object IntervalJoin {

  def overlap(left: DataFrame, right: DataFrame, key: String,
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val dup = left.columns.toSet.intersect(right.columns.toSet) - key
    require(dup.isEmpty,
      s"overlap: column names must be disjoint apart from '$key', both sides have " +
        dup.mkString(", "))

    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) < col(e)) // zero/negative-length intervals match nothing
      .withColumn("__bin", explode(sequence(
        floorDiv(col(s), binSize), floorDiv(col(e) - 1, binSize))))

    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd).withColumnRenamed("__bin", "__rbin")

    l.join(r,
        l(key) === r(key) && col("__bin") === col("__rbin") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          col("__bin") === floorDiv(greatest(col(lStart), col(rStart)), binSize))
      .drop(r(key)).drop("__bin", "__rbin")
  }

  /** Exact integer floor division (Spark's `/` on longs goes through
    * double, whose rounding can misplace bin boundaries; its integer
    * `div` truncates toward zero, wrong for negative coordinates).
    * `c - pmod(c, w)` is an exact multiple of `w`, so the division
    * is exact integer math.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")
}
