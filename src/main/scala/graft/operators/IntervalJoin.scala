package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Interval COALESCE (union / coverage): merge each key's
    * overlapping-or-adjacent half-open intervals into maximal
    * disjoint spans — the other half of the interval algebra
    * ([[overlap]] finds intersections, this finds the union), and
    * the standard finisher after any interval-producing step
    * (session coverage, duplicated-span merge, genomic region
    * union).
    *
    * Gaps-and-islands in one window pass: order each key's
    * intervals by (start, end), carry the running max end over
    * PRECEDING rows, and a new island starts exactly when a row's
    * start exceeds that max (strictly — touching intervals
    * `[1,5)[5,8)` are contiguous coverage and merge). The island
    * number is a running sum of those starts, and one group-by
    * collapses each island to its span.
    *
    * At 100 TB: ONE shuffle on `key` (window and group-by share the
    * partitioning — the agg reuses the window's exchange), within-key
    * sort is the only per-key cost, nothing is quadratic in interval
    * count. A single pathologically hot key is the skew limit, as
    * with any per-key ordered pass. Zero-length intervals (`s >= e`)
    * cover nothing and are dropped at the scan.
    *
    * Output: `(key, span_start, span_end, n_intervals)`, disjoint
    * per key, so `sum(span_end - span_start)` is exact coverage.
    */
  def coalesce(df: DataFrame, key: String, start: String, end: String): DataFrame = {
    val byStart = Window.partitionBy(col(key)).orderBy(col(start), col(end))
    val prevMax = max(col(end)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(start) < col(end))
      .withColumn("__new_island", // NULL prevMax = first row = new island
        when(prevMax.isNull || col(start) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("__island"))
      .agg(min(col(start)).as("span_start"), max(col(end)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
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
