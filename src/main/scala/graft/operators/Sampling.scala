package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Bucket60

/** Deterministic sampling for training-data curation.
  *
  * RNG-based `df.sample()` is unreproducible across retries,
  * partitionings, and engines — poison for dataset lineage. Hash
  * sampling instead keeps a row iff
  * `md5_bucket60(key ∥ salt) < rate · 2^60`: the decision is a pure
  * function of the row's key, so reruns, different cluster sizes,
  * and other engines (the DuckDB oracle) select the exact same rows;
  * changing `salt` draws an independent sample. Scales as a pure
  * predicate projection — no shuffle, no state, pushdown-friendly.
  */
object Sampling {

  private def bucket(keyCol: Column, salt: String): Column =
    Md5Bucket60(concat_ws("|", keyCol.cast("string"), lit(salt)))

  private def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    math.round(rate * Md5Bucket60.Space)
  }

  /** Keep ~`rate` of rows, decided by the key's hash bucket. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(bucket(keyCol, salt) < threshold(rate))

  /** Deterministic train/valid/test split: one hash draw per key
    * partitions the bucket space into adjacent intervals, so the
    * assignment is exhaustive and disjoint BY CONSTRUCTION (no row
    * lost or doubled — the classic bug of three independent
    * samples), reproducible across runs/partitionings/engines, and
    * stable under corpus growth: a key's split never changes when
    * other rows arrive, the property that keeps eval sets
    * uncontaminated across dataset versions. Adds a `split` column;
    * fractions must sum to ≤ 1 (remainder goes to the last split).
    */
  def trainValidTestSplit(df: DataFrame, keyCol: Column,
                          fractions: Seq[(String, Double)],
                          salt: String = "graft-split"): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val b = bucket(keyCol, salt)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = fractions.init.zip(cuts.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), cut), els) =>
      when(b < lit(threshold(cut)), lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Per-stratum rates (data mixing): each row's keep-rate comes from
    * its stratum — the "60% web, 30% code, 10% books" shape of
    * training-mix curation. Strata absent from `rates` use
    * `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       salt: String = "graft"): DataFrame = {
    val rateThreshold = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(strataCol === lit(stratum), lit(threshold(rate))).otherwise(acc)
    }
    df.filter(bucket(keyCol, salt) < rateThreshold)
  }

  /** Deterministic WEIGHTED sampling (Efraimidis–Spirakis priority
    * sampling, min-key form): each row draws a reproducible uniform
    * u = (hash+1)/2^60 from its key and gets priority
    * −ln(u)/weight; the k SMALLEST priorities are the sample, and
    * inclusion probability is proportional to weight — the
    * quality-weighted training-mix draw. Priorities round to 12
    * decimals (pure double math over exact ints — engine-replayable,
    * the t11 discipline) with key tie-breaks, so the selection is a
    * pure function of (key, weight, salt): reruns, partitionings,
    * and other engines pick the same rows. Priorities are a
    * projection; the top-k is a TakeOrdered (per-partition heads +
    * one k-row reduce), never a full sort.
    */
  def weightedPriority(keyCol: Column, weightCol: Column,
                       salt: String = "graft"): Column =
    round(-log((bucket(keyCol, salt) + 1).cast("double") /
      lit(Md5Bucket60.Space.toDouble)) / weightCol.cast("double"), 12)

  /** The k rows with smallest [[weightedPriority]] (weight-
    * proportional sample without replacement), priority carried in
    * column `priority`.
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     k: Int, salt: String = "graft"): DataFrame =
    df.withColumn("priority", weightedPriority(keyCol, weightCol, salt))
      .orderBy(col("priority"), keyCol)
      .limit(k)

  /** The DuckDB-side bucket expression for a key column, for oracle
    * SQL construction (kept next to the Spark definition so the two
    * can't drift).
    */
  def oracleBucketSql(keyExpr: String, salt: String = "graft"): String =
    s"CAST(concat('0x', substr(md5($keyExpr || '|' || '$salt'), 1, 15)) AS UBIGINT)"

  /** Threshold literal for oracle SQL. */
  def oracleThreshold(rate: Double): String = threshold(rate).toString

  /** Greedy per-stratum token budgeting — the "sample this source
    * down to N tokens" step of training-mix curation. Rows are laid
    * out in a deterministic pseudo-random order (the same md5 bucket
    * as [[hashSample]], so the order is engine- and rerun-stable),
    * the per-stratum running token total is computed along it, and a
    * row is kept iff its running total fits the budget — a stable
    * prefix: re-running with a bigger budget only ADDS documents.
    *
    * Scale shape: a naive `sum over (partition by stratum order by
    * h)` serializes each stratum through ONE task — a few strata at
    * 100 TB means a few working cores. Instead the cumsum is
    * two-level: the hash's high bits split each stratum into
    * `rangeBuckets` contiguous hash ranges; within-range cumsums run
    * in parallel on (stratum, range) keys, per-range subtotals form a
    * tiny (|strata| × rangeBuckets) relation whose exclusive prefix
    * sums become per-range offsets, and offset + within-range cumsum
    * is exactly the global running total. Both shuffles are keyed;
    * nothing is single-partition.
    *
    * Output: the input columns plus `cum_tokens` (running total
    * including this row) and `kept`. Rows with a NULL stratum are
    * dropped by the offset equi-join (standard null-key join
    * semantics) — pre-bucket unknown strata with `coalesce` if they
    * must participate.
    */
  def tokenBudget(df: DataFrame, keyCol: Column, strataCol: Column,
                  nTokensCol: Column, budget: Long,
                  salt: String = "graft", rangeBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rangeBuckets > 0 && (rangeBuckets & (rangeBuckets - 1)) == 0,
      "rangeBuckets must be a power of two")
    val shift = 60 - Integer.numberOfTrailingZeros(rangeBuckets)
    val based = df
      .withColumn("__stratum", strataCol)
      .withColumn("__h", bucket(keyCol, salt))
      .withColumn("__bkt", shiftright(col("__h"), shift))
    val wIn = Window.partitionBy(col("__stratum"), col("__bkt"))
      .orderBy(col("__h"), keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = based.withColumn("__cum_in", sum(nTokensCol).over(wIn))
    val offsets = based.groupBy(col("__stratum"), col("__bkt"))
      .agg(sum(nTokensCol).as("__tot"))
      .withColumn("__off", coalesce(
        sum(col("__tot")).over(Window.partitionBy(col("__stratum"))
          .orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__stratum"), col("__bkt"), col("__off"))
    withIn.join(offsets, Seq("__stratum", "__bkt"))
      .withColumn("cum_tokens", (col("__off") + col("__cum_in")).cast("long"))
      .withColumn("kept", col("cum_tokens") <= lit(budget))
      .drop("__stratum", "__h", "__bkt", "__cum_in", "__off")
  }
}
