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

  /** The DuckDB-side bucket expression for a key column, for oracle
    * SQL construction (kept next to the Spark definition so the two
    * can't drift).
    */
  def oracleBucketSql(keyExpr: String, salt: String = "graft"): String =
    s"CAST(concat('0x', substr(md5($keyExpr || '|' || '$salt'), 1, 15)) AS UBIGINT)"

  /** Threshold literal for oracle SQL. */
  def oracleThreshold(rate: Double): String = threshold(rate).toString
}
