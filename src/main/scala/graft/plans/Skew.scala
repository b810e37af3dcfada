package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in [[graft.GraftSession]]) handles most skew at
  * runtime by splitting oversized partitions. Salting is the static
  * fallback for the pathological case AQE can't fix: one join key so
  * hot that *any* single-partition treatment of it spills — the
  * classic null-key / celebrity-key problem at 100 TB.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a random
    * salt in [0, buckets); the small side is replicated `buckets`
    * times; the join key becomes (key, salt), spreading each hot key
    * over `buckets` partitions. Result equals `large.join(small,
    * key)` exactly.
    *
    * Use when one side is modest (replication cost = |small| ×
    * buckets) but too big or too skew-prone to broadcast outright.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = large.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Rough skew diagnostic: rows per key for the heaviest keys, with
    * their share of the table — drives the decision between
    * broadcast, AQE, and salting.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total  = df.count()
    counts
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
