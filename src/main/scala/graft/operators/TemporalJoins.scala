package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed from
  * relational primitives so Catalyst plans them as ordinary keyed
  * shuffles — never a broadcast-nested-loop over an inequality.
  *
  * (Preference order from the design brief: compose existing ops
  * when semantics allow — they do here — before reaching for a
  * custom SparkPlan.)
  */
object TemporalJoins {

  /** AS-OF join: for each left row, the most recent right row with
    * the same key whose time is ≤ the left time.
    *
    * Union-and-carry-forward formulation: tag both sides, sort each
    * key's timeline once (right rows before left rows at equal
    * times), and carry the last right payload forward with a running
    * `last(_, ignoreNulls)` window — ONE shuffle on the key, linear
    * in rows, no inequality join anywhere. The right side must be
    * unique per (key, time); pre-aggregate if it isn't.
    *
    * @param left      rows to enrich
    * @param right     lookup timeline, unique on (key, time)
    * @param key       join key column name (same name both sides)
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right-side columns to attach (null when no
    *                  right row is at or before the left time)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols    = left.columns.toSeq
    val payloadType = right.select(payload.map(col): _*).schema

    val lAligned = left.select(
      (col(key) +: col(leftTime).as("__t") +:
        lit(null).cast(payloadType).as("__payload") +: lit(1).as("__side") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val rAligned = right.select(
      (col(key) +: col(rightTime).as("__t") +:
        struct(payload.map(col): _*).as("__payload") +: lit(0).as("__side") +:
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
      .toDF(lAligned.columns.toIndexedSeq: _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col("__carried").getField(p).as(p))): _*)
  }

  /** Range join: left rows matched to right rows with the same key
    * and right time (µs) in [left start, left start + width).
    *
    * Bucket-and-residual formulation: both sides bucket time by
    * `width`; a window of length `width` spans at most two buckets,
    * so the left side explodes ×2 and joins on (key, bucket) with
    * the exact residual applied after — an equi-join shuffle instead
    * of an inequality nested loop. (floor(c/w) on µs longs is exact
    * here: ulp(c/w) ≪ 1/w for c < 2⁵³.)
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftStartUs: Column, rightTimeUs: Column,
                widthUs: Long): DataFrame = {
    require(widthUs > 0)
    def bucketOf(c: Column): Column = floor(c / lit(widthUs.toDouble)).cast("long")
    val lb = left
      .withColumn("__start", leftStartUs)
      .withColumn("__bucket",
        explode(array(bucketOf(col("__start")), bucketOf(col("__start")) + 1)))
    val rb = right
      .withColumn("__rt", rightTimeUs)
      .withColumn("__bucket", bucketOf(col("__rt")))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col("__rt") >= col("__start") &&
        col("__rt") < col("__start") + lit(widthUs))
      .drop("__bucket", "__start", "__rt")
  }
}
