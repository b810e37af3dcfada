package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** AS-OF join as a FIRST-CLASS operator — the full Catalyst
  * extension ladder (design-brief tier c): a custom [[LogicalPlan]]
  * node, a [[SparkStrategy]] that plans it, and a [[SparkPlan]] that
  * executes a co-partitioned, sorted, single-pass streaming merge.
  *
  * Why a custom operator at all: Spark has no native AS-OF, and the
  * two composed formulations each pay something the merge does not —
  * the union-carry-forward form ([[graft.operators.TemporalJoins
  * .asOf]]) widens every right row to the union schema and runs a
  * window over the merged timeline; an inequality join form is a
  * nested loop. The physical operator here asks Catalyst for exactly
  * what the algorithm needs — both children hash-clustered on the
  * key and sorted by (key, time), which `EnsureRequirements`
  * provides (reusing existing exchanges when the data is already
  * co-partitioned, e.g. bucketed tables) — then each partition pair
  * merges in one forward scan with O(1) state: the latest right
  * payload for the current key run. No window state, no widened
  * union, no re-shuffle of anything already clustered.
  *
  * Semantics (identical to `TemporalJoins.asOf`, equivalence-spec'd
  * and gated against the same DuckDB `ASOF JOIN` oracle): for each
  * left row, the payload of the most recent right row with the same
  * key and `rightTime <= leftTime`, else nulls. Right side unique
  * per (key, time); null keys group together (window semantics).
  */
final case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] → [[AsofJoinExec]]. Injected per session
  * (`spark.experimental.extraStrategies`) or cluster-wide via
  * `GraftExtensions`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // hash-cluster both sides on the key; EnsureRequirements inserts
  // (or reuses) the exchanges and makes the partitionings compatible
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sort each side by (key, time); SortExec is added only when the
  // child is not already so ordered
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val keyTsTypes = leftKeys.map(_.dataType) :+ leftTime.dataType
    val keyTypes   = leftKeys.map(_.dataType)
    val payloadAttrs = payload.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) and key-only projections for both sides; the
      // merge compares (key, time) tuples under the same natural
      // ascending ordering the required child sort used
      val lKeyTs   = UnsafeProjection.create(leftKeys :+ leftTime, lSchema)
      val rKeyTs   = UnsafeProjection.create(rightKeys :+ rightTime, rSchema)
      val lKey     = UnsafeProjection.create(leftKeys, lSchema)
      val rKey     = UnsafeProjection.create(rightKeys, rSchema)
      val payProj  = UnsafeProjection.create(payload, rSchema)
      val result   = UnsafeProjection.create(output, lSchema ++ payloadAttrs)
      val ordKeyTs = RowOrdering.createNaturalAscendingOrdering(keyTsTypes)
      val ordKey   = RowOrdering.createNaturalAscendingOrdering(keyTypes)

      val rBuf = rIter.buffered
      var lastKey: UnsafeRow     = null // key of the most recent consumed right row
      var lastPayload: UnsafeRow = null
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow

      lIter.map { l =>
        val lkt = lKeyTs(l)
        // advance the right cursor through every row at or before
        // this left (key, time); the latest one consumed is the
        // candidate payload (right rows are (key, time)-sorted, so
        // the cursor only moves forward across the whole partition)
        while (rBuf.hasNext && ordKeyTs.compare(rKeyTs(rBuf.head), lkt) <= 0) {
          val r = rBuf.next()
          lastKey = rKey(r).copy()
          lastPayload = payProj(r).copy()
        }
        if (lastKey != null && ordKey.compare(lastKey, lKey(l)) == 0)
          result(joined(l, lastPayload))
        else
          result(joined(l, nullPayload))
      }
    }
  }
}

object AsofJoin {

  /** Ensure the strategy is active on this session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** AS-OF join via the native operator; same signature and
    * semantics as [[graft.operators.TemporalJoins.asOf]].
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = Bridge.analyzed(left)
    // Self-join safety: a right side sharing exprIds with the left
    // (same DataFrame / shared subplan on both sides) would make the
    // output projection bind payload attributes to LEFT columns —
    // joins built through the normal DSL get DeduplicateRelations
    // from the analyzer, but this constructor bypasses it. Re-alias
    // every right column so its attributes get fresh exprIds.
    val rightSafe =
      if (Bridge.analyzed(right).outputSet.intersect(lPlan.outputSet).nonEmpty)
        right.select(right.columns.toSeq.map(n => right.col(n).alias(n)): _*)
      else right
    // The exec compares right rows under orderings built from the
    // LEFT attributes' types (AsofJoinExec.doExecute) — a type
    // mismatch would read UnsafeRow fields under the wrong type and
    // merge silently wrong. Coerce the right side where the cast is
    // lossless and order-preserving (integral widening, date→ts,
    // ts↔ts_ntz in the pinned-UTC session); anything else fails fast.
    // (The declarative TemporalJoins.asOf tolerates mismatches via
    // unionByName coercion; this path must be explicit.)
    def losslessTo(from: org.apache.spark.sql.types.DataType,
                   to: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      (from, to) match {
        case (TimestampNTZType, TimestampType) => true
        case (TimestampType, TimestampNTZType) => true
        case (DateType, TimestampType | TimestampNTZType) => true
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (ShortType, IntegerType | LongType) => true
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case _ => false
      }
    }
    def lookup(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    def coerced(rdf: DataFrame, rightCol: String, what: String,
                lType: org.apache.spark.sql.types.DataType): DataFrame = {
      val rType = lookup(Bridge.analyzed(rdf), rightCol).dataType
      if (rType == lType) rdf
      else if (losslessTo(rType, lType))
        rdf.withColumn(rightCol, rdf.col(rightCol).cast(lType))
      else throw new IllegalArgumentException(
        s"as-of $what type mismatch: left is ${lType.simpleString}, right " +
          s"'$rightCol' is ${rType.simpleString} and cannot be cast losslessly " +
          "— cast one side explicitly first")
    }
    val lk0 = lookup(lPlan, key)
    val lt0 = lookup(lPlan, leftTime)
    val rCoerced = coerced(coerced(rightSafe, key, "key", lk0.dataType),
      rightTime, "time", lt0.dataType)
    val rPlan = Bridge.analyzed(rCoerced)
    Bridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      Seq(lk0), Seq(lookup(rPlan, key)), lt0, lookup(rPlan, rightTime),
      payload.map(lookup(rPlan, _))))
  }
}
