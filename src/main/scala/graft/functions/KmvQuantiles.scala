package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k (KMV-style) quantile sketch as a
  * `TypedImperativeAggregate`: keep the `k` rows whose deterministic
  * 60-bit md5 hash of `keyExpr` is smallest — a uniform sample of the
  * group chosen by hash order, no RNG state — and interpolate the
  * requested quantiles from that sample at eval time.
  *
  * The mergeable bounded-state answer to "what does p50/p90 look like
  * per group at 100 TB": the buffer holds ≤ k (hash, value) pairs
  * regardless of group size, partials combine map-side, and merging
  * two sketches is a set-union trimmed back to k — associative and
  * commutative, so partition order can't perturb the result (the same
  * property the q53 HLL registers rely on). Contrast `percentile`
  * (exact but buffers every value per group) — this trades a
  * √k-bounded error for O(k) state. Groups smaller than k degrade to
  * exact quantiles, because the "sample" is then the whole group.
  *
  * Everything is cross-engine replayable: the hash is the shared
  * md5-15-hex contract ([[Md5Bucket60]], same as q43/c7), the sample
  * is "ORDER BY (hash, value) LIMIT k", and the interpolation is the
  * standard pos = q·(n−1) linear form computed as
  * `lo + (hi − lo)·frac` — kept in EXACTLY that operation order on
  * both sides so IEEE doubles agree bit-for-bit, then rounded
  * HALF_UP to 9 decimals (matching both engines' round on positive
  * values).
  *
  * Output: struct(n_sample long, quantiles array<double>) with one
  * entry per requested q.
  */
case class KmvQuantiles(keyExpr: Expression, valueExpr: Expression,
                        k: Int, qs: Seq[Double],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(Long, Double)]] {

  require(k > 0, s"sample size k must be positive, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be within [0, 1], got $qs")

  override def children: Seq[Expression] = Seq(keyExpr, valueExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("n_sample", LongType, nullable = false),
    StructField("quantiles", ArrayType(DoubleType, containsNull = true),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (keyExpr.dataType, valueExpr.dataType) match {
      case (StringType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (kt, vt) => TypeCheckResult.TypeCheckFailure(
        s"kmv_quantiles expects (string key, double value), got " +
          s"(${kt.simpleString}, ${vt.simpleString})")
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Double)] =
    mutable.TreeSet.empty[(Long, Double)]

  override def update(buf: mutable.TreeSet[(Long, Double)],
                      input: InternalRow): mutable.TreeSet[(Long, Double)] = {
    val key = keyExpr.eval(input)
    val v   = valueExpr.eval(input)
    if (key != null && v != null) {
      val h = Md5Long.hash(key.asInstanceOf[UTF8String]) >>> 4
      buf.add((h, v.asInstanceOf[Double]))
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(b1: mutable.TreeSet[(Long, Double)],
                     b2: mutable.TreeSet[(Long, Double)]): mutable.TreeSet[(Long, Double)] = {
    b2.foreach(b1.add)
    while (b1.size > k) b1.remove(b1.last)
    b1
  }

  override def eval(buf: mutable.TreeSet[(Long, Double)]): Any = {
    val values = buf.toArray.map(_._2).sorted
    val n      = values.length
    val out = qs.map { q =>
      if (n == 0) null
      else if (n == 1) roundNine(values(0))
      else {
        val pos  = q * (n - 1)
        val lo   = math.floor(pos).toInt
        val hi   = math.ceil(pos).toInt
        val frac = pos - lo
        // keep `lo + (hi - lo) * frac` verbatim — the oracle computes
        // the identical IEEE expression
        roundNine(values(lo) + (values(hi) - values(lo)) * frac)
      }
    }
    InternalRow(n.toLong, new GenericArrayData(out.toArray[Any]))
  }

  private def roundNine(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  override def serialize(buf: mutable.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Double)] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = mutable.TreeSet.empty[(Long, Double)]
    var i   = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvQuantiles =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvQuantiles =
    copy(keyExpr = newChildren(0), valueExpr = newChildren(1))
}

object KmvQuantiles {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** Column-level entry point for `.agg(...)`. */
  def apply(key: Column, value: Column, k: Int, qs: Seq[Double]): Column =
    Bridge.column(
      KmvQuantiles(Bridge.expression(key), Bridge.expression(value), k, qs)
        .toAggregateExpression())
}
