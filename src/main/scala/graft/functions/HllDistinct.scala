package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The q28 deterministic HLL as a first-class aggregate FUNCTION —
  * `TypedImperativeAggregate[Array[Byte]]`, the remaining custom-
  * Catalyst surface (imperative serialized buffer with map-side
  * partial merge), complementing the codegen expressions and the
  * AS-OF plan/strategy/exec ladder.
  *
  * Identical math to the q28 expression pipeline (md5-60-bit hash,
  * 64 registers keyed on the top 6 bits, rank = leading-zero count
  * of the low 54 bits, harmonic estimate through a DECIMAL(28,4)
  * round-trip), so it shares q28's DuckDB register-replay oracle.
  * The buffer is 64 BYTES regardless of input size — the mergeable
  * fixed-size state that lets 1000 executors sketch partitions
  * independently and merge for free; compare one Array[Byte] per
  * group against the groupBy(bucket) shuffle the expression form
  * pays.
  *
  * Output: struct(est_parts double, hll_zeros long, hll_digest
  * string) — the digest pins every register for the gate.
  */
case class HllDistinct(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("est_parts", DoubleType, nullable = false),
    StructField("hll_zeros", LongType, nullable = false),
    StructField("hll_digest", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct expects a string key, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h      = Md5Long.hash(v.asInstanceOf[UTF8String]) >>> 4 // 60-bit
      val bucket = (h >>> 54).toInt                               // 6-bit register id
      val low    = h & ((1L << 54) - 1)
      // q28's `55 - length(bin(low))`: length(bin(x)) = 64 − nlz(x)
      val rank = if (low == 0L) 55 else java.lang.Long.numberOfLeadingZeros(low) - 9
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var nb       = 0
    var sPresent = 0L // Σ 2^(55−reg) over present registers — exact in a long
    val sb       = new StringBuilder
    var i        = 0
    while (i < 64) {
      val reg = buf(i).toInt
      if (reg > 0) {
        nb += 1
        sPresent += 1L << (55 - reg)
        if (sb.nonEmpty) sb.append(',')
        sb.append(i).append(':').append(reg)
      }
      i += 1
    }
    val denom = (sPresent + (64L - nb) * (1L << 55)).toDouble
    // exact replication of the q28 expression tree, incl. the
    // DECIMAL(28,4) round-trip (HALF_UP, matching Spark's Cast)
    val raw = 0.709 * 4096.0 * 3.6028797018963968e16 / denom
    val est = new java.math.BigDecimal(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val md     = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(sb.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    InternalRow(est, 64L - nb, UTF8String.fromString(digest))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren.head)
}

object HllDistinct {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** Column-level entry point for `.agg(...)`. */
  def apply(key: Column): Column =
    Bridge.column(HllDistinct(Bridge.expression(key)).toAggregateExpression())
}
