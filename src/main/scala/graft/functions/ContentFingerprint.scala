package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Order- and duplication-insensitive 64-bit content fingerprint of a
  * token array: XOR-fold of per-distinct-token hashes.
  *
  * Equivalent purpose to `xxhash64(concat_ws(" ", array_sort(
  * array_distinct(tokens))))` but one pass, no sort, no string
  * concatenation — and commutative by construction, so it's also a
  * valid *aggregation* fingerprint (partial fingerprints XOR
  * together), which is what a 100 TB fingerprint-everything pass
  * wants.
  */
case class ContentFingerprint64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Seed = 42L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"content_fingerprint expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val n    = arr.numElements()
    val seen = new java.util.HashSet[Long]()
    var fp   = 0L
    var i    = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        if (seen.add(h)) fp ^= h // distinct-only: duplicates are no-ops
      }
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): ContentFingerprint64 =
    copy(child = newChild)
}

object ContentFingerprint64 {
  def apply(tokens: Column): Column =
    Bridge.column(ContentFingerprint64(Bridge.expression(tokens)))
}
