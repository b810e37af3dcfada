package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Order- and duplication-insensitive 64-bit content fingerprint of a
  * token array: XOR-fold of per-distinct-token hashes, where a
  * token's hash is the first 8 bytes of its MD5 (big-endian).
  *
  * Commutative by construction, so it's also a valid *aggregation*
  * fingerprint (partial fingerprints XOR together), which is what a
  * 100 TB fingerprint-everything pass wants. The per-token hash is
  * MD5-derived — ubiquitously available — so any engine can recompute
  * the fingerprint from the raw text (`xor-fold(first-8-bytes(md5(
  * distinct tokens)))`); a fingerprint only earns its keep in lineage
  * and cross-system reconciliation if the other system can derive it
  * too. (A seeded xxhash64 fold is ~5× faster per token but locks the
  * fingerprint to this codebase.)
  */
case class ContentFingerprint64(child: Expression)
    extends UnaryExpression with CodegenFallback {

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
        val h = Md5Long.hash(arr.getUTF8String(i))
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

/** A string's first-15-hex-digits-of-MD5 as a non-negative 60-bit
  * long — the deterministic "random" value behind hash sampling:
  * reproducible across runs, engines (DuckDB:
  * `CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT)`), partitionings,
  * and cluster sizes, unlike RNG-based `sample()`. 60 bits so the
  * value is positive in any signed 64-bit engine.
  */
case class Md5Bucket60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket60 expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]) >>> 4

  override protected def withNewChildInternal(newChild: Expression): Md5Bucket60 =
    copy(child = newChild)
}

object Md5Bucket60 {
  def apply(s: Column): Column =
    Bridge.column(Md5Bucket60(Bridge.expression(s)))

  /** 2^60 — the bucket space; `rate` maps to threshold rate·2^60. */
  val Space: Long = 1L << 60
}

/** The shared per-token hash of the fingerprint family: the first 8
  * bytes of MD5, big-endian, as a signed long. MD5 (not a seeded
  * xxhash) so ANY engine can recompute fingerprints from raw text —
  * the DuckDB oracle derives the exact same 64-bit values in SQL
  * (`CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT)`).
  */
private[functions] object Md5Long {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
    h
  }
}
