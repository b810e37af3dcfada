package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Shannon entropy (bits/byte) of a binary payload — the classic
  * corpus-quality signal: natural prose sits near 4.1-4.7, base64 /
  * encrypted / compressed blobs near 6, repeated-template spam far
  * below 4. Pairs with the t2 length/punct ratios as a cheap
  * pre-filter before any model-based scorer.
  *
  * One fused pass per row (256-slot count array, no allocation per
  * byte), inside whole-stage codegen via a static helper call — the
  * same single-loop discipline as [[DotProduct]].
  *
  * Cross-engine determinism: the per-byte terms `c·ln(c)` are
  * quantized to DECIMAL(24,12) BEFORE summing (through Spark's own
  * `Decimal.changePrecision`, the exact cast the t11 logprob oracle
  * already proved agrees with DuckDB's `CAST(x AS DECIMAL(24,12))`),
  * so the sum is exact and order-free, and the final
  * `(ln(n) − S/n) / ln(2)` is a fixed short IEEE expression the
  * oracle replays verbatim. NULL for empty payloads (entropy of
  * nothing is undefined, not zero).
  */
case class ByteEntropy(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_entropy expects binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ByteEntropyImpl.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val boxed = ctx.freshName("h")
      s"""
         |Double $boxed = graft.functions.ByteEntropyImpl.compute($b);
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

/** Static implementation target for both interpreted eval and the
  * generated code (an `object` with no companion class compiles with
  * static forwarders, so janino calls it as a plain static method).
  */
object ByteEntropyImpl {
  private val Ln2 = math.log(2.0)

  /** Boxed so codegen can signal NULL for empty input. */
  def compute(bytes: Array[Byte]): java.lang.Double = {
    val n = bytes.length
    if (n == 0) return null
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    // Σ c·ln(c), each term quantized to DECIMAL(24,12) through
    // Spark's cast (HALF_UP) so the sum is exact — the t11 recipe.
    var s = java.math.BigDecimal.ZERO
    i = 0
    while (i < 256) {
      val c = counts(i)
      if (c > 1L) {
        val term = org.apache.spark.sql.types.Decimal(c.toDouble * math.log(c.toDouble))
        term.changePrecision(24, 12)
        s = s.add(term.toJavaBigDecimal)
      }
      i += 1
    }
    // keep this exact IEEE operation order — the oracle replays it:
    // round((ln(n) - CAST(S AS DOUBLE) / n) / ln(2), …)
    java.lang.Double.valueOf(
      (math.log(n.toDouble) - s.doubleValue() / n.toDouble) / Ln2)
  }
}

object ByteEntropy {
  /** Column-level entry point: `byte_entropy(payload)`. */
  def apply(payload: Column): Column =
    Bridge.column(ByteEntropy(Bridge.expression(payload)))
}
