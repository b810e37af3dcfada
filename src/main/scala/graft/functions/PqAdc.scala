package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) lookup sum for product-quantized
  * vectors: `Σₘ lut[codes[m]]` over a per-query lookup table — the
  * scoring kernel of an IVF-PQ index (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  * `IndexIVFPQ` scan loop).
  *
  * `codes` carries GLOBAL lut indices (`sub·ksub + code`, assigned by
  * [[graft.ann.Pq.encode]]) so a codebook entry that lost all its
  * members during training leaves a hole the scan never reads —
  * there is no stride arithmetic to get wrong. An out-of-range code
  * contributes 0 (degrade, don't abort — the multi-probe NaN lesson:
  * a malformed row must not fail the query).
  *
  * Accumulation is index order 0..m-1 in double — deterministic, and
  * the spec replays it with the composable
  * `aggregate(transform(codes, c -> element_at(lut, c+1)), ...)`
  * form to pin codegen ≡ interpreted ≡ HOF. One fused loop, no
  * per-row allocation, inside whole-stage codegen: the same reason
  * [[DotProduct]]/[[IntDotProduct]] exist — stage 1 of a PQ search
  * touches every (query, candidate) pair, and m lookups per pair
  * (16 at the measured gate config) vs dim multiplies (64) is the
  * point of PQ on compute — and the index being ~21× fewer bytes is
  * the point at scan scale.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<int> codes, array<double> lut), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut   = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c >= 0 && c < n) s += lut.getDouble(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  int $c = $a.getInt($i);
         |  if ($c >= 0 && $c < $n) $s += $b.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Column-level entry point: `pq_adc(codes, lut)`. */
  def apply(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))
}
