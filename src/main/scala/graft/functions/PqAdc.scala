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

/** [[PqAdc]] over the BIT-PACKED code layout ([[PqPack]]): one fused
  * loop unpacks each ⌈log₂ ksub⌉-bit LOCAL code straight out of the
  * byte stream and sums `lut[i·ksub + local]` — no intermediate
  * array<int> is ever materialized, so the serving scan reads the
  * 12-byte packed column (the FAISS code layout) at the same m-lookup
  * cost as the unpacked kernel. `m`/`ksub` are plan-time constants
  * (the index's frozen config), so the bit arithmetic constant-folds
  * in codegen.
  *
  * Degrade, don't abort: a binary shorter than m·bits/8 reads its
  * missing bits as 0 (local code 0 — [[PqPack]]'s own stance for
  * malformed input), and a lut too short for a decoded index
  * contributes 0, matching [[PqAdc]].
  */
case class PqAdcPacked(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  private val bits = PqCodec.bitsPerCode(ksub)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_packed expects (binary codes, array<double> lut), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val lut   = b.asInstanceOf[ArrayData]
    val nl = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      var local = 0
      var bi = 0
      while (bi < bits) {
        val bit = i * bits + bi
        val byteIdx = bit >> 3
        if (byteIdx < bytes.length &&
            ((bytes(byteIdx) >> (7 - (bit & 7))) & 1) != 0)
          local |= 1 << (bits - 1 - bi)
        bi += 1
      }
      val c = i * ksub + local
      if (c < nl) s += lut.getDouble(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val bi = ctx.freshName("bi")
      val nl = ctx.freshName("nl"); val s = ctx.freshName("s")
      val local = ctx.freshName("local"); val bit = ctx.freshName("bit")
      val byteIdx = ctx.freshName("byteIdx"); val c = ctx.freshName("c")
      s"""
         |int $nl = $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  int $local = 0;
         |  for (int $bi = 0; $bi < $bits; $bi++) {
         |    int $bit = $i * $bits + $bi;
         |    int $byteIdx = $bit >> 3;
         |    if ($byteIdx < $a.length && ((($a[$byteIdx]) >> (7 - ($bit & 7))) & 1) != 0)
         |      $local |= 1 << ($bits - 1 - $bi);
         |  }
         |  int $c = $i * $ksub + $local;
         |  if ($c < $nl) $s += $b.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcPacked =
    copy(left = newLeft, right = newRight)
}

object PqAdcPacked {
  /** Column-level entry point: `pq_adc_packed(codes_bin, lut)`. */
  def apply(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    Bridge.column(PqAdcPacked(Bridge.expression(codes), Bridge.expression(lut), m, ksub))
}
