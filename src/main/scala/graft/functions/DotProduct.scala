package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two `array<float|double>` columns
  * (each side independently float or double — the quantizer paths
  * score `array<float>` vectors against `array<double>` rounded-mean
  * centroids).
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array per row and evaluates three
  * higher-order lambdas; on an O(n²) similarity join that allocation
  * dominates. This expression generates a single fused loop —
  * `sum += (double)a[i] * (double)b[i]` — directly over the unsafe
  * array data, with no allocation, inside whole-stage codegen.
  *
  * Accumulation order (index 0..n-1, every element widened to double
  * before the multiply) is identical to the composable form and to
  * the DuckDB oracle's `list_sum(list_transform(list_zip(...)))`, so
  * results stay bit-identical across all three for BOTH element
  * types — widening float→double is exact, and double elements pass
  * through the same sum untouched.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, t: DataType): String =
        if (isFloat(t)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: `dot_product(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}

/** Integer sibling of [[DotProduct]]: fused codegen dot over two
  * `array<int>` columns with a long accumulator — the SQ8 stage-1
  * scorer's hot loop. The composable form
  * (`aggregate(zip_with(q, c, _*_), 0L, _+_)`) allocates a long
  * array per pair and interprets three lambdas (HOFs are
  * CodegenFallback); on the (query × corpus) product it is the same
  * 12×-measured penalty the float path had before [[DotProduct]].
  * Exact by construction: int×int products summed in long cannot
  * overflow at any real dimensionality (127² · dim ≪ 2⁶³) and
  * integer addition is order-independent, so the result is
  * bit-identical to the composable form and the DuckDB oracle.
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _                                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_dot_product expects (array<int>, array<int>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** Column-level entry point: `int_dot_product(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
