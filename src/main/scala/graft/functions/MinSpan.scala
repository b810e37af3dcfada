package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Minimal covering span over k sorted position lists: the smallest
  * `greatest − least` over one choice per list — Lucene's sloppy-
  * phrase span, as a single fused merge instead of a k-way join.
  *
  * Input: `array<array<long>>`, each inner list a document's sorted
  * (ascending) positions for one query term. Output: the minimal
  * window width containing at least one position from every list;
  * NULL when any list is null or empty (the document lacks a term).
  *
  * The k-pointer merge is the textbook "smallest range covering one
  * element from each list" algorithm: at every step the current heads
  * form a candidate window; advancing the minimal head is the only
  * move that can shrink it. Every minimal window is anchored at some
  * list's element that is the window's least position, and the sweep
  * visits every element as the minimum exactly once, so the true
  * minimum is observed. O(Σ tfᵢ · k) per document — linear in the
  * positions, never the Π tfᵢ cross product of one-position-per-term
  * joins (a 3-term query with a stopword term reaches 10⁶+ joined
  * rows per long document; the merge visits each position once).
  */
case class MinSpan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_span expects array<array<bigint>>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val lists = input.asInstanceOf[ArrayData]
    val k = lists.numElements()
    if (k == 0) return null
    val arrs = new Array[ArrayData](k)
    var i = 0
    while (i < k) {
      if (lists.isNullAt(i)) return null
      val a = lists.getArray(i)
      if (a.numElements() == 0) return null
      arrs(i) = a
      i += 1
    }
    val idx = new Array[Int](k)
    var best = Long.MaxValue
    var done = false
    while (!done) {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var mnI = -1
      var j = 0
      while (j < k) {
        val v = arrs(j).getLong(idx(j))
        if (v < mn) { mn = v; mnI = j }
        if (v > mx) mx = v
        j += 1
      }
      if (mx - mn < best) best = mx - mn
      idx(mnI) += 1
      if (idx(mnI) >= arrs(mnI).numElements()) done = true
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, lists => {
      val ad = classOf[ArrayData].getName
      val k = ctx.freshName("k")
      val arrs = ctx.freshName("arrs")
      val bad = ctx.freshName("bad")
      val idx = ctx.freshName("idx")
      val best = ctx.freshName("best")
      val done = ctx.freshName("done")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val mnI = ctx.freshName("mnI")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |int $k = $lists.numElements();
         |boolean $bad = ($k == 0);
         |$ad[] $arrs = new $ad[$k];
         |for (int $j = 0; $j < $k && !$bad; $j++) {
         |  if ($lists.isNullAt($j)) { $bad = true; break; }
         |  $arrs[$j] = $lists.getArray($j);
         |  if ($arrs[$j].numElements() == 0) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $idx = new int[$k];
         |  long $best = Long.MAX_VALUE;
         |  boolean $done = false;
         |  while (!$done) {
         |    long $mn = Long.MAX_VALUE;
         |    long $mx = Long.MIN_VALUE;
         |    int $mnI = -1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = $arrs[$j].getLong($idx[$j]);
         |      if ($v < $mn) { $mn = $v; $mnI = $j; }
         |      if ($v > $mx) $mx = $v;
         |    }
         |    if ($mx - $mn < $best) $best = $mx - $mn;
         |    $idx[$mnI]++;
         |    if ($idx[$mnI] >= $arrs[$mnI].numElements()) $done = true;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinSpan =
    copy(child = newChild)
}

object MinSpan {
  /** Column-level entry point: `min_span(array(ps0, ps1, …))`. */
  def apply(lists: Column): Column =
    Bridge.column(MinSpan(Bridge.expression(lists)))
}
