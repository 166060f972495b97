package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection SIZE of two ascending-sorted, duplicate-free integer
  * arrays by a single merge walk — the verify kernel of the PPJoin
  * dedup family (Dedup.jaccardWordPairs / containmentPairs).
  *
  * Why not `size(array_intersect(a, b))`: Spark's array_intersect is
  * set-general — it builds a hash set over one side PER ROW, then
  * materializes the intersected array, which `size` immediately
  * discards. On the verify join's candidate stream (Ω(pairs) rows —
  * tens of millions at 10× the driver corpus, decades beyond that at
  * 100 TB) that per-row allocation is the dominant cost: measured
  * 21 s → 3 s on the 48 M-candidate sf1 verify. The token arrays are
  * already sorted (canonical rarest-first frequency-rank order, built
  * once per doc), so the merge walk is allocation-free, branch-cheap,
  * and O(|a|+|b|) — and it fuses into whole-stage codegen.
  *
  * Contract: both inputs are arrays of the SAME integral element type
  * (int or long), ascending-sorted, without duplicate or null
  * elements — exactly the shape Dedup.freqSortedTokens produces
  * (array_sort over distinct ranks; Spark types them
  * containsNull=false). Enforced at analysis time.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sorted_inter"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, false), ArrayType(rt, false))
          if lt == rt && (lt == IntegerType || lt == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<int> or two array<bigint> with " +
            s"non-null elements, got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var cnt = 0
    if (elemType == IntegerType) {
      while (i < n1 && j < n2) {
        val u = x.getInt(i); val v = y.getInt(j)
        if (u < v) i += 1
        else if (u > v) j += 1
        else { cnt += 1; i += 1; j += 1 }
      }
    } else {
      while (i < n1 && j < n2) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u < v) i += 1
        else if (u > v) j += 1
        else { cnt += 1; i += 1; j += 1 }
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (jt, get) =
        if (elemType == IntegerType) ("int", "getInt") else ("long", "getLong")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
        int $i = 0, $j = 0, $cnt = 0;
        final int $n1 = $a.numElements(), $n2 = $b.numElements();
        while ($i < $n1 && $j < $n2) {
          final $jt $u = $a.$get($i);
          final $jt $v = $b.$get($j);
          if ($u < $v) $i++;
          else if ($u > $v) $j++;
          else { $cnt++; $i++; $j++; }
        }
        ${ev.value} = $cnt;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
