package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array — one row-level pass, no
  * explode, no shuffle.
  *
  * The equivalent declarative pipeline (explode tokens → 64 bit-counter
  * sums → recombine; Dedup.simhashFromHashes) needs a wide aggregation
  * per document; this expression folds the whole sketch into a single
  * projected column evaluated inside whole-stage codegen, so a
  * sketch-per-document job is a pure scan. Token hashes are xxhash64
  * with Spark's default seed (42), bit i of the sketch is the sign of
  * the ±1 vote sum over token-hash bit i — bit-identical to
  * `Dedup.simhash` (spec-checked).
  *
  * (Reference semantics: the standard Charikar sim-hash used for
  * near-dup candidate generation; the reference's dedup story is
  * embedding-space NN, embeddinghub/embeddingstore/index.h — simhash is
  * part of graft's LLM-pipeline extension surface.)
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 needs array<string>, got $other")
    }

  private val seed = 42L // Spark's xxhash64 default seed

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        // hashUTF8String is the exact kernel Spark's xxhash64() applies
        // to string inputs — bit-identical to the declarative pipeline.
        val h = XXH64.hashUTF8String(arr.getUTF8String(t), seed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sh = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sh |= (1L << i)
      i += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sh = ctx.freshName("sh")
      val xxh = classOf[XXH64].getName
      s"""
        int[] $counts = new int[64];
        int $n = $arr.numElements();
        for (int $t = 0; $t < $n; $t++) {
          if (!$arr.isNullAt($t)) {
            long $h = $xxh.hashUTF8String($arr.getUTF8String($t), ${seed}L);
            for (int $i = 0; $i < 64; $i++) {
              if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
            }
          }
        }
        long $sh = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($counts[$i] > 0) $sh |= (1L << $i);
        }
        ${ev.value} = $sh;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
