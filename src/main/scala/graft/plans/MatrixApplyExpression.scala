package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dense matrix-vector product: out[j] = Σ_i mat[j][i] · x[i] —
  * the OPQ/learned-rotation apply as one codegen'd expression node with
  * the matrix attached as a reference object (broadcast once per task
  * in the generated-class constants, NOT per-row).
  *
  * Why native: the declarative form (`typedLit(rot)` + transform/
  * zip_with/aggregate HOF fold, the previous Quantization.rotate) keeps
  * the d×d matrix as a nested-array literal walked by the interpreted
  * HOF evaluator per row — measured CodegenFallback at d=64, a
  * scale-killer when the rotated corpus is the full 100 TB side rather
  * than the k-vector query side. Same motivation and pattern as
  * [[SignedProjection]] (graft_rp); here the matrix is learned, not
  * seed-derived.
  *
  * Accumulation is sequential in ascending i per output dim — the same
  * left-associated add order as the HOF `aggregate` fold and the
  * unrolled per-literal SQL oracle, so results are bit-identical
  * doubles.
  *
  * Null semantics: null array, wrong length, or any null element →
  * null result (same rule as the other graft kernels).
  */
case class MatrixApply(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {

  require(mat.nonEmpty && mat(0).nonEmpty, "matrix must be non-empty")
  require(mat.forall(_.length == mat(0).length), "matrix rows must be equal length")

  private val outDims: Int = mat.length
  private val dims: Int = mat(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matapply"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other =>
        throw new IllegalArgumentException(s"graft_matapply: unsupported element type $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    val isFloat = elemIsFloat
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      val row = mat(j)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        if (x.isNullAt(i)) return null
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += row(i) * xi
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val matRef = ctx.addReferenceObj("applyMat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
        if ($v.numElements() != $dims) {
          ${ev.isNull} = true;
        } else {
          double[] $out = new double[$outDims];
          for (int $j = 0; $j < $outDims && !${ev.isNull}; $j++) {
            double[] $row = $matRef[$j];
            double $acc = 0.0;
            for (int $i = 0; $i < $dims; $i++) {
              if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
              $acc += $row[$i] * (double) $v.$get($i);
            }
            $out[$j] = $acc;
          }
          if (!${ev.isNull}) {
            ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatrixApply =
    copy(child = newChild)

  // Array-typed constructor args break the default case-class equality /
  // hashing contract Catalyst relies on (reference equality on arrays),
  // so compare matrix CONTENT explicitly.
  override def equals(other: Any): Boolean = other match {
    case m: MatrixApply =>
      child == m.child && java.util.Arrays.deepEquals(
        mat.asInstanceOf[Array[AnyRef]], m.mat.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(mat.asInstanceOf[Array[AnyRef]])
}
