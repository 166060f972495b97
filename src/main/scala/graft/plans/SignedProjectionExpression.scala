package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native ±1 random projection: out[j] = (Σ_i x_i · s(i,j)) / √outDims
  * with the sign matrix derived from md5 (see [[SignedProjection.sign]])
  * — one compact expression node computing the whole output vector.
  *
  * Why native: the declarative form is a dims×outDims-term expression
  * tree (1024 nodes at 64→16) that (a) costs seconds of optimizer and
  * Janino time per plan and (b) blows the 64KB generated-method limit,
  * dropping the stage to interpreted eval — measured 10-30x slower
  * than this generated double loop. Accumulation is sequential in
  * ascending i per output dim, bit-identical to a left-associated SQL
  * chain with the same signs.
  *
  * Null semantics: null array, wrong length, or any null element →
  * null result (same rule as the other graft kernels).
  */
case class SignedProjection(child: Expression, dims: Int, outDims: Int, seed: String)
    extends UnaryExpression {

  require(dims >= 1 && outDims >= 1, "dims and outDims must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rp"

  // Row-major [out][in], 1-based input dim fed to the sign rule so the
  // SQL mirror can write embedding[i] with the same i.
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(outDims, dims)((j, i) => SignedProjection.sign(seed, i + 1, j))

  private val scaleDiv: Double = math.sqrt(outDims.toDouble)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other =>
        throw new IllegalArgumentException(s"graft_rp: unsupported element type $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    val isFloat = elemIsFloat
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      val row = signs(j)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        if (x.isNullAt(i)) return null
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * row(i)
        i += 1
      }
      // divide (not multiply-by-inverse): matches the SQL `/ sqrt(k)`
      out(j) = acc / scaleDiv
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val signsRef = ctx.addReferenceObj("rpSigns", signs, "double[][]")
    val scale = math.sqrt(outDims.toDouble)
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
            double[] $row = $signsRef[$j];
            double $acc = 0.0;
            for (int $i = 0; $i < $dims; $i++) {
              if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
              $acc += (double) $v.$get($i) * $row[$i];
            }
            $out[$j] = $acc / ${scale}D;
          }
          if (!${ev.isNull}) {
            ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

object SignedProjection {
  /** Deterministic ±1 sign for cell (i, j): +1 iff the first hex digit
    * of md5("<seed>:<j>:<i>") is 0-7 — content-keyed like the sampling
    * thresholds, reproducible in any engine with md5.
    */
  def sign(seed: String, i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }
}
