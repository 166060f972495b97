package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-shingle overlap-signature lanes: for seed groups
  * g = 0 .. lanes/2 − 1, the two 64-bit halves of `md5("<g>:" ||
  * shingle)`, each returned as the big-endian value XOR Long.MinValue
  * (the standard order-flip that makes SIGNED comparison equal to
  * UNSIGNED comparison of the raw half).
  *
  * Replaces, in [[graft.operators.Dedup.corpusOverlap]]'s signature
  * pass, the declarative `min(substring(md5(concat(lit("g:"), sh)),
  * 1|17, 16))` lane columns. Equivalence: the 16 lowercase-hex chars
  * of a digest half compare lexicographically exactly as the unsigned
  * 64-bit value (hex digits are ASCII-ascending in value order and the
  * width is fixed), so `min(hexLane)` picks the same digest half as
  * `min(flippedLong)`; downstream the lanes are only compared for
  * EQUALITY between groups (lane_matches), which any injective
  * re-encoding preserves. The query's OUTPUT therefore carries
  * identical values while the signature aggregate runs over primitive
  * longs instead of 16-char strings.
  *
  * Why native (same rationale as [[MinHashBands]]): the declarative
  * form evaluates Spark's `Md5` expression `lanes/2` times per
  * (group, shingle) row — each call allocates a commons-codec digest
  * and a 32-char hex string, then two substrings; per-query generated
  * code also re-enters the JIT-compilation lottery every bench run,
  * which is how this query intermittently ran 4x slow (interpreted
  * md5-per-shingle). This kernel reuses a thread-local digest, renders
  * no hex, and is one shared compiled method, warmed at class load.
  */
case class LaneHashes(child: Expression, lanes: Int) extends UnaryExpression {

  require(lanes > 0 && lanes % 2 == 0, s"lanes must be positive and even, got $lanes")
  require(lanes <= 200, "lane count capped at 200 (two-digit seed groups)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lane_hashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lane_hashes needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LaneHashes.compute(input.asInstanceOf[UTF8String], lanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LaneHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, sh => s"${ev.value} = ($cls).compute($sh, $lanes);")
  }

  override protected def withNewChildInternal(newChild: Expression): LaneHashes =
    copy(child = newChild)
}

object LaneHashes {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Self-warm at class load (see [[MinHashBands.warmed]]): the kernel
    * runs once per (group, shingle) row of a full-corpus signature
    * pass — the first pass of a fresh executor must not pay the
    * interpreter.
    */
  private val warmed: Boolean = {
    val tiny = UTF8String.fromString("warm a b")
    var i = 0
    while (i < 20000) { compute(tiny, 4); i += 1 }
    true
  }

  /** All `lanes` flipped digest halves of one shingle, in lane order
    * (2g = high half of seed group g, 2g+1 = low half).
    */
  def compute(sh: UTF8String, lanes: Int): GenericArrayData = {
    val groups = lanes / 2
    val md = digestLocal.get()
    val bytes = sh.getBytes
    val out = new Array[Long](lanes)
    var g = 0
    while (g < groups) {
      md.reset()
      // "<g>:" prefix in ASCII — identical bytes to the declarative
      // concat(lit(s"$g:"), sh) for any g
      if (g >= 10) md.update(('0' + g / 10).toByte)
      md.update(('0' + g % 10).toByte)
      md.update(':'.toByte)
      md.update(bytes)
      val d = md.digest()
      out(2 * g) = bytesToLongBE(d, 0) ^ Long.MinValue
      out(2 * g + 1) = bytesToLongBE(d, 8) ^ Long.MinValue
      g += 1
    }
    new GenericArrayData(out)
  }

  private def bytesToLongBE(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }
}
