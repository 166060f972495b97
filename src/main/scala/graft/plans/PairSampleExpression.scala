package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native form of the deterministic 1/256 pair-sample predicate
  *
  *   conv(substring(md5(concat(cast(a AS string), ':',
  *                             cast(b AS string))), 1, 4), 16, 10) % 256 = 0
  *
  * i.e. "the second byte of md5('<a>:<b>') is zero" — the first 4 hex
  * chars are the first two digest bytes (d0 << 8 | d1), and % 256
  * keeps exactly d1. Bit-identical to the declarative column (the
  * decimal rendering below matches Cast(long → string) digit for
  * digit, sign included), so the external SQL oracle reproduces this
  * expression unchanged.
  *
  * Why native: the declarative predicate sits INSIDE the candidate
  * bucket join of the sampled pair-verify queries (Catalyst pushes it
  * below the verify joins and the pair-dedupe into the join
  * condition), so it runs once per candidate INSTANCE — tens of
  * millions of evaluations at sf0.1, Ω(candidate stream) at scale.
  * Each declarative evaluation allocates two Long.toString strings, a
  * UTF8String concat, a fresh MessageDigest (commons-codec md5Hex), a
  * 32-char hex string, a substring and a NumberConverter parse; the
  * bench's stall dumps showed exactly those frames burning >40 CPU-
  * minutes when the per-query generated code ran de-optimized. This
  * kernel reuses a thread-local digest, renders digits into a reused
  * buffer, reads one byte of the digest, and is warmed past the C2
  * threshold at class load (same rationale as [[MinHashBands]]) — so
  * the hot path is one shared compiled method, not per-query codegen.
  */
case class PairSampleMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_pair_sample"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pair_sample needs (bigint, bigint), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PairSampleMatch.matches(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PairSampleMatch.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = ($cls).matches($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PairSampleMatch =
    copy(left = newLeft, right = newRight)
}

object PairSampleMatch {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // One reused scratch buffer per thread: 20 bytes covers
  // "-9223372036854775808" (the longest long rendering).
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](20)
  }

  /** Self-warm at class load (see [[MinHashBands.warmed]]): the kernel
    * runs once per candidate instance in a join condition — the first
    * corpus pass of a fresh executor must not pay the interpreter.
    */
  private val warmed: Boolean = {
    var i = 0
    var acc = false
    while (i < 20000) { acc ^= matches(i.toLong, (i * 31 + 7).toLong); i += 1 }
    acc || true
  }

  /** Render `v` as its decimal ASCII digits (sign included — identical
    * bytes to Long.toString) into `buf` starting at offset 0; returns
    * the length. Handles Long.MinValue via negative-absolute-value
    * accumulation.
    */
  private def renderLong(v: Long, buf: Array[Byte]): Int = {
    // work in negative space: -n never overflows
    var n = if (v > 0) -v else v
    var pos = buf.length
    while (n <= -10) {
      buf(pos - 1) = ('0' - (n % 10)).toByte
      n /= 10
      pos -= 1
    }
    buf(pos - 1) = ('0' - n).toByte
    pos -= 1
    if (v < 0) { buf(pos - 1) = '-'.toByte; pos -= 1 }
    val len = buf.length - pos
    System.arraycopy(buf, pos, buf, 0, len)
    len
  }

  /** True iff the second md5 digest byte of "<a>:<b>" is zero —
    * exactly `conv(substring(md5(..), 1, 4), 16, 10) % 256 = 0`.
    */
  def matches(a: Long, b: Long): Boolean = {
    val md = digestLocal.get()
    val buf = bufLocal.get()
    md.reset()
    md.update(buf, 0, renderLong(a, buf))
    md.update(':'.toByte)
    md.update(buf, 0, renderLong(b, buf))
    val d = md.digest()
    d(1) == 0
  }
}
