package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cardinality

class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** JVM-side mirror of md5Long60 + bucket/rho for p=8. */
  private def expectedReg(item: String): (Long, Int) = {
    val hex = MessageDigest.getInstance("MD5").digest(item.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    val rem = h & ((1L << 52) - 1)
    val rho = if (rem == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (h >>> 52, rho)
  }

  test("hllRegisters buckets and ranks match the md5 reference; duplicates are free") {
    val items = Seq("alpha", "beta", "gamma", "alpha", "alpha")
      .toDF("tok").withColumn("g", lit("x"))
    val regs = Cardinality.hllRegisters(items, Seq("g"), col("tok"), p = 8)
      .collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m_rho"))
      .toMap
    val exp = Seq("alpha", "beta", "gamma").map(expectedReg)
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regs == exp)
  }

  test("hllMerge of disjoint halves equals the whole-corpus sketch") {
    val all = (1 to 2000).map(i => (i.toLong, s"item_$i")).toDF("id", "tok")
    val even = all.where(col("id") % 2 === 0)
    val odd = all.where(col("id") % 2 === 1)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Cardinality.hllRegisters(df.withColumn("g", lit(1L)), Seq("g"), col("tok"), p = 8)
    val merged = Cardinality.hllMerge(regs(even), regs(odd), Seq("g"))
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Int]("m_rho"))).toSet
    val whole = regs(all)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Int]("m_rho"))).toSet
    assert(merged == whole)
  }

  test("hllEstimate is within 3 standard errors on 5000 distinct items") {
    val n = 5000
    val items = (1 to n).map(i => s"doc_$i").toDF("tok").withColumn("g", lit(1L))
    val row = Cardinality.hllDistinct(items, Seq("g"), col("tok"), p = 8)
      .collect().head
    val est = row.getAs[Double]("est_distinct")
    val se = 1.04 / math.sqrt(256.0) // ~6.5%
    assert(math.abs(est - n) < 3 * se * n, s"estimate $est too far from $n")
    assert(row.getAs[Long]("v_empty") == 0L, "5000 items must touch all 256 registers")
    assert(row.getAs[Long]("n_registers") == 256L)
  }
}
