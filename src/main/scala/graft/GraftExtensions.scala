package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{AdcDistance, CosineSimilarity, DotProduct, GraftFunctions, L2SquaredDistance, MatrixApply, MinHashBands, SignedProjection, SimHash64}

/** Spark-idiomatic packaging of graft's native expressions: set
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (spark-submit / spark-defaults.conf / SparkSession.builder.config)
  * and `graft_cosine`, `graft_l2sq`, `graft_adc`, `graft_simhash64`
  * resolve in ANY SQL surface of the session — spark-sql shell, JDBC,
  * `spark.sql(...)` — with no graft code on the driver path.
  *
  * `GraftFunctions.register` remains the runtime-injection twin for
  * sessions built without the config (tests, the Verify/Bench mains,
  * notebook sessions you don't control the launch of); both register
  * identical expression builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injectables.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder))
    }
}

object GraftExtensions {
  /** Name -> expression builder for every injectable scalar function.
    * (TopKByScore is registered only via GraftFunctions.register: its
    * k argument needs literal extraction, which shares the same
    * builder there.)
    */
  private[graft] val injectables: Seq[(String, Seq[Expression] => Expression)] = Seq(
    GraftFunctions.CosineName -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    GraftFunctions.L2SqName -> (exprs => L2SquaredDistance(exprs(0), exprs(1))),
    GraftFunctions.AdcName -> (exprs => AdcDistance(exprs(0), exprs(1))),
    GraftFunctions.DotName -> (exprs => DotProduct(exprs(0), exprs(1))),
    GraftFunctions.SimHashName -> (exprs => SimHash64(exprs(0))),
    GraftFunctions.SortedInterName ->
      (exprs => graft.plans.SortedIntersectSize(exprs(0), exprs(1))),
    GraftFunctions.PairSampleName ->
      (exprs => graft.plans.PairSampleMatch(exprs(0), exprs(1))),
    GraftFunctions.LaneHashesName -> (exprs => {
      val lanes = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_lane_hashes lanes must be an int literal, got $other")
      }
      graft.plans.LaneHashes(exprs(0), lanes)
    }),
    GraftFunctions.MinHashBandsName -> (exprs => {
      def litInt(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash_bands $what must be an int literal, got $other")
      }
      MinHashBands(exprs(0), litInt(exprs(1), "bands"), litInt(exprs(2), "rowsPerBand"))
    }),
    GraftFunctions.RpName -> (exprs => {
      def litInt(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_rp $what must be an int literal, got $other")
      }
      val seed = exprs(3) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"graft_rp seed must be a string literal, got $other")
      }
      SignedProjection(exprs(0), litInt(exprs(1), "dims"), litInt(exprs(2), "outDims"), seed)
    }),
    GraftFunctions.MatApplyName -> (exprs => {
      // The matrix arrives as an array<array<double>> literal (typedLit)
      // consumed at analysis time — the built expression carries it as a
      // JVM reference object, so no per-row literal walk survives in the
      // plan.
      val mat = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
              ad: org.apache.spark.sql.catalyst.util.ArrayData,
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.DoubleType, _), _)) =>
          Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
        case other => throw new IllegalArgumentException(
          s"graft_matapply matrix must be an array<array<double>> literal, got $other")
      }
      MatrixApply(exprs(0), mat)
    })
  )

  /** The builders as a FunctionRegistry-shaped seq, for reuse by
    * runtime registration.
    */
  private[graft] def asRegistryEntries
      : Seq[(String, FunctionRegistry.FunctionBuilder)] =
    injectables.map { case (n, b) => n -> (b: FunctionRegistry.FunctionBuilder) }
}
