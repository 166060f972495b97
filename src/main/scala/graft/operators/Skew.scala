package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the hand-rolled complement to AQE's skew-join splitting (which only
  * fires for sort-merge joins at runtime). The classic 100TB failure
  * mode: one hot entity (a bot user, an empty-string key) lands a whole
  * shuffle partition on one task.
  *
  * `saltedJoin` spreads the big side across `salts` sub-keys with a
  * deterministic per-row salt and replicates the small side once per
  * salt: same result as a plain inner equi-join, but the hot key's rows
  * are processed by `salts` tasks.
  */
object Skew {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltBy: Column
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew profiler — the "should I salt this key" diagnostic
    * run BEFORE committing to a join strategy: top-k heaviest keys
    * with their share of the table and their skew factor vs a uniform
    * distribution (count · nKeys / total; 1.0 = perfectly uniform).
    * All truncating integer micro-ratios. One map-side-combined count
    * per key, a 1-row totals broadcast, top-k via ORDER BY + LIMIT
    * (TakeOrderedAndProject — per-partition heaps, never a global
    * sort).
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df
      .groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    counts
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(totals))
      .select(
        col("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_micro"),
        expr("cnt * n_keys * 1000000 div total").as("skew_micro"))
  }
}
