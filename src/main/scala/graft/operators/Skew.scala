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
}
