package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequency and membership sketches — with [[Cardinality]] (HLL) and
  * the histogram quantiles in [[Analytics]], the standard
  * bounded-memory sketch quartet for 100 TB profiling: HLL answers
  * "how many distinct", Count-Min answers "how often does X occur",
  * Bloom answers "was X present", histograms answer "what's the
  * p-quantile" — each in one map-side-combined pass whose state is
  * O(sketch), never O(data).
  *
  * Engine-portable like the rest of the library's sketches: every
  * hash is a seeded md5 ([[TextFunctions.md5Long60]]) and every
  * estimate is an exact integer — no RNG, no float, hash-checkable in
  * any SQL engine.
  */
object Sketches {

  private def lane(itemCol: Column, row: Int, width: Int): Column =
    pmod(TextFunctions.md5Long60(concat_ws(":", lit(row), itemCol)), lit(width.toLong))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): a depth x width
    * integer count matrix; occurrence counts of EVERY item in bounded
    * memory, biased only upward (collisions add). One explode to
    * depth rows per item + one map-side-combined count aggregation —
    * the sketch (and any union of sketches, by cell-wise +) is
    * mergeable across partitions, days, or corpora.
    */
  def cmsBuild(items: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth out of range")
    require(width >= 2, "width must be >= 2")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("row"), lane(itemCol, r, width).as("col")))
    items
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: estimated count = min over rows of the
    * probed cell (0 when a cell is empty — the item was never seen).
    * `probes`: one row per item to query, column `item`.
    */
  def cmsQuery(sketch: DataFrame, probes: DataFrame, depth: Int, width: Int): DataFrame = {
    val lanes = (0 until depth).map(r =>
      struct(lit(r).as("row"), lane(col("item"), r, width).as("col")))
    probes
      .select(col("item"), explode(array(lanes: _*)).as("c"))
      .join(
        sketch.withColumnRenamed("cnt", "cell_cnt"),
        col("c.row") === col("row") && col("c.col") === col("col"), "left_outer")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cell_cnt"), lit(0L))).as("est_count"))
  }

  /** Bloom membership filter as its relational form: the filter is the
    * DISTINCT set of k-hash bit positions of the keys (O(set bits)
    * rows, broadcastable); a probe is a member iff ALL k of its
    * positions are set. Zero false negatives; false-positive rate
    * ~(1-e^{-kn/m})^k. The position set unions trivially (it IS a
    * set) and serializes to the classic bitmap for serving.
    */
  def bloomBuild(keys: DataFrame, keyCol: Column, k: Int, bits: Int): DataFrame = {
    require(k >= 1 && k <= 16, "k out of range")
    val positions = (0 until k).map(r => lane(keyCol, r, bits))
    keys
      .select(explode(array(positions: _*)).as("pos"))
      .distinct()
  }

  /** Probe membership: per probe item, how many of its k positions are
    * set and the membership verdict (all k set). `probes`: column
    * `item`.
    */
  def bloomProbe(filter: DataFrame, probes: DataFrame, k: Int, bits: Int): DataFrame = {
    val lanes = (0 until k).map(r => lane(col("item"), r, bits))
    probes
      .select(col("item"), explode(array(lanes: _*)).as("pos"))
      .join(filter.select(col("pos"), lit(1L).as("hit")), Seq("pos"), "left_outer")
      .groupBy(col("item"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_set"))
      .select(col("item"), col("n_set"), (col("n_set") === k).as("maybe_member"))
  }
}
