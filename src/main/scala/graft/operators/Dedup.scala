package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication suite for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram/word Jaccard, embedding-cosine.
  *
  * Scale design: every pairwise comparison is *blocked* — by content
  * hash (exact), LSH band bucket (minhash), simhash band (simhash),
  * language (jaccard) or label/cell (embedding). There is never an
  * unblocked O(n^2) cross join; bucket width is a tunable that bounds
  * the worst-case pair count per bucket.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id as the
    * canonical survivor. Single shuffle on the hash; map-side combine.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature column: for each of `numHashes` seeded hash
    * functions, the min over the doc's shingle set of
    * xxhash64(seed || shingle). Built from higher-order functions, no
    * UDF; one projection, no shuffle.
    */
  def minhashSignature(text: Column, shingleWidth: Int, numHashes: Int): Column = {
    val sh = array_distinct(shingles(text, shingleWidth))
    val seeds = sequence(lit(0), lit(numHashes - 1))
    transform(
      seeds,
      s =>
        array_min(
          transform(sh, t => xxhash64(concat(s.cast("string"), lit("|"), t)))))
  }

  /** MinHash + LSH banding: signature of `bands*rowsPerBand` hashes,
    * band hash = xxhash64 over its rows; docs sharing any band hash are
    * candidates. Returns distinct candidate pairs (a < b) with the
    * number of matching bands. The pair join shuffles on the band hash,
    * so cost is bounded by bucket sizes, not corpus size squared.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val sig = minhashSignature(col(textCol), shingleWidth, bands * rowsPerBand)
    val banded = docs
      .select(col(idCol).as("doc_id"), sig.as("sig"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
        ).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"), col("doc_id").as("a"))
    val b = banded.select(col("band"), col("band_hash"), col("doc_id").as("b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 64-bit SimHash from word unigrams: per bit, sign of the sum of
    * +/-1 contributions of each token hash. Near-dups = pairs with small
    * hamming distance, blocked on 16-bit bands (a pair within hamming
    * distance 3 shares at least one of 4 bands exactly).
    */
  def simhash(text: Column): Column = {
    val toks = distinctTokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    // bit i of the simhash = 1 iff sum_t(bit_i(hash(t)) ? 1 : -1) > 0
    val bits: Seq[Column] = (0 until 64).map { i =>
      val bitSum = aggregate(
        hashes,
        lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  def simhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val banded = sh.select(
      col("doc_id"),
      col("sh"),
      posexplode(
        array((0 until 4).map(b =>
          shiftright(col("sh"), b * 16).bitwiseAND(0xffffL)): _*)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("a"), col("sh").as("sha"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("b"), col("sh").as("shb"))
    a.join(b, Seq("band", "bh"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha").bitwiseXOR(col("shb")).as("x"))
      .distinct()
      .withColumn("hamming", bit_count(col("x")))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Exact word-set Jaccard over blocked pairs (block = e.g. language).
    * Unnest-join-count shape: shuffles on (block, word), never
    * materializes the full pair matrix, and the `a < b` triangle keeps
    * each pair once.
    */
  def jaccardWordPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    val words = docs.select(
      col(idCol).as("doc_id"),
      col(blockCol).as("block"),
      explode(distinctTokens(col(textCol))).as("word"))
    val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
    val wa = words.select(col("block"), col("word"), col("doc_id").as("a"))
    val wb = words.select(col("block"), col("word"), col("doc_id").as("b"))
    val inter = wa
      .join(wb, Seq("block", "word"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("nw", "nwa"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("nw", "nwb"), "b")
      .withColumn(
        "jaccard",
        round(col("inter") / (col("nwa") + col("nwb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Embedding-cosine near-dups, blocked (label, LSH cell, ...) so the
    * pair count is sum of per-block squares, not corpus squared.
    */
  def embeddingNearDups(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    val s = space.select(
      col(blockCol).as("block"), col(keyCol).as("a"), col(vecCol).as("va"))
    val t = space.select(
      col(blockCol).as("block"), col(keyCol).as("b"), col(vecCol).as("vb"))
    s.join(t, Seq("block"))
      .where(col("a") < col("b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .where(col("cos_sim") > threshold)
      .select(col("a"), col("b"), round(col("cos_sim"), 6).as("cos_sim"))
  }
}
