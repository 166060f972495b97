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

  /** MinHash signature from a *materialized* shingle-hash array: for
    * seed s, min over shingles of xxhash64(s || shingleHash). Keeping
    * the shingle array in its own projection matters: higher-order
    * lambdas re-evaluate captured expression trees per element, so an
    * inlined shingle expression would be recomputed numHashes times
    * per row (measured 10x slowdown).
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column = {
    val seeds = sequence(lit(0), lit(numHashes - 1))
    transform(
      seeds,
      s => array_min(transform(shingleHashes, h => xxhash64(s, h))))
  }

  /** MinHash + LSH banding: signature of `bands*rowsPerBand` hashes,
    * band hash = xxhash64 over its rows; docs sharing any band hash are
    * candidates. Returns distinct candidate pairs (a < b) with the
    * number of matching bands.
    *
    * Shape: explode shingles once, then ONE groupBy(doc) carrying all
    * numHashes `min(xxhash64(seed, sh))` aggregates — each is a plain
    * codegen'd aggregate with map-side partial combine, and the
    * aggregation is a real pipeline boundary (a projected signature
    * array would be re-inlined into every consumer by CollapseProject
    * and recompute the shingling numHashes times — measured 10x).
    * The pair join shuffles on the band hash, so cost is bounded by
    * bucket sizes, not corpus size squared.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val shing = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), shingleWidth))).as("sh"))
    val sig = shing
      .groupBy(col("doc_id"))
      .agg(
        array((0 until numHashes).map(i => min(xxhash64(lit(i), col("sh")))): _*).as("sig"))
    val banded = sig
      .select(
        col("doc_id"),
        posexplode(
          array((0 until bands).map(b =>
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)
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
  /** SimHash bit-counter step over a materialized token-hash array (see
    * minhashSignature for why the array must be pre-projected).
    */
  def simhashFromHashes(hashes: Column): Column = {
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

  def simhash(text: Column): Column =
    simhashFromHashes(transform(distinctTokens(text), t => xxhash64(t)))

  def simhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    // Same explode->aggregate shape as minhashLsh: one codegen'd pass,
    // 64 bit-counter sums with map-side combine.
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(distinctTokens(col(textCol))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sh = toks
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(
        col("doc_id"),
        (0 until 64)
          .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sh"))
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
      .withColumn("hamming", bit_count(col("x")).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Exact word-set Jaccard over blocked pairs (block = e.g. language)
    * via a prefix-filtered similarity join (AllPairs/PPJoin family,
    * Bayardo et al., WWW'07 — public algorithm):
    *
    *  1. canonical token order = ascending global frequency, so a
    *     doc's prefix holds its rarest tokens;
    *  2. candidate pairs must share a token in their first
    *     `nw - ceil(t*nw) + 1` tokens — any pair with Jaccard >= t
    *     provably does — plus pass the size-ratio filter
    *     (t*|B| <= |A|, t*|A| <= |B|);
    *  3. only candidates get an exact `array_intersect` verify.
    *
    * Shuffles are bounded by prefix-token buckets (rarest-first keeps
    * them small on natural corpora), never the full |block|^2 pair
    * matrix, and the verify join re-attaches token arrays by id so the
    * candidate shuffle carries only (block, a, b) triples.
    */
  def jaccardWordPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    // Tokens are 64-bit-hashed up front: every downstream shuffle key,
    // sort and intersect works on longs instead of strings (identical
    // Jaccard modulo 64-bit collisions).
    val toks = docs.select(
      col(idCol).as("doc_id"),
      col(blockCol).as("block"),
      array_distinct(transform(distinctTokens(col(textCol)), t => xxhash64(t))).as("toks"))
    val words = toks.select(
      col("block"), col("doc_id"), size(col("toks")).as("nw"),
      explode(col("toks")).as("word"))
    val freq = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val sorted = words
      .join(freq, "word")
      .groupBy(col("block"), col("doc_id"), col("nw"))
      .agg(array_sort(collect_list(struct(col("freq"), col("word")))).as("fw"))
      .select(
        col("block"), col("doc_id"), col("nw"),
        transform(col("fw"), x => x.getField("word")).as("stoks"))
    val prefix = sorted
      .withColumn("p", (col("nw") - ceil(col("nw") * threshold) + 1).cast("int"))
      .select(
        col("block"), col("doc_id"), col("nw"),
        explode(slice(col("stoks"), lit(1), col("p"))).as("pw"))
    val pa = prefix.select(col("block"), col("pw"), col("doc_id").as("a"), col("nw").as("nwa"))
    val pb = prefix.select(col("block"), col("pw"), col("doc_id").as("b"), col("nw").as("nwb"))
    val cands = pa
      .join(pb, Seq("block", "pw"))
      .where(
        col("a") < col("b") &&
        col("nwa") >= col("nwb") * threshold && col("nwb") >= col("nwa") * threshold)
      .select(col("a"), col("b"))
      .distinct()
    val ta = sorted.select(col("doc_id").as("a"), col("stoks").as("ta"), col("nw").as("nwa"))
    val tb = sorted.select(col("doc_id").as("b"), col("stoks").as("tb"), col("nw").as("nwb"))
    cands
      .join(ta, "a")
      .join(tb, "b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn(
        "jaccard",
        round(col("inter") / (col("nwa") + col("nwb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Dedup cluster resolution: connected components over a near-dup
    * pair graph by iterative min-label propagation — each doc ends up
    * labeled with the smallest doc id reachable through near-dup edges
    * (the cluster canonical). Converges in O(graph diameter)
    * iterations; labels are localCheckpoint'ed each round so lineage
    * stays flat. At warehouse scale the same loop runs with
    * `checkpoint` to durable storage (or large-star/small-star
    * path-doubling for skewed graphs); near-dup graphs are
    * shallow-diameter by construction, so the iteration count is small.
    */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame, idCol: String): DataFrame = {
    // Materialize the edge list ONCE: both symmetric branches would
    // otherwise re-evaluate the (possibly expensive) pair-producing
    // subtree, and the loop would re-evaluate it every iteration.
    val edges = pairs.select(col("a"), col("b")).localCheckpoint()
    val sym = edges
      .select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
    var labels = nodes.select(col(idCol).as("node"), col(idCol).as("lbl")).localCheckpoint()
    // Delta iteration: only nodes whose label improved last round send
    // messages, so the per-round edge join shrinks with the frontier —
    // on a near-dup graph most labels finalize in round one and later
    // rounds touch a sliver of the edge set. Fixpoint = empty frontier.
    var frontier = labels
    var frontierSize = Long.MaxValue
    while (frontierSize > 0) {
      val messages = sym
        .join(frontier, col("src") === col("node"))
        .select(col("dst").as("node"), col("lbl"))
      val next = labels
        .unionByName(messages)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      frontier = next
        .join(labels.withColumnRenamed("lbl", "old"), "node")
        .where(col("lbl") < col("old"))
        .select(col("node"), col("lbl"))
        .localCheckpoint()
      frontierSize = frontier.count()
      labels = next
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("canonical_id"))
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
    graft.plans.GraftFunctions.register(space.sparkSession)
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
