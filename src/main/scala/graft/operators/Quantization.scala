package graft.operators

import graft.operators.Pins.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (PQ) — the published compressed-index scale
  * path for billion-scale vector search (Jégou, Douze, Schmid:
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
  * same IVF-PQ layout FAISS uses). Where the reference serves ANN from
  * a single-node float-precision HNSW graph (reference:
  * embeddinghub/embeddingstore/index.h), PQ re-expresses the corpus as
  * m small codes per vector:
  *
  *  - split each d-dim vector into m subvectors of d/m dims;
  *  - learn a ksub-centroid codebook per subspace (Lloyd, L2);
  *  - encode each vector as its m nearest-sub-centroid ids
  *    (m bytes/vector at ksub <= 256 — a 256x compression of a
  *    64-dim float corpus, which is what makes a 100 TB corpus
  *    scannable in memory);
  *  - answer queries by ADC (asymmetric distance computation): one
  *    m x ksub lookup table per query, then distance(q, x) ~=
  *    sum_j table[j][code_j(x)] — table lookups instead of float
  *    kernels over the full vectors.
  *
  * Every stage is a declarative DataFrame plan: codebooks are a
  * (subspace, cell, dim) aggregation, encoding is a broadcast join +
  * argmin, and the ADC scan is a narrow projection over the encoded
  * corpus feeding the bounded-heap top-k aggregate — no shuffle
  * carries more than (partitions x k) rows per query.
  *
  * Determinism: seeds are the ksub smallest keys' subvectors,
  * assignment ties break toward the smaller centroid id, and the ADC
  * sum is a sequential fold in subspace order, so results are exactly
  * reproducible (and DuckDB-oracle-checkable) for a fixed schedule.
  */
object Quantization {

  /** (vec_id, subspace, subvec) — the vector split into m contiguous
    * d/m-dim subvectors, cast to double once at the boundary.
    */
  def subVectors(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int
  ): DataFrame = {
    require(dims % m == 0, s"dims=$dims must be divisible by m=$m")
    val dsub = dims / m
    space.select(
      col(keyCol).as("vec_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(m - 1)),
          j => transform(slice(col(vecCol), j * dsub + 1, lit(dsub)), x => x.cast("double"))))
        .as(Seq("subspace", "subvec")))
  }

  /** Per-subspace Lloyd k-means codebooks: (subspace, centroid_id,
    * centroid). All m subspaces iterate together — each iteration is
    * ONE broadcast of the m*ksub sub-centroids + one scan + one
    * (subspace, cell, dim) aggregation, regardless of m. Final ids are
    * re-densified to 0..n-1 per subspace (Lloyd can empty a cell), so
    * codes index positionally into ADC tables.
    */
  def pqCodebooks(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int
  ): DataFrame = {
    graft.plans.GraftFunctions.register(space.sparkSession)
    val sub = subVectors(space, keyCol, vecCol, m, dims)
    // Seeds: the ksub smallest keys (TakeOrdered — per-partition top-k,
    // no global sort), split into subspaces; centroid_id = key rank.
    val seedKeys = space.select(col(keyCol).as("vec_id")).orderBy(col("vec_id")).limit(ksub)
    var cents = sub
      .join(broadcast(seedKeys), "vec_id")
      .select(
        col("subspace"),
        col("vec_id"),
        col("subvec").as("centroid"))
      .withColumn(
        "centroid_id",
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("subspace")).orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("subspace"), col("centroid_id"), col("centroid"))
    for (_ <- 0 until iterations) {
      // E-step carries the subvector through the argmin group (see
      // [[assignCellsWithVec]]) so the M-step reads it directly — the
      // old sub ⋈ assigned re-join per iteration is gone (r11
      // optimization; identical assignment and means).
      cents = assignCellsWithVec(sub, cents)
        .select(col("subspace"), col("cell"), posexplode(col("subvec")).as(Seq("pos", "x")))
        .groupBy(col("subspace"), col("cell"), col("pos"))
        .agg(avg(col("x")).as("c"))
        .groupBy(col("subspace"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(
          col("subspace"),
          col("cell").as("centroid_id"),
          transform(col("pc"), p => p.getField("c")).as("centroid"))
    }
    // Re-densify ids so they are contiguous per subspace.
    cents
      .withColumn(
        "centroid_id",
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("subspace")).orderBy(col("centroid_id"))) - 1).cast("int"))
  }

  /** Nearest sub-centroid per (vec_id, subspace) by squared L2; ties
    * break toward the smaller centroid id. Codebook is broadcast (it is
    * m*ksub rows by construction); the subvector stream never shuffles.
    */
  private def assignCells(sub: DataFrame, cents: DataFrame): DataFrame =
    sub
      .join(broadcast(cents), "subspace")
      .withColumn("d", VectorFunctions.l2Sq(col("subvec"), col("centroid")))
      .groupBy(col("vec_id"), col("subspace"))
      .agg(min_by(col("centroid_id"), struct(col("d"), col("centroid_id"))).as("cell"))

  /** [[assignCells]] with the subvector CARRIED through the argmin
    * group (first(subvec) is constant within a (vec_id, subspace)
    * group — the group's rows are one sub row replicated per broadcast
    * centroid), so the M-step needs no re-join with the subvector
    * stream (r11 optimization, one exchange + join less per Lloyd
    * iteration; the Similarity.nearestCentroidWithVec trade).
    * PRECONDITION: (vec_id, subspace) must be unique in `sub` — with
    * duplicates, first(subvec) silently collapses rows the old
    * assign-then-rejoin shape would have weighted into the M-step mean
    * (see the nearestCentroidWithVec scaladoc). pqEncode derives sub
    * from a keyed corpus via posexplode, so the contract holds for
    * every current caller.
    */
  private def assignCellsWithVec(sub: DataFrame, cents: DataFrame): DataFrame =
    sub
      .join(broadcast(cents), "subspace")
      .withColumn("d", VectorFunctions.l2Sq(col("subvec"), col("centroid")))
      .groupBy(col("vec_id"), col("subspace"))
      .agg(
        min_by(col("centroid_id"), struct(col("d"), col("centroid_id"))).as("cell"),
        first(col("subvec")).as("subvec"))

  /** PQ encoding: (vec_id, codes) with codes[j] = nearest sub-centroid
    * of subspace j — the m-byte compressed representation of the corpus.
    */
  def pqEncode(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      codebooks: DataFrame
  ): DataFrame = {
    graft.plans.GraftFunctions.register(space.sparkSession)
    assignCells(subVectors(space, keyCol, vecCol, m, dims), codebooks)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("cell")))).as("sc"))
      .select(col("vec_id"), transform(col("sc"), p => p.getField("cell")).as("codes"))
  }

  /** ADC top-k: for each query, a (m x ksub) distance table against the
    * codebooks (tiny: queries x m x ksub rows, broadcast), then one
    * narrow scan of the ENCODED corpus — per row the approximate
    * distance is m positional table lookups folded in subspace order —
    * into the bounded-heap top-k. The full-precision corpus is never
    * touched at query time; that is the entire point of PQ at 100 TB.
    */
  def pqKnnAdc(
      encoded: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      codebooks: DataFrame,
      k: Int
  ): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val qsub = subVectors(queries, keyCol, vecCol, m, dims)
      .withColumnRenamed("vec_id", "query_id")
    // tables[j][c+1] = ||q_sub_j - centroid_c||^2, positionally indexed.
    val qTables = qsub
      .join(broadcast(codebooks), "subspace")
      .withColumn("d", VectorFunctions.l2Sq(col("subvec"), col("centroid")))
      .groupBy(col("query_id"), col("subspace"))
      .agg(array_sort(collect_list(struct(col("centroid_id"), col("d")))).as("cd"))
      .select(
        col("query_id"), col("subspace"),
        transform(col("cd"), p => p.getField("d")).as("dists"))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("dists")))).as("sd"))
      .select(col("query_id"), transform(col("sd"), p => p.getField("dists")).as("tables"))
    val scored = encoded
      .select(col("vec_id").as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(qTables))
      .where(col("neighbor_id") =!= col("query_id"))
      // Native codegen'd ADC (same subspace-order fold as the HOF
      // formulation, bit-identical) — this runs per (query, code-row)
      // pair, the hot loop of the PQ scan.
      .withColumn("adist", VectorFunctions.adc(col("tables"), col("codes")))
    Similarity.topKPerGroup(
      scored.withColumn("sim", -col("adist")), "query_id", "sim", "neighbor_id", k)
  }

  /** IVF-PQ: the composed billion-scale ANN layout (Jégou et al.
    * TPAMI'11 §V; the FAISS IVFPQ index) — a coarse partition of the
    * corpus into cells, plus product quantization of the RESIDUAL
    * (vector minus its cell centroid), which is far more quantizable
    * than the raw vector. Queries probe only nProbe cells and score
    * candidates by per-(query, cell) ADC tables over the residual
    * codes.
    *
    * Corpus-side plan: one broadcast join (cell centroids) + narrow
    * residual projection + PQ encode — the full-precision corpus is
    * read once at build time and never at query time. Query-side: the
    * ADC scan touches only the probed cells' code rows (~nProbe/nCells
    * of the corpus), each row costing m table lookups.
    *
    * The coarse quantizer is a learned k-means codebook (the same
    * build `knnIvfKmeans` uses, cosine assignment) — geometric cells
    * are what make residuals small and probed cells likely to hold the
    * true neighbors; partitioning by an arbitrary metadata column
    * measurably degrades both (A/B'd in the spec history).
    */
  /** Built IVF-PQ index artifacts: `coarse` = (cell, c_vec) coarse
    * centroids, `codebooks` = residual PQ codebooks, `encoded` =
    * (vec_id, codes, cell) corpus codes. The build-once handle that
    * [[probeIvfPq]] (and the nProbe tuner) answer queries from — on a
    * cluster these are the tables you persist alongside the corpus.
    */
  final case class IvfPqIndex(coarse: DataFrame, codebooks: DataFrame, encoded: DataFrame)

  /** Build the IVF-PQ index: coarse k-means cells, per-cell residuals,
    * residual PQ codebooks, encoded corpus. `pinEncoded` additionally
    * pins the encoded corpus — do that when probing more than once
    * (the tuner), not for a one-shot query where it would add a
    * materialization pass. The encoded corpus is corpus-sized (m bytes
    * per vector), so `durable = true` switches that pin from
    * executor-resident localCheckpoint to the fault-tolerant
    * reliable checkpoint for real-cluster runs — same trade as
    * `Dedup.connectedComponents`; on a production cluster you would
    * instead persist `encoded` as a table alongside the corpus.
    * (The coarse/codebook artifacts are k-row-sized; their local pins
    * are rebuild-cheap and never the durability concern.)
    */
  def buildIvfPq(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      nCells: Int,
      coarseIterations: Int,
      pinEncoded: Boolean = false,
      durable: Boolean = false
  ): IvfPqIndex = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    // Coarse codebook (nCells rows, broadcast) + corpus cell assignment.
    val coarse = Similarity
      .kmeansCodebook(corpus, keyCol, vecCol, nCells, coarseIterations)
      .select(col("centroid_id").as("cell"), col("centroid").as("c_vec"))
      .pinned()
    // Residuals: vec - centroid[cell], computed once per corpus row —
    // the carried-vector assignment (Similarity.nearestCentroidWithVec)
    // makes the old corpus re-join on vec_id unnecessary (r11).
    val resid = Similarity
      .nearestCentroidWithVec(corpus, keyCol, vecCol,
        coarse.select(col("cell").as("centroid_id"), col("c_vec").as("centroid")))
      .withColumnRenamed("assigned", "cell")
      .join(broadcast(coarse), "cell")
      .select(
        col("vec_id"), col("cell"),
        zip_with(col("v"), col("c_vec"), (x, y) => x.cast("double") - y).as("r"))
    val cb = pqCodebooks(resid, "vec_id", "r", m, dims, ksub, iterations)
      .pinned()
    val enc = pqEncode(resid, "vec_id", "r", m, dims, cb)
      .join(resid.select(col("vec_id"), col("cell")), "vec_id")
    val pinned = if (!pinEncoded) enc else Pins.pin(enc, durable)
    IvfPqIndex(coarse, cb, pinned)
  }

  /** Encode rows with a FROZEN index's artifacts (coarse cells +
    * residual codebooks), no re-training: nearest coarse cell →
    * residual → PQ codes. This is the delta path of incremental index
    * maintenance — O(|rows|) work against broadcast-sized artifacts.
    */
  def encodeWithIndex(
      index: IvfPqIndex,
      rows: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int
  ): DataFrame = {
    graft.plans.GraftFunctions.register(rows.sparkSession)
    val resid = Similarity
      .nearestCentroidWithVec(rows, keyCol, vecCol,
        index.coarse.select(col("cell").as("centroid_id"), col("c_vec").as("centroid")))
      .withColumnRenamed("assigned", "cell")
      .join(broadcast(index.coarse), "cell")
      .select(
        col("vec_id"), col("cell"),
        zip_with(col("v"), col("c_vec"), (x, y) => x.cast("double") - y).as("r"))
    pqEncode(resid, "vec_id", "r", m, dims, index.codebooks)
      .join(resid.select(col("vec_id"), col("cell")), "vec_id")
  }

  /** Incremental IVF-PQ maintenance — the index-layer analog of the
    * embeddinghub Set/MultiSet write path (reference:
    * embeddinghub/embeddingstore/embedding_store.proto:13-16, whose
    * server re-inserts into the live HNSW): merge a vector delta into
    * an EXISTING index without re-training. Delta rows are encoded
    * with the frozen coarse/PQ artifacts ([[encodeWithIndex]]) and
    * upserted into the encoded corpus last-writer-wins (anti-join on
    * the delta keys, then union — the same shape as
    * FeatureStore.materializeIncremental).
    *
    * Scale: work is O(|delta|) + one anti-join on the changed-key set
    * (broadcastable at daily-delta sizes); the surviving encoded rows
    * stream through untouched, and the quantizer never re-trains —
    * which is the only viable cadence at 100 TB (periodic re-train is
    * a separate, rarer job; recall degrades only as the data
    * distribution drifts away from the frozen codebooks — monitor
    * with FeatureStore.featureDrift over e.g. vector norms).
    */
  def upsertIvfPq(
      index: IvfPqIndex,
      delta: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int
  ): IvfPqIndex = {
    val deltaEnc = encodeWithIndex(index, delta, keyCol, vecCol, m, dims)
    val merged = index.encoded
      .join(delta.select(col(keyCol).as("vec_id")), Seq("vec_id"), "left_anti")
      .unionByName(deltaEnc)
    index.copy(encoded = merged)
  }

  /** Outcome of a drift-gated index maintenance pass: the (possibly
    * rebuilt) index, whether the re-train fired, and the observed max
    * per-cell centroid shift that drove the decision.
    */
  case class IvfPqMaintenance(index: IvfPqIndex, retrained: Boolean, maxShift: Double)

  /** Drift-triggered IVF-PQ maintenance — the policy layer over
    * [[upsertIvfPq]] (cheap, frozen quantizer) and [[buildIvfPq]]
    * (full re-train): measure how far the corpus has drifted from the
    * index's frozen coarse centroids, and re-train only when it
    * matters. The drift statistic is the max L2 shift between each
    * frozen cell centroid and the fresh mean of the vectors now
    * assigned to that cell — the vector-space analog of
    * Similarity.centroidDrift, computed against the LIVE index
    * artifacts instead of a time split.
    *
    * Scale: assignment is the normal broadcast-centroid scan
    * (O(|corpus|), no shuffle beyond the nCells-row mean agg); the
    * shift reduction collects nCells doubles to take a max — the same
    * tiny-driver-read pattern as the recall gates. The expensive
    * branch (re-train) runs only when the threshold trips, which is
    * the only sane cadence at 100 TB: daily deltas take the O(|delta|)
    * upsert path; the quarterly distribution shift pays for one
    * rebuild.
    */
  def maintainIvfPq(
      index: IvfPqIndex,
      corpus: DataFrame, // full post-delta corpus
      delta: DataFrame, // the new/changed rows only
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      nCells: Int,
      coarseIterations: Int,
      shiftThreshold: Double
  ): IvfPqMaintenance = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val fresh = Similarity.centroids(
      Similarity.nearestCentroidWithVec(
        corpus, keyCol, vecCol,
        index.coarse.select(col("cell").as("centroid_id"), col("c_vec").as("centroid"))),
      "assigned", "v")
    val shifts = fresh
      .join(
        index.coarse.select(col("cell").as("centroid_id"), col("c_vec")),
        "centroid_id")
      .select(sqrt(VectorFunctions.l2Sq(col("centroid"), col("c_vec"))).as("shift"))
      .agg(max(col("shift")))
      .head()
    val maxShift = if (shifts.isNullAt(0)) 0.0 else shifts.getDouble(0)
    if (maxShift > shiftThreshold)
      IvfPqMaintenance(
        buildIvfPq(corpus, keyCol, vecCol, m, dims, ksub, iterations, nCells, coarseIterations),
        retrained = true, maxShift)
    else
      IvfPqMaintenance(
        upsertIvfPq(index, delta, keyCol, vecCol, m, dims),
        retrained = false, maxShift)
  }

  /** Probe a built IVF-PQ index: nProbe nearest cells per query, ADC
    * over the residual codes of just those cells.
    */
  def probeIvfPq(
      index: IvfPqIndex,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      nProbe: Int,
      k: Int
  ): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val coarse = index.coarse
    val cb = index.codebooks
    val enc = index.encoded
    // Query side: nProbe nearest cells (cosine, same ranking as the
    // corpus assignment), then a per-(query, cell) ADC table over the
    // QUERY residual for that cell.
    val q = queries.select(col(keyCol).as("query_id"), col(vecCol).as("q_vec"))
    val qCells = q
      .crossJoin(broadcast(coarse))
      .withColumn("sim", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell"))))
      .where(col("rk") <= nProbe)
      .select(
        col("query_id"), col("cell"),
        zip_with(col("q_vec"), col("c_vec"), (x, y) => x.cast("double") - y).as("qr"))
    val qsub = qCells.select(
      col("query_id"), col("cell"),
      posexplode(
        transform(
          sequence(lit(0), lit(m - 1)),
          j => slice(col("qr"), j * (dims / m) + 1, lit(dims / m))))
        .as(Seq("subspace", "subvec")))
    val qTables = qsub
      .join(broadcast(cb), "subspace")
      .withColumn("d", VectorFunctions.l2Sq(col("subvec"), col("centroid")))
      .groupBy(col("query_id"), col("cell"), col("subspace"))
      .agg(array_sort(collect_list(struct(col("centroid_id"), col("d")))).as("cd"))
      .select(
        col("query_id"), col("cell"), col("subspace"),
        transform(col("cd"), p => p.getField("d")).as("dists"))
      .groupBy(col("query_id"), col("cell"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("dists")))).as("sd"))
      .select(
        col("query_id"), col("cell"),
        transform(col("sd"), p => p.getField("dists")).as("tables"))
    val scored = enc
      .join(broadcast(qTables), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      // Native codegen'd ADC over the probed cells' code rows.
      .withColumn("adist", VectorFunctions.adc(col("tables"), col("codes")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), (-col("adist")).as("sim"))
    Similarity.topKPerGroup(scored, "query_id", "sim", "neighbor_id", k)
  }

  /** IVF-PQ end to end: build the index, answer queries. One-shot form
    * of [[buildIvfPq]] + [[probeIvfPq]].
    */
  def knnIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      nCells: Int,
      coarseIterations: Int,
      nProbe: Int,
      k: Int
  ): DataFrame = {
    val index = buildIvfPq(
      corpus, keyCol, vecCol, m, dims, ksub, iterations, nCells, coarseIterations)
    probeIvfPq(index, queries, keyCol, vecCol, m, dims, nProbe, k)
  }

  /** IVF-PQ serving with exact re-rank — FAISS's IndexIVFPQ +
    * RefineFlat composition, the canonical production serving shape:
    * the compressed index proposes k·overfetch candidates by ADC
    * (probed cells only — the corpus is never scanned at full
    * precision), then ONLY the shortlist pays a full-precision cosine.
    * Memory stays PQ-sized while final ranking quality recovers most
    * of the quantization loss; the rerank cost is a
    * candidate-sized hash join + broadcast of the query vectors, same
    * shape as [[knnBinaryRerank]].
    */
  def knnIvfPqRerank(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      nCells: Int,
      coarseIterations: Int,
      nProbe: Int,
      k: Int,
      overfetch: Int
  ): DataFrame = {
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val cands = knnIvfPq(
      corpus, queries, keyCol, vecCol, m, dims, ksub, iterations,
      nCells, coarseIterations, nProbe, k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(
      queries.select(col(keyCol).as("query_id"), col(vecCol).as("q_vec")))
    val rescored = cands
      .join(
        corpus.select(col(keyCol).as("neighbor_id"), col(vecCol).as("n_vec")),
        "neighbor_id")
      .join(qv, "query_id")
      .withColumn("sim",
        graft.functions.VectorFunctions.cosine(col("q_vec"), col("n_vec")))
    Similarity.topKPerGroup(rescored, "query_id", "sim", "neighbor_id", k)
  }

  /** Smallest nProbe whose WORST-query recall vs exact euclidean top-k
    * meets the target — the IVF-PQ acceptance-gate loop, mirroring
    * `Similarity.tuneNProbe`'s contract: Some(nProbe) for the first of
    * the doubling candidates (clamped to maxProbe, which is always
    * evaluated before giving up) that meets the target, None when even
    * maxProbe misses it — with PQ the quantization loss itself caps
    * recall, so None is a real outcome meaning "re-train with more
    * cells/finer codebooks", not "probe wider". The index is built
    * ONCE (encoded corpus pinned); each candidate costs one probe +
    * one k-row-per-query recall aggregate — scalar driver reads only.
    * An empty query set vacuously meets any target at nProbe=1.
    */
  def tuneIvfPqNProbe(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      nCells: Int,
      coarseIterations: Int,
      k: Int,
      targetRecall: Double,
      maxProbe: Int
  ): Option[Int] = {
    require(maxProbe >= 1, s"maxProbe must be >= 1, got $maxProbe")
    val index = buildIvfPq(
      corpus, keyCol, vecCol, m, dims, ksub, iterations, nCells, coarseIterations,
      pinEncoded = true)
    val exact = Similarity
      .knnBruteForceL2(corpus, queries, keyCol, vecCol, k).pinned()
    Similarity.tuneProbeLoop(
      exact,
      nProbe => probeIvfPq(index, queries, keyCol, vecCol, m, dims, nProbe, k),
      targetRecall, maxProbe)
  }

  /** End-to-end PQ search: build codebooks, encode the corpus, answer
    * queries by ADC. The one-call form of the build -> encode -> probe
    * pipeline, mirroring `Similarity.knnIvfKmeans` for the IVF path.
    */
  def pqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      iterations: Int,
      k: Int
  ): DataFrame = {
    val cb = pqCodebooks(corpus, keyCol, vecCol, m, dims, ksub, iterations)
      .pinned() // index-build artifact: pin so probe doesn't re-iterate Lloyd
    val enc = pqEncode(corpus, keyCol, vecCol, m, dims, cb)
    pqKnnAdc(enc, queries, keyCol, vecCol, m, dims, cb, k)
  }

  /** Per-vector int8 scalar quantization — the storage-tier compression
    * for embedding corpora (4x smaller than float32; the float16/int8
    * options every production vector store exposes). Each vector is
    * min-max-scaled onto the 0..255 grid independently, so no training
    * pass or codebook is needed and each row quantizes in isolation —
    * a pure narrow projection that runs at scan speed and parallelizes
    * trivially at 100 TB.
    *
    * Returns the codes plus reconstruction-error stats so the lossiness
    * is observable per vector. Constant vectors (scale 0) map to code 0
    * and reconstruct exactly. Error accumulation is a sequential fold
    * in dimension order — deterministic and reproducible externally.
    */
  /** Rotate every vector by a plan-time constant matrix: y = R·x
    * (rows of `rot` are output coordinates). Narrow projection — the
    * matrix rides along as a codegen reference object (one copy per
    * generated class, not a per-row literal walk); no shuffle. The
    * native kernel ([[graft.plans.MatrixApply]]) accumulates in
    * ascending input-dim order, bit-identical to the previous HOF
    * `aggregate` fold and to the unrolled literal-weight SQL oracle.
    */
  def rotate(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      rot: Seq[Seq[Double]]
  ): DataFrame = {
    graft.plans.GraftFunctions.register(space.sparkSession)
    space.select(
      col(keyCol).as("vec_id"),
      call_function(
        graft.plans.GraftFunctions.MatApplyName, col(vecCol), typedLit(rot)).as("vec"))
  }

  /** Decode PQ codes back to their reconstructed vectors (sub-centroid
    * concatenation) — the ŷ used for error measurement and OPQ's
    * Procrustes step.
    */
  def pqReconstruct(encoded: DataFrame, codebooks: DataFrame): DataFrame =
    encoded
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "cell")))
      .join(codebooks.withColumnRenamed("centroid_id", "cell"), Seq("subspace", "cell"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("centroid")))).as("sc"))
      .select(
        col("vec_id"),
        flatten(transform(col("sc"), p => p.getField("centroid"))).as("recon"))

  /** Mean squared PQ reconstruction error of a (vec, recon) pairing —
    * the quantization-quality scalar OPQ minimizes.
    */
  def pqMse(space: DataFrame, keyCol: String, vecCol: String, recon: DataFrame): Double =
    space
      .select(col(keyCol).as("vec_id"), transform(col(vecCol), x => x.cast("double")).as("x"))
      .join(recon, "vec_id")
      .select(
        aggregate(
          zip_with(col("x"), col("recon"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v).as("e"))
      .agg(avg(col("e")))
      .head().getDouble(0)

  /** OPQ — optimized product quantization (Ge et al., CVPR'13,
    * non-parametric solver): learn an orthogonal rotation R that
    * minimizes PQ reconstruction error by alternating (a) train+encode
    * PQ on the rotated corpus, (b) solve the orthogonal Procrustes
    * problem R = V·Uᵀ from the SVD of A = Σ x·ŷᵀ. The cross-covariance
    * A is a d×d aggregate computed distributively (two posexplodes +
    * one (i,j) sum — d² cells, collected once per iteration: 4096
    * doubles for d=64, the only driver-side data); the SVD is a d×d
    * driver-side Breeze call, same pattern as the CC loop's scalar
    * fixpoint reads. Spec-verified (orthogonality + error vs plain PQ).
    * LAPACK SVD has no cross-engine bit contract, so the emb_opq_knn
    * oracle does not re-derive R in SQL — Verify computes R once
    * (bit-stable: decimal-exact covariance + same-JVM SVD) and embeds
    * it as literals in the generated oracle (SparkEntry.opqKnnOracle).
    */
  def opqRotation(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      dims: Int,
      ksub: Int,
      pqIterations: Int,
      opqIterations: Int
  ): Seq[Seq[Double]] = {
    var rot: Seq[Seq[Double]] =
      Seq.tabulate(dims, dims)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to opqIterations) {
      val rotated = rotate(space, keyCol, vecCol, rot).pinned()
      val cb = pqCodebooks(rotated, "vec_id", "vec", m, dims, ksub, pqIterations)
        .pinned()
      val recon = pqReconstruct(pqEncode(rotated, "vec_id", "vec", m, dims, cb), cb)
      // Decimal-exact covariance: each x·ŷ term 12dp-rounded and summed
      // as DECIMAL so A — and therefore the SVD and R — is bit-stable
      // under any partitioning/run (two separate evaluations of this
      // pipeline must hand the SAME matrix to the same LAPACK).
      val cells = space
        .select(col(keyCol).as("vec_id"), transform(col(vecCol), x => x.cast("double")).as("x"))
        .join(recon, "vec_id")
        .select(col("vec_id"), posexplode(col("x")).as(Seq("i", "xi")), col("recon"))
        .select(col("i"), posexplode(transform(col("recon"), y => col("xi") * y)).as(Seq("j", "v")))
        .groupBy(col("i"), col("j"))
        .agg(sum(round(col("v"), 12).cast("decimal(38,12)")).cast("double").as("a"))
        .collect()
      val a = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
      cells.foreach(r => a(r.getAs[Int]("i"), r.getAs[Int]("j")) = r.getAs[Double]("a"))
      val s = breeze.linalg.svd(a)
      // max tr(R·A), A = U·S·Vᵀ  ⇒  R = V·Uᵀ
      val rNew = s.Vt.t * s.U.t
      rot = Seq.tabulate(dims, dims)((out, in) => rNew(out, in))
    }
    rot
  }

  /** Deterministic ±1 sign for random-projection cell (i, j): +1 iff
    * the first hex digit of md5("<seed>:<j>:<i>") is 0-7. Content-keyed
    * like Sampling's hash thresholds: any engine with md5 reproduces
    * the projection matrix exactly — no RNG state, no seed files.
    */
  def rpSign(seed: String, i: Int, j: Int): Double =
    graft.plans.SignedProjection.sign(seed, i, j)

  /** Native codegen'd form of [[randomProjection]] — the production
    * path: one compact expression node (graft_rp) instead of a
    * dims×outDims-term tree, identical output bit-for-bit (same signs,
    * same ascending-i double accumulation per output dim).
    */
  def randomProjectionNative(
      vec: Column,
      dims: Int,
      outDims: Int,
      seed: String = "rp"
  ): Column =
    call_function(
      graft.plans.GraftFunctions.RpName, vec, lit(dims), lit(outDims), lit(seed))

  /** Achlioptas-style dense ±1 random projection to `outDims`
    * dimensions: out_j = Σ_i vec[i]·s(i,j) / sqrt(outDims), signs from
    * [[rpSign]]. Johnson–Lindenstrauss distance preservation with a
    * data-independent matrix — the projection needs no training pass
    * (vs PQ/k-means), so it applies in a pure narrow projection at scan
    * speed; the matrix itself is plan-time constant (dims×outDims
    * signs folded into the expression).
    *
    * Exactness: each signed term is the float element exactly negated
    * (±1 multiply introduces no rounding) and the per-output sum is a
    * SEQUENTIAL left fold in dimension order — plain double adds whose
    * order is pinned by the expression shape, so any engine evaluating
    * the same fold reproduces the result bit-for-bit (the oracle emits
    * the identical left-associated chain). A decimal-summed variant
    * was measured 15x slower: 1024 decimal ops per row blow Janino's
    * 64KB method limit and drop the whole stage to interpreted mode.
    */
  def randomProjection(
      vec: Column,
      dims: Int,
      outDims: Int,
      seed: String = "rp"
  ): Column = {
    require(dims >= 1 && outDims >= 1, "dims and outDims must be >= 1")
    val scale = math.sqrt(outDims.toDouble)
    val outs = (0 until outDims).map { j =>
      val s = (1 to dims)
        .map(i => element_at(vec, i).cast("double") * lit(rpSign(seed, i, j)))
        .reduce(_ + _)
      (s / lit(scale)).as(s"p$j")
    }
    array(outs: _*)
  }

  /** 1-bit-per-dimension binary sketch packed into a single BIGINT
    * (bit i = 1 iff vec[i] > 0) — the extreme end of the storage-
    * compression ladder (int8 = 4x, PQ m=16 = 16x, this = 32x for
    * 64-dim float32): a 100 TB embedding corpus collapses to ~3 TB of
    * longs, and candidate generation becomes xor + popcount at scan
    * speed. Static per-bit terms (no variable shifts, no HOF) keep the
    * whole sketch inside one codegen'd projection.
    */
  def binarySketch(vec: Column, dims: Int): Column = {
    require(dims > 0 && dims <= 64, s"binarySketch packs into one long, got dims=$dims")
    (0 until dims)
      .map(i => when(element_at(vec, i + 1) > 0f, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k by HAMMING distance over binary sketches: broadcast
    * query sketches x one narrow corpus scan (two longs per row) into
    * the bounded-heap top-k. The heap score composes
    * (hamming, neighbor_id) into one strictly-unique double
    * (hamming * 2^44 + id, exact in double's 53-bit mantissa), so
    * ranking is fully deterministic despite hamming's heavy ties —
    * equivalent to ORDER BY hamming, neighbor_id.
    */
  def knnBinaryHamming(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      dims: Int,
      k: Int
  ): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(keyCol).as("neighbor_id"), binarySketch(col(vecCol), dims).as("skn"))
    val q = broadcast(
      queries.select(col(keyCol).as("query_id"), binarySketch(col(vecCol), dims).as("skq")))
    val scored = c
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn(
        "sim",
        -(bit_count(col("skn").bitwiseXOR(col("skq"))).cast("double") * math.pow(2, 44) +
          col("neighbor_id").cast("double")))
    Similarity.topKPerGroup(scored, "query_id", "sim", "neighbor_id", k)
  }

  /** Two-stage binary-prefilter kNN — the practical deployment of the
    * 32x sketch tier: hamming over packed sign bits generates
    * k·`overfetch` candidates at xor+popcount scan speed, then ONLY
    * those candidates are re-scored with exact float cosine and cut to
    * top-k. At 100 TB the full-precision vectors are touched for
    * k·overfetch rows per query instead of the whole corpus — the
    * sketch is the scan, the floats are a point lookup. Stage 2 is a
    * candidate⨝corpus hash join (shuffles only candidate-sized data)
    * plus the broadcast query vectors.
    */
  def knnBinaryRerank(
      corpus: DataFrame,
      queries: DataFrame,
      keyCol: String,
      vecCol: String,
      dims: Int,
      k: Int,
      overfetch: Int
  ): DataFrame = {
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val cands = knnBinaryHamming(corpus, queries, keyCol, vecCol, dims, k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(
      queries.select(col(keyCol).as("query_id"), col(vecCol).as("q_vec")))
    val rescored = cands
      .join(corpus.select(col(keyCol).as("neighbor_id"), col(vecCol).as("n_vec")),
        "neighbor_id")
      .join(qv, "query_id")
      .withColumn("sim",
        graft.functions.VectorFunctions.cosine(col("q_vec"), col("n_vec")))
    Similarity.topKPerGroup(rescored, "query_id", "sim", "neighbor_id", k)
  }

  def int8Quantize(space: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    // Per-row min/scale as TOP-LEVEL projection columns feeding a
    // Generate (explode) boundary — each is computed once per vector.
    // (The tempting all-HOF formulation re-evaluates array_min/max
    // inside every transform lambda — O(d^2) per row and interpreted:
    // measured ~10s for 5k x 64 dims where this plan takes ~0.2s.)
    // After the explode everything is scalar codegen'd arithmetic and
    // ONE map-side-combined aggregation back to per-vector stats.
    val vmin = array_min(col(vecCol)).cast("double")
    val vmax = array_max(col(vecCol)).cast("double")
    val exploded = space.select(
      col(keyCol).as("vec_id"),
      vmin.as("vmin"),
      ((vmax - vmin) / lit(255.0)).as("scale"),
      explode(col(vecCol)).as("xf"))
    val code = when(col("scale") === 0.0, lit(0.0))
      .otherwise(round((col("xf").cast("double") - col("vmin")) / col("scale"), 0))
    val err = abs(col("xf").cast("double") - (col("vmin") + code * col("scale")))
    exploded
      .select(col("vec_id"), code.cast("int").as("code"), err.as("err"))
      .groupBy(col("vec_id"))
      .agg(
        count(lit(1)).as("n_codes"),
        min(col("code")).cast("long").as("code_min"),
        max(col("code")).cast("long").as("code_max"),
        round(max(col("err")), 6).as("max_abs_err"),
        round(sum(col("err")) / count(lit(1)), 6).as("mean_abs_err"))
  }

  /** Learn a PCA-whitening transform from the corpus: top-k principal
    * directions of the covariance, each scaled by 1/√(λ+ε) — the
    * classic embedding post-processing (Jégou–Chum ECCV'12 "Negative
    * evidences and co-occurrences"; standard before PQ and for
    * retrieval score calibration). Returns (μ, W) with W k×dims;
    * whitened = W·(x − μ).
    *
    * Distributed part: ONE pass for per-dim decimal-exact sums and one
    * for the d×d second-moment matrix (posexplode² + map-side-combined
    * sum — the OPQ covariance shape; d² rows to the driver, d=64 ⇒
    * 4096). Driver part: C = S/n − μμᵀ (IEEE on exact ingredients) +
    * LAPACK eigSym — O(d³) on a d×d matrix, independent of corpus
    * size. Bit-stable: decimal sums are partition-order independent
    * and the same matrix always hands the same eigenvectors to the
    * same LAPACK.
    */
  def pcaWhitening(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      dims: Int,
      k: Int,
      eps: Double = 1e-6
  ): (Seq[Double], Seq[Seq[Double]]) = {
    require(k > 0 && k <= dims, s"k must be in [1, $dims], got $k")
    val xs = space.select(transform(col(vecCol), x => x.cast("double")).as("x"))
    val firstMoments = xs
      .select(posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(
        count(lit(1)).as("c"),
        sum(round(col("xi"), 12).cast("decimal(38,12)")).cast("double").as("s"))
      .collect()
    val n = firstMoments.head.getAs[Long]("c").toDouble
    val mu = new Array[Double](dims)
    firstMoments.foreach(r => mu(r.getAs[Int]("i")) = r.getAs[Double]("s") / n)
    val cells = xs
      .select(posexplode(col("x")).as(Seq("i", "xi")), col("x"))
      .select(
        col("i"),
        posexplode(transform(col("x"), y => col("xi") * y)).as(Seq("j", "v")))
      .groupBy(col("i"), col("j"))
      .agg(sum(round(col("v"), 12).cast("decimal(38,12)")).cast("double").as("s2"))
      .collect()
    val c = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
    cells.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      c(i, j) = r.getAs[Double]("s2") / n - mu(i) * mu(j)
    }
    val es = breeze.linalg.eigSym(c)
    // eigSym returns eigenvalues ascending; take the top k, largest first
    val order = (0 until dims).sortBy(i => -es.eigenvalues(i)).take(k)
    val w = order.map { idx =>
      val scale = 1.0 / math.sqrt(es.eigenvalues(idx) + eps)
      Seq.tabulate(dims)(i => es.eigenvectors(i, idx) * scale)
    }
    (mu.toSeq, w)
  }
}
