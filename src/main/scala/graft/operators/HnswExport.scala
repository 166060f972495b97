package graft.operators

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.operators.Pins.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serialize the Spark-built HNSW hierarchy ([[Graph.hnswBuild]]) into
  * hnswlib's `saveIndex` binary layout — the ACTUAL on-disk artifact of
  * the reference's serving index (embeddinghub/embeddingstore/index.h:29
  * holds a `hnswlib::HierarchicalNSW`; its persistence format is the
  * field-for-field POD dump written by `HierarchicalNSW::saveIndex` and
  * read back by `loadIndex` in hnswlib's hnswalg.h — a stable,
  * versionless layout, unchanged across hnswlib 0.6–0.8).
  *
  * This converts the batch build from an analog of the serving index
  * into the serving index: a serving box links hnswlib (or any
  * compatible reader), calls `loadIndex` on this file with the matching
  * dim and space type, and searches — no per-vector re-insertion, no
  * rebuild. The layout below is pinned to hnswlib's `saveIndex` order
  * (all integers little-endian; `size_t` = 8 bytes, `tableint` /
  * `linklistsizeint` = 4 bytes, `labeltype` = 8 bytes):
  *
  * {{{
  * header (96 bytes):
  *   offsetLevel0_        u64 = 0
  *   max_elements_        u64 = n
  *   cur_element_count    u64 = n
  *   size_data_per_element_ u64 = sizeLinksLevel0 + dim*4 + 8
  *   label_offset_        u64 = sizeLinksLevel0 + dim*4
  *   offsetData_          u64 = sizeLinksLevel0  (= maxM0*4 + 4)
  *   maxlevel_            i32
  *   enterpoint_node_     u32 (internal id)
  *   maxM_                u64 = m
  *   maxM0_               u64 = 2m
  *   M_                   u64 = m
  *   mult_                f64 = 1 / ln(m)
  *   ef_construction_     u64 = max(efConstruction, m)
  * data_level0_memory_ (n * size_data_per_element_ bytes), per element:
  *   [link count slot u32: count in the LOW 16 bits (hnswlib get/
  *    setListCount read/write an unsigned short over the slot; high
  *    bytes stay 0 — they double as delete-mark flags, all clear)]
  *   [maxM0 * u32 link targets (internal ids; unused slots 0)]
  *   [dim * f32 vector]
  *   [u64 label (the external key)]
  * then per element i in internal-id order:
  *   u32 linkListSize = level_i == 0 ? 0 : level_i * (maxM*4 + 4)
  *   level_i segments (levels 1..level_i), each:
  *     [count slot u32 as above][maxM * u32 link targets]
  * }}}
  *
  * Correspondence to the Spark build: internal ids are assigned 0..n-1
  * in ascending key order by the distributed prefix-sum numbering
  * ([[FeatureStore.globalRowNumbersWithTotal]] — never a single-task
  * window); per-level link lists are [[Graph.diverseNeighborLists]]
  * (hnswlib's own getNeighborsByHeuristic2 edge rule, order-preserved:
  * the on-disk list order is significant to hnswlib's search loop only
  * as an iteration order, but keeping the heuristic's kept-then-
  * backfilled order makes the artifact reproducible byte for byte);
  * the entry point is the (highest level, smallest key) node — the
  * same entry [[Graph.hnswSearchReplay]] starts from.
  *
  * Scale shape: every corpus-sized step (level draw, candidate search,
  * diverse pruning, label→internal-id mapping, per-node list assembly,
  * global ordering) is a distributed DataFrame job; the driver only
  * STREAMS the final range-sorted rows to disk via `toLocalIterator`
  * (one partition resident at a time) while assembling fixed-size
  * blobs. That driver hop is not a scale compromise — the artifact is
  * by definition the bytes one serving process must hold in RAM, so a
  * per-shard export is bounded by serving-box memory no matter how big
  * the corpus; 100 TB corpora ship as many shard indexes, one export
  * each, built through the IVF-probed candidate source
  * ([[Graph.ivfCandidateSource]] via the `candidates` parameter — the
  * emb_hnsw_export driver query runs that path; the upper-level link
  * section spools to a temp file, so no driver buffer grows with n).
  */
object HnswExport {

  val HeaderBytes = 96

  final case class Summary(
      nElements: Long,
      dim: Int,
      maxLevelUsed: Int,
      entryLabel: Long,
      entryInternal: Int,
      fileBytes: Long,
      edgesPerLevel: Map[Int, Long])

  /** Build the hierarchy over `space` and write it at `path` in
    * hnswlib `saveIndex` layout. `m` is hnswlib's M (per-level degree
    * cap of the heuristic build; level-0 capacity in the file is the
    * standard 2M). Returns the summary the caller gates on.
    *
    * `candidates` is the per-layer candidate source feeding the diverse
    * prune — `(levelFilteredSpace, candK) => (query_id, neighbor_id,
    * rank)`. None (default) runs the exact all-pairs search: the recall
    * oracle, quadratic in the layer. The production path passes
    * [[Graph.ivfCandidateSource]] so NOTHING in the export plan is
    * quadratic in the corpus; at nProbe >= the cell count the probe is
    * exhaustive and the written artifact is BYTE-IDENTICAL to the brute
    * export (HnswExportSpec asserts the file bytes; the emb_hnsw_export
    * driver query runs the IVF-fed path against the from-first-
    * principles oracle).
    */
  def exportIndex(
      space: DataFrame,
      keyCol: String,
      vecCol: String,
      m: Int,
      maxLevel: Int,
      efConstruction: Int,
      path: String,
      candidates: Option[(DataFrame, Int) => DataFrame] = None
  ): Summary = {
    require(m >= 2 && m <= 10000, s"m out of range (hnswlib mult_=1/ln(M) needs M>=2): $m")
    require(efConstruction >= 0, s"efConstruction must be >= 0: $efConstruction")
    val leveled = Graph.hnswLevels(space, keyCol, vecCol, maxLevel)
    // internal ids 0..n-1 in ascending key order — distributed
    // prefix-sum numbering, then pinned: the id map is consumed once
    // per layer by the link mapping joins
    val (numbered0, n) = FeatureStore.globalRowNumbersWithTotal(
      leveled.select(
        col(keyCol).cast("long").as("label"), col(vecCol).as("vec"), col("level")),
      Seq("label"))
    require(n > 0, "cannot export an empty index")
    require(n < (1L << 31), s"tableint (u32 internal id) overflow: $n elements — shard first")
    val numbered = numbered0
      .select(
        col("label"), col("vec"), col("level"),
        (col("row_number") - 1L).cast("int").as("internal"))
      .pinned()
    val idMap = numbered.select(col("label").as("_lbl"), col("internal").as("_int"))
    // per-level ordered link lists, label-space → internal-id space.
    // posexplode/re-collect keeps the heuristic's list order through
    // the mapping join (the join itself is order-destroying).
    val linkFrames = (0 to maxLevel).map { l =>
      val sub = leveled.where(col("level") >= l)
      val lists = candidates match {
        case Some(src) => Graph.diverseFromCandidates(sub, keyCol, vecCol, m, src(sub, 2 * m))
        case None      => Graph.diverseNeighborLists(sub, keyCol, vecCol, m, 2 * m)
      }
      lists
        .select(
          col("query_id").cast("long").as("label"),
          posexplode(col("dsts")).as(Seq("pos", "_dlbl")))
        .join(idMap, col("_dlbl") === col("_lbl"))
        .groupBy(col("label"))
        .agg(
          transform(
            sort_array(collect_list(struct(col("pos"), col("_int")))),
            x => x("_int")).as(s"links$l"))
    }
    val full = linkFrames
      .foldLeft(numbered)((acc, lf) => acc.join(lf, Seq("label"), "left"))
    // entry point: highest level, smallest label — one bounded collect
    // (also yields maxlevel_: the entry's level IS the max by choice)
    val entryRow = numbered
      .orderBy(col("level").desc, col("label"))
      .limit(1)
      .select(col("label"), col("internal"), col("level"))
      .head()
    val (entryLabel, entryInternal, maxLevelUsed) =
      (entryRow.getLong(0), entryRow.getInt(1), entryRow.getLong(2).toInt)

    val maxM = m.toLong
    val maxM0 = 2L * m
    val sizeLinksLevel0 = (maxM0 * 4 + 4).toInt
    val sizeLinksPerElement = (maxM * 4 + 4).toInt

    // stream rows in internal-id order: range partitions in id order +
    // per-partition sort; toLocalIterator walks partitions in order,
    // holding one at a time
    val parts = math.max(1, math.min(256, (n / 65536) + 1)).toInt
    val ordered = full
      .repartitionByRange(parts, col("internal"))
      .sortWithinPartitions(col("internal"))

    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    // the upper-level link section must be written AFTER the whole
    // level-0 block, so spool it to a sibling temp FILE as we stream
    // and concatenate at the end — a single driver heap array would
    // cap at 2 GB (4n + 16·Σlevels bytes can cross it on a large
    // shard even when the n < 2^31 require passes); the spool keeps
    // driver memory flat at the copy-buffer size
    val upperPath = Files.createTempFile(
      Option(Paths.get(path).getParent).getOrElse(Paths.get(".")), ".hnsw_upper", ".tmp")
    val upper = new BufferedOutputStream(new FileOutputStream(upperPath.toFile), 1 << 20)
    try {
      var dim = -1
      var bytes = 0L
      def emit(bb: ByteBuffer): Unit = { out.write(bb.array(), 0, bb.position()); bytes += bb.position() }
      val edgeCounts = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      var expected = 0
      val it = ordered.toLocalIterator()
      val headerBb = ByteBuffer.allocate(HeaderBytes).order(ByteOrder.LITTLE_ENDIAN)
      while (it.hasNext) {
        val r = it.next()
        val label = r.getLong(r.fieldIndex("label"))
        val internal = r.getInt(r.fieldIndex("internal"))
        require(internal == expected,
          s"internal-id stream out of order: got $internal, expected $expected")
        expected += 1
        val level = r.getLong(r.fieldIndex("level")).toInt
        val vec = r.getSeq[Float](r.fieldIndex("vec"))
        if (dim < 0) {
          dim = vec.length
          // header is laid out once dim is known (first element)
          val sizeDataPerElement = sizeLinksLevel0 + dim * 4L + 8
          headerBb.putLong(0L)                         // offsetLevel0_
          headerBb.putLong(n)                          // max_elements_
          headerBb.putLong(n)                          // cur_element_count
          headerBb.putLong(sizeDataPerElement)         // size_data_per_element_
          headerBb.putLong(sizeLinksLevel0 + dim * 4L) // label_offset_
          headerBb.putLong(sizeLinksLevel0.toLong)     // offsetData_
          headerBb.putInt(maxLevelUsed)                // maxlevel_
          headerBb.putInt(entryInternal)               // enterpoint_node_
          headerBb.putLong(maxM)                       // maxM_
          headerBb.putLong(maxM0)                      // maxM0_
          headerBb.putLong(m.toLong)                   // M_
          headerBb.putDouble(1.0 / math.log(m.toDouble)) // mult_
          headerBb.putLong(math.max(efConstruction, m).toLong) // ef_construction_
          emit(headerBb)
        }
        require(vec.length == dim, s"ragged vector at label $label: ${vec.length} != $dim")
        def linksAt(l: Int): Seq[Int] = {
          val idx = r.fieldIndex(s"links$l")
          if (r.isNullAt(idx)) Seq.empty else r.getSeq[Int](idx)
        }
        def putSegment(bb: ByteBuffer, links: Seq[Int], cap: Long, l: Int): Unit = {
          require(links.length <= cap,
            s"level-$l degree ${links.length} exceeds cap $cap at label $label")
          bb.putShort(links.length.toShort).putShort(0.toShort) // count slot, flags clear
          links.foreach { t =>
            require(t >= 0 && t < n, s"link target $t out of [0,$n) at label $label")
            bb.putInt(t)
          }
          (links.length until cap.toInt).foreach(_ => bb.putInt(0))
        }
        val l0 = ByteBuffer
          .allocate(sizeLinksLevel0 + dim * 4 + 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        val links0 = linksAt(0)
        putSegment(l0, links0, maxM0, 0)
        edgeCounts(0) += links0.length
        vec.foreach(l0.putFloat)
        l0.putLong(label)
        emit(l0)
        // upper-level section for this element, buffered
        val sz = if (level == 0) 0 else level * sizeLinksPerElement
        val ub = ByteBuffer.allocate(4 + sz).order(ByteOrder.LITTLE_ENDIAN)
        ub.putInt(sz)
        (1 to level).foreach { l =>
          val ll = linksAt(l)
          putSegment(ub, ll, maxM, l)
          edgeCounts(l) += ll.length
        }
        upper.write(ub.array(), 0, ub.position())
      }
      require(expected.toLong == n, s"streamed $expected elements, numbering said $n")
      upper.close()
      val in = Files.newInputStream(upperPath)
      try {
        val buf = new Array[Byte](1 << 20)
        var read = in.read(buf)
        while (read >= 0) {
          if (read > 0) { out.write(buf, 0, read); bytes += read }
          read = in.read(buf)
        }
      } finally in.close()
      out.flush()
      Summary(n, dim, maxLevelUsed, entryLabel, entryInternal, bytes, edgeCounts.toMap)
    } finally {
      upper.close()
      Files.deleteIfExists(upperPath)
      out.close()
    }
  }

  // ---------------------------------------------------------------- //
  // Independent reader: parses the binary layout back (used by the    //
  // round-trip spec and the driver gate — deliberately written from   //
  // the layout doc above, not by calling the writer's helpers).       //
  // ---------------------------------------------------------------- //

  final case class Header(
      offsetLevel0: Long,
      maxElements: Long,
      curElementCount: Long,
      sizeDataPerElement: Long,
      labelOffset: Long,
      offsetData: Long,
      maxLevel: Int,
      enterPoint: Int,
      maxM: Long,
      maxM0: Long,
      m: Long,
      mult: Double,
      efConstruction: Long)

  /** `links(i)(l)` = element i's link list at level l (0..levels(i)). */
  final case class ParsedIndex(
      header: Header,
      dim: Int,
      labels: Array[Long],
      levels: Array[Int],
      vectors: Array[Array[Float]],
      links: Array[Array[Array[Int]]]) {
    def nElements: Int = labels.length
    def edgesAtLevel(l: Int): Long =
      links.iterator.map(per => if (l < per.length) per(l).length.toLong else 0L).sum
    def nodesAtLevelGte(l: Int): Long = levels.count(_ >= l).toLong
  }

  /** Parse an hnswlib `saveIndex` file. The whole artifact is read into
    * memory — by construction it is serving-RAM-sized (that is what the
    * format is FOR); this reader is the verification half, not a data
    * path.
    */
  def readIndex(path: String): ParsedIndex = {
    val raw = Files.readAllBytes(Paths.get(path))
    require(raw.length >= HeaderBytes, s"file too small for an hnswlib header: ${raw.length}")
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val h = Header(
      offsetLevel0 = bb.getLong(),
      maxElements = bb.getLong(),
      curElementCount = bb.getLong(),
      sizeDataPerElement = bb.getLong(),
      labelOffset = bb.getLong(),
      offsetData = bb.getLong(),
      maxLevel = bb.getInt(),
      enterPoint = bb.getInt(),
      maxM = bb.getLong(),
      maxM0 = bb.getLong(),
      m = bb.getLong(),
      mult = bb.getDouble(),
      efConstruction = bb.getLong())
    val n = h.curElementCount
    require(n >= 0 && n <= Int.MaxValue, s"element count out of range: $n")
    val sizeLinksLevel0 = h.maxM0 * 4 + 4
    require(h.offsetData == sizeLinksLevel0,
      s"offsetData_ ${h.offsetData} != maxM0*4+4 $sizeLinksLevel0 — not an hnswlib layout")
    val dimBytes = h.labelOffset - h.offsetData
    require(dimBytes > 0 && dimBytes % 4 == 0, s"non-integral dim bytes: $dimBytes")
    val dim = (dimBytes / 4).toInt
    require(h.sizeDataPerElement == h.labelOffset + 8,
      s"size_data_per_element_ ${h.sizeDataPerElement} != label_offset_+8 ${h.labelOffset + 8}")
    val nI = n.toInt
    val labels = new Array[Long](nI)
    val levels = new Array[Int](nI)
    val vectors = new Array[Array[Float]](nI)
    val links = new Array[Array[Array[Int]]](nI)
    var i = 0
    while (i < nI) {
      val base = HeaderBytes + i * h.sizeDataPerElement
      bb.position(base.toInt)
      val cnt = bb.getShort() & 0xffff
      bb.getShort() // flag bytes
      require(cnt <= h.maxM0, s"level-0 count $cnt exceeds maxM0 ${h.maxM0} at element $i")
      val l0 = new Array[Int](cnt)
      var j = 0
      while (j < cnt) { l0(j) = bb.getInt(); j += 1 }
      bb.position((base + h.offsetData).toInt)
      val v = new Array[Float](dim)
      j = 0
      while (j < dim) { v(j) = bb.getFloat(); j += 1 }
      labels(i) = bb.getLong()
      vectors(i) = v
      links(i) = Array(l0) // upper levels appended below
      i += 1
    }
    val sizeLinksPerElement = h.maxM * 4 + 4
    bb.position((HeaderBytes + n * h.sizeDataPerElement).toInt)
    i = 0
    while (i < nI) {
      val listSize = bb.getInt()
      require(listSize >= 0 && listSize % sizeLinksPerElement == 0,
        s"link list size $listSize not a multiple of $sizeLinksPerElement at element $i")
      val lvl = (listSize / sizeLinksPerElement).toInt
      levels(i) = lvl
      if (lvl > 0) {
        val per = new Array[Array[Int]](1 + lvl)
        per(0) = links(i)(0)
        var l = 1
        while (l <= lvl) {
          val cnt = bb.getShort() & 0xffff
          bb.getShort()
          require(cnt <= h.maxM, s"level-$l count $cnt exceeds maxM ${h.maxM} at element $i")
          val arr = new Array[Int](cnt)
          var j = 0
          while (j < cnt) { arr(j) = bb.getInt(); j += 1 }
          var skip = cnt
          while (skip < h.maxM) { bb.getInt(); skip += 1 }
          per(l) = arr
          l += 1
        }
        links(i) = per
      }
      i += 1
    }
    require(bb.position() == raw.length,
      s"trailing bytes: parsed ${bb.position()} of ${raw.length}")
    require(h.enterPoint >= 0 && h.enterPoint < nI, s"entry point ${h.enterPoint} out of range")
    require(levels(h.enterPoint) == h.maxLevel,
      s"entry point level ${levels(h.enterPoint)} != maxlevel_ ${h.maxLevel}")
    ParsedIndex(h, dim, labels, levels, vectors, links)
  }
}
