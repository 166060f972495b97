package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Spark-first equivalents of the reference's engine bootstrap
  * (featureform provider/spark_* + embeddinghub server startup): one
  * SparkSession with AQE enabled so joins/aggs re-plan at runtime
  * (broadcast promotion, skew-split), and a shuffle-partition count
  * sized for the deployment rather than Spark's default 200.
  *
  * At cluster scale the same builder is used with `master` unset (taken
  * from spark-submit) and `shufflePartitions` sized to ~2-3x total
  * cores with partitions targeting 128-256MB post-shuffle.
  */
object GraftSession {

  def builder(
      master: Option[String] = None,
      shufflePartitions: Int = 32
  ): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE only ever COALESCES from the initial shuffle count — it
      // never splits an oversized partition (outside skew-join). With
      // a static 32, a 1B-row intermediate (4th-decade containment
      // candidates) shuffles into 31M-row partitions and spills. Start
      // high and let AQE merge back to the advisory size: small
      // queries still run few tasks, huge intermediates get real
      // parallelism. Same contract as the cluster preset's "err high".
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // 100TB note: parquet scans split at this size; 128MB default is
      // right for the cluster, harmless locally.
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      // Runtime filters: when a join's build side is selective, inject
      // a bloom filter on the probe side BEFORE its shuffle/scan — the
      // DPP-class lever that turns "shuffle the 100TB fact table, then
      // join" into "scan-filter it down first". Spark ships the
      // machinery (InjectRuntimeFilter); it just defaults off.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // The generated-class cache defaults to 100 entries; a session
      // running the full graft query surface compiles several hundred
      // codegen units, and evictions re-Janino-compile hot stages at
      // random (measured as multi-second spikes on otherwise-warm
      // queries). Static conf — must be set before session creation.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Catalog-table location (bucketed tables) must not depend on the
      // launcher's cwd; on a cluster this is the real warehouse path.
      .config(
        "spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
    master.fold(b)(b.master)
  }

  /** Local session for tests / bench on this container, with graft's
    * native expressions pre-registered.
    */
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val s = builder(Some(s"local[$cores]"), shufflePartitions).getOrCreate()
    graft.plans.GraftFunctions.register(s)
    s
  }

  /** Cluster deployment preset — the builder a spark-submit driver
    * calls (master/executors come from the submit args). Sizes the
    * shuffle for the fleet and wires the two durability switches the
    * iterative operators need on real hardware:
    *
    *  - `shufflePartitions` ≈ 2-3× total executor cores (AQE coalesces
    *    small ones back down, so err high);
    *  - `checkpointDir` (HDFS/S3) backs `sparkContext.setCheckpointDir`
    *    — pass `durable = true` to Dedup.connectedComponents /
    *    buildIvfPq so their per-round pins survive executor loss;
    *  - `warehouseDir` is the catalog root for Tables.writeBucketed's
    *    shuffle-free recurring-join tables;
    *  - graft's native expressions are registered on create (the
    *    spark.sql.extensions=graft.GraftExtensions config route works
    *    too and needs no code on the driver path).
    */
  def cluster(
      totalCores: Int,
      checkpointDir: String,
      warehouseDir: String
  ): SparkSession = {
    require(totalCores >= 1, "totalCores must be >= 1")
    val s = builder(None, shufflePartitions = totalCores * 3)
      .config("spark.sql.warehouse.dir", warehouseDir)
      .getOrCreate()
    s.sparkContext.setCheckpointDir(checkpointDir)
    graft.plans.GraftFunctions.register(s)
    s
  }
}
