package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source registration — the graft analog of featureform's
  * RegisterPrimaryFromSourceTable / GetPrimaryTable
  * (reference: provider/offline.go:527-536). A "primary table" here is
  * simply a named, schema-validated DataFrame; downstream operators are
  * plain transformations over it, so Catalyst sees one end-to-end plan
  * (filter/column pushdown reaches the parquet scan).
  */
object Tables {

  val TestTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one table of the driver-generated corpus.
    *
    * `events.ts` has been written two ways across corpus generations:
    * parquet TIMESTAMP(NANOS) (which Spark only reads as a raw long via
    * nanosAsLong) and TIMESTAMP(MICROS) (which Spark reads as a real
    * timestamp, TIMESTAMP_NTZ under some writer metadata). We branch on
    * the *loaded* type so both corpora normalize to a plain session-TZ
    * TIMESTAMP: a long is nanos → integer `div 1000` (the value exceeds
    * double precision, so no float math) → timestamp_micros; any
    * timestamp flavor is cast to TimestampType (NTZ→LTZ is a no-op wall
    * clock under the UTC session, so downstream date_trunc/unix_micros
    * semantics are unchanged).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType =>
          df
        case _ =>
          df.withColumn(
            "ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else if (name == "embeddings") {
      // drift guard (the events-ts lesson generalized): a regenerated
      // corpus may write the vector as list<double> or the label as
      // int64 — normalize both to the contract (array<float>, int)
      // so every downstream kernel sees one physical type. The casts
      // are no-ops when the file already matches.
      val df = spark.read.parquet(s"$dir/$name.parquet")
      val withVec = df.schema("embedding").dataType match {
        case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, _) => df
        case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
      }
      if (withVec.schema("label").dataType == org.apache.spark.sql.types.IntegerType)
        withVec
      else withVec.withColumn("label", col("label").cast("int"))
    } else if (name == "documents") {
      // same guard for the documents count column (int32 vs int64)
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("n_chars").dataType == org.apache.spark.sql.types.LongType) df
      else df.withColumn("n_chars", col("n_chars").cast("long"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register a primary table from a parquet/csv/json path.
    * `expectedSchema`, when given, is validated field-by-field (names +
    * types) — featureform's schema check on source registration.
    */
  def registerPrimary(
      spark: SparkSession,
      name: String,
      path: String,
      format: String = "parquet",
      expectedSchema: Option[StructType] = None,
      csvHeader: Boolean = true
  ): DataFrame = {
    val reader = spark.read
    val df = format match {
      case "parquet" => reader.parquet(path)
      case "orc" => reader.orc(path)
      case "csv" =>
        val r = reader.option("header", csvHeader.toString)
        expectedSchema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
      case "json" =>
        expectedSchema.fold(reader)(s => reader.schema(s)).json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    expectedSchema.foreach { expected =>
      val actual = df.schema
      val diff = expected.fields.filterNot { f =>
        actual.fields.exists(a => a.name == f.name && a.dataType == f.dataType)
      }
      require(
        diff.isEmpty,
        s"schema mismatch for $name: missing/mistyped ${diff.map(_.name).mkString(",")}")
    }
    df.createOrReplaceTempView(name)
    df
  }

  /** Partitioned sink (materialization export). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      format: String = "parquet"
  ): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).format(format).save(path)

  /** JDBC source leg — the graft analog of the reference's SQL-warehouse
    * providers (reference: provider/postgres.go:166, snowflake.go,
    * bigquery.go:444 register warehouse tables as primary sources).
    * Reads `table` over `spark.read.jdbc` and registers it as a temp
    * view, schema-validated like [[registerPrimary]].
    *
    * Scale shape: a plain jdbc read is ONE partition (one connection) —
    * fine for dimension tables, wrong for facts. Pass `partitionCol`
    * (+ bounds + numPartitions) and Spark issues numPartitions range-
    * predicated queries in parallel — the standard JDBC parallel-scan
    * contract. Predicate pushdown applies (filters become WHERE
    * clauses on the remote; check PushedFilters in .explain).
    *
    * Driver note: this sandbox carries only the embedded Derby driver
    * (`org.apache.derby.jdbc.EmbeddedDriver`, in-JVM, no server); any
    * server-backed JDBC URL works identically once its driver jar is
    * on the executor classpath.
    */
  def registerJdbc(
      spark: SparkSession,
      name: String,
      url: String,
      table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      partitionCol: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 1L,
      numPartitions: Int = 1,
      expectedSchema: Option[StructType] = None,
      maxSingleConnectionRows: Long = 1000000L
  ): DataFrame = {
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
    // ENFORCED fact-table contract (not just documented): registering
    // without `partitionCol` serializes the whole scan through one
    // connection, which is silently catastrophic for a fact table. A
    // cheap remote COUNT (one aggregate, runs server-side) verifies the
    // table is actually dimension-sized before the single-connection
    // read is allowed; above the threshold the call fails fast with the
    // partitioning recipe. Callers that truly want a huge serial read
    // opt in explicitly with maxSingleConnectionRows = Long.MaxValue.
    //
    // The probe interpolates `table` into a derived-table subquery, so
    // it only runs for PLAIN (optionally schema-qualified, optionally
    // quoted) table identifiers — Spark's dbtable option also accepts
    // full `(SELECT ...) alias` expressions, and wrapping those in
    // another SELECT is dialect-fragile. Subquery registrations skip
    // the probe (the caller already hand-shaped the remote scan).
    val plainIdent =
      "^\\s*(?:[A-Za-z_][A-Za-z0-9_$]*|\"[^\"]+\"|`[^`]+`)" +
        "(?:\\.(?:[A-Za-z_][A-Za-z0-9_$]*|\"[^\"]+\"|`[^`]+`))*\\s*$"
    val probeEligible = table.matches(plainIdent)
    if (partitionCol.isEmpty && maxSingleConnectionRows < Long.MaxValue &&
        !probeEligible)
      // a subquery dbtable skips the row-count guard by design — say so
      // rather than silently bypassing it
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"$name: dbtable is a subquery expression; skipping the " +
          "single-connection row-count guard (caller-shaped remote scan)")
    if (partitionCol.isEmpty && maxSingleConnectionRows < Long.MaxValue &&
        probeEligible) {
      val n = spark.read
        .format("jdbc")
        .option("url", url)
        .option("dbtable", s"(SELECT COUNT(*) AS n FROM $table) c")
        .option("driver", driver)
        .load()
        .selectExpr("CAST(n AS BIGINT) AS n") // COUNT's type varies by dialect
        .head()
        .getLong(0)
      require(
        n <= maxSingleConnectionRows,
        s"$name has $n rows > maxSingleConnectionRows=$maxSingleConnectionRows for a " +
          "single-connection JDBC scan — pass partitionCol (+ lowerBound/upperBound/" +
          "numPartitions) to issue range-predicated parallel reads, or raise the " +
          "threshold explicitly if a serial read is intended.")
    }
    val reader = partitionCol.fold(base) { c =>
      base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    val df = reader.load()
    expectedSchema.foreach { expected =>
      val actual = df.schema
      val diff = expected.fields.filterNot { f =>
        actual.fields.exists(a =>
          a.name.equalsIgnoreCase(f.name) && a.dataType == f.dataType)
      }
      require(
        diff.isEmpty,
        s"schema mismatch for $name: missing/mistyped ${diff.map(_.name).mkString(",")}")
    }
    df.createOrReplaceTempView(name)
    df
  }

  /** JDBC sink (materialization export to a warehouse — the write half
    * of the reference's warehouse providers). `overwrite = true` drops
    * and recreates the remote table.
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      overwrite: Boolean = true
  ): Unit =
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .mode(if (overwrite) "overwrite" else "append")
      .save()

  /** Bucketed catalog table: hash-bucket + sort by the join key at
    * write time so repeated joins/aggregations on that key need NO
    * exchange — the pre-shuffled layout every warehouse keeps for its
    * fact tables. This is the 100 TB lever for the feature store's
    * recurring entity joins (label ⨝ features every training-set build):
    * pay the shuffle once at ingest, never per query. Requires
    * `saveAsTable` (bucket metadata lives in the catalog).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int
  ): Unit = {
    // Unqualified names only: the manual stale-location cleanup below
    // assumes the default database's <warehouse>/<table> layout; a
    // `db.tbl` name would both mis-backtick in DROP TABLE and live at
    // <warehouse>/<db>.db/<table>, so the cleanup would target the
    // wrong path.
    require(
      !table.contains('.'),
      s"writeBucketed requires an unqualified table name, got '$table'")
    val spark = df.sparkSession
    // The catalog is per-session but the warehouse directory persists:
    // a fresh session neither knows the table (so overwrite doesn't
    // engage) nor may create over the leftover location. Drop both.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/${table.toLowerCase}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Streaming-source spec for [[registerStream]] — the seam where the
    * deployment chooses its transport while every downstream transform
    * (graft.streaming.StreamingFeatures) stays identical.
    */
  sealed trait StreamSource
  object StreamSource {

    /** Directory-watching file stream (json/csv/parquet) — the in-env
      * implementation; also the replay path for reprocessing a day of
      * landed files with the same query as the live stream.
      */
    final case class Files(path: String, format: String, schema: StructType)
        extends StreamSource

    /** Kafka topic — the reference's streaming transport
      * (provider/spark/configs.go accepts Kafka sources; its streamer
      * service reads commit streams). The reader below is the standard
      * spark-sql-kafka contract (key/value binary + topic/partition/
      * offset/timestamp columns); it needs the
      * `org.apache.spark:spark-sql-kafka-0-10` jar on the classpath,
      * which this zero-egress sandbox does not ship — so in-env this
      * case fails at source resolution (spec-asserted), and on a real
      * deployment it is the documented one-line swap from Files.
      */
    final case class Kafka(
        bootstrapServers: String,
        topic: String,
        startingOffsets: String = "earliest")
        extends StreamSource
  }

  /** Open a streaming DataFrame for `source` and register it as a temp
    * view — the streaming twin of [[registerPrimary]]. Downstream:
    * watermark + transform (StreamingFeatures) + writeStream, unchanged
    * whichever transport the spec picks.
    */
  def registerStream(
      spark: SparkSession,
      name: String,
      source: StreamSource
  ): DataFrame = {
    val df = source match {
      case StreamSource.Files(path, format, schema) =>
        spark.readStream.schema(schema).format(format).load(path)
      case StreamSource.Kafka(bootstrap, topic, offsets) =>
        spark.readStream
          .format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("subscribe", topic)
          .option("startingOffsets", offsets)
          .load()
    }
    df.createOrReplaceTempView(name)
    df
  }
}
