package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the benchmark tables (TPC-H-ish star schema plus
  * `events`, `documents`, `embeddings`).
  *
  * Column pruning and predicate pushdown happen automatically because
  * callers compose `select`/`filter` on the returned DataFrame before
  * any action — the parquet scan only reads what the final plan needs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One reader per (session, dir, table): `spark.read.parquet` lists
  // files and reads footers eagerly, so re-creating the frame per
  // query repays that fixed cost dozens of times per session. Reusing
  // the DataFrame (an immutable plan) is what any caller would do by
  // hand; the cached file listing means a mid-session change to the
  // underlying directory isn't visible — the semantics of one
  // consistent snapshot per session, which is what a benchmark (and
  // most batch jobs) want. Entries die with their session.
  private val readers =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    readers.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    readers.getOrElseUpdate((spark, sfDir, name),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts arrives in one of three parquet flavors depending on
    * the writer and session conf, and is normalized here to a UTC
    * TIMESTAMP plus a raw epoch-nanos `ts_ns` long:
    *   - TIMESTAMP(NANOS) under `spark.sql.legacy.parquet.nanosAsLong`
    *     → epoch-nanos long, converted to a µs timestamp;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true) → TimestampType,
    *     ts_ns synthesized from unix_micros;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) — the pandas/pyarrow
    *     default — → TimestampNTZType, cast to TimestampType first
    *     (identity on the stored micros under the UTC session) because
    *     `unix_micros` and the time-window operators require TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // interpret the wall-clock fields AS-IF-UTC explicitly
        // (make_timestamp with a literal zone) — a plain cast to
        // TIMESTAMP goes through spark.sql.session.timeZone, so a
        // library user embedding this reader in a non-UTC session
        // would get wall-clock-shifted instants; field extraction on
        // NTZ is zone-free, so this is deterministic in any session
        raw.withColumn("ts", expr(
            "make_timestamp(year(ts), month(ts), day(ts), hour(ts), " +
              "minute(ts), extract(SECOND FROM ts), 'UTC')"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case _ =>
        // TIMESTAMP(MICROS/MILLIS, UTC-adjusted): parquet nanos are
        // already truncated to µs — synthesize ts_ns so operators
        // referencing it (sessionize, as-of join) still resolve
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** embeddings.embedding is normalized to `array<float>` — the type
    * the codegen'd vector expressions (DotF32 et al.) read with
    * `getFloat`. A writer that emits float64 lists (the numpy/pandas
    * default unless the column is explicitly float32) would otherwise
    * feed doubles to float-typed accessors — the same writer-drift
    * class that broke the events reader in round 8, guarded at the
    * same place: the reader normalizes once, every operator inherits.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => raw
      case _: org.apache.spark.sql.types.ArrayType =>
        raw.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding must be an array column, got $other")
    }
  }

  /** CSV ingest with an EXPLICIT schema (never inference — a schema
    * scan over 100 TB of CSV is a full extra pass) and a selectable
    * malformed-row policy: PERMISSIVE nulls bad fields into
    * `_corrupt_record`, DROPMALFORMED discards, FAILFAST aborts —
    * the three contracts a production loader chooses between.
    */
  def fromCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("mode", mode)
      .csv(path)

  /** JSON-lines ingest, same explicit-schema + mode contract. */
  def fromJsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** JSON-stat DIRECTORY ingest (reference etl/main.py:75-96: the
    * multi-dataset fetch loop, one raw JSON-stat payload per
    * dataset): each file is ONE document — a JSON-stat cube is a
    * single JSON object, so this reads `wholetext` (one row per
    * file, split-parallel across files), tags it with its source
    * file, and the result feeds [[graft.etl.JsonStat.flatten]]
    * directly. Acquisition (the HTTP pull) lands payloads in the
    * directory; everything after the landing zone is engine scope.
    */
  def fromJsonStatDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("src_file"),
        org.apache.spark.sql.functions.col("value").as("json"))

  /** JDBC READ face (the ingest mirror of `Clean.loadJdbc` — the
    * reference's dashboard layer reads its observations straight from
    * Postgres, app/streamlit_app.py): a PARTITIONED read, one
    * connection per stride of `partitionCol` — a single-connection
    * JDBC scan caps a 1000-executor cluster at one task, so the
    * bounds/stride contract is mandatory, not optional. Predicates on
    * the partition column prune whole strides; other filters push to
    * the database via JDBC pushdown.
    */
  def fromJdbc(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper,
      numPartitions, props)
}
