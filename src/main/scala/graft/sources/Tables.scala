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
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as epoch-nanos
    * long and is converted here to a microsecond timestamp (Spark's
    * native resolution). `ts_ns` keeps the raw value.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      raw.withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else
      // without the nanosAsLong legacy read (e.g. a library user's own
      // session) parquet nanos arrive truncated to a µs timestamp —
      // synthesize ts_ns so operators referencing it (sessionize,
      // as-of join) still resolve
      raw.withColumn("ts_ns",
        org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

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
