package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Non-parquet ingest faces: a user migrating from the reference
  * brings CSV / JSON-lines data; these prove round-trip fidelity and
  * the malformed-row contracts.
  */
class SourceFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n", IntegerType)))

  test("csv round-trip is value-identical under an explicit schema") {
    val dir = "/tmp/graft_src_csv"
    val base = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("n"))
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.fromCsv(spark, dir, schema)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val a = base.orderBy("doc_id").collect().map(_.toSeq.toList).toList
    val b = back.orderBy("doc_id").collect().map(_.toSeq.toList).toList
    assert(a == b)
  }

  test("json-lines round-trip is value-identical") {
    val dir = "/tmp/graft_src_json"
    val base = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("n"))
    base.write.mode("overwrite").json(dir)
    val back = Tables.fromJsonLines(spark, dir, schema)
    val a = base.orderBy("doc_id").collect().map(_.toSeq.toList).toList
    val b = back.orderBy("doc_id").collect().map(_.toSeq.toList).toList
    assert(a == b)
  }

  test("orc round-trip preserves values, schema, and binary columns") {
    val dir = "/tmp/graft_src_orc"
    // include a binary column — the multimodal payload path must
    // survive a columnar format other than parquet
    val base = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
    base.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      base.schema.map(f => (f.name, f.dataType)))
    val a = base.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toList
    val b = back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toList
    assert(a == b)
    // predicate pushdown reaches the ORC scan too
    val plan = back.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"))
  }

  test("json-stat directory ingest: one doc per file, flattens to observations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonstat")
    // the fixed Eurostat-shaped doc (10 sparse values) + a second
    // tiny 1×2 cube — the reference's multi-dataset fetch-loop shape
    val doc2 =
      """{"id": ["ind", "geo"], "size": [1, 2],
        | "dimension": {
        |   "ind": {"category": {"index": {"X": 0}, "label": {"X": "X ind"}}},
        |   "geo": {"category": {"index": {"AT": 0, "BE": 1},
        |     "label": {"AT": "Austria", "BE": "Belgium"}}}},
        | "value": {"0": 1.5, "1": 2.5}}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("nrg_bal.json"),
      graft.etl.JsonStat.sampleDoc)
    java.nio.file.Files.writeString(dir.resolve("second.json"), doc2)
    val docs = Tables.fromJsonStatDocs(spark, dir.toString)
    assert(docs.columns.toSeq == Seq("src_file", "json"))
    assert(docs.count() == 2)
    val flat = graft.etl.JsonStat.flatten(docs, "json").collect()
    assert(flat.length == 12) // 10 sparse + 2
    // unravel check across docs: sampleDoc flat idx 6 → (FC_E, DE, 2020)
    val m6 = flat.find(_.getAs[Double]("value") == 106.0).get
      .getAs[Map[String, String]]("code_map")
    assert(m6 == Map("nrg_bal" -> "FC_E", "geo" -> "DE", "time" -> "2020"))
    val at = flat.find(_.getAs[Double]("value") == 1.5).get
    assert(at.getAs[Map[String, String]]("code_map") ==
      Map("ind" -> "X", "geo" -> "AT"))
    assert(at.getAs[Map[String, String]]("label_map")("geo") == "Austria")
  }

  test("json-stat fetch seam: disk binding round-trips the A2 flatten") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fetchseam")
    val doc2 =
      """{"id": ["ind", "geo"], "size": [1, 2],
        | "dimension": {
        |   "ind": {"category": {"index": {"X": 0}, "label": {"X": "X ind"}}},
        |   "geo": {"category": {"index": {"AT": 0, "BE": 1},
        |     "label": {"AT": "Austria", "BE": "Belgium"}}}},
        | "value": {"0": 1.5, "1": 2.5}}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("nrg_cb_e.json"),
      graft.etl.JsonStat.sampleDoc)
    java.nio.file.Files.writeString(dir.resolve("ten00124.json"), doc2)
    // the reference's DATASETS dict shape (etl/main.py:53-65), urls
    // bound to landed payloads
    val fetched = new DiskJsonStatFetcher().fetch(spark, Map(
      "nrg_cb_e" -> dir.resolve("nrg_cb_e.json").toString,
      "ten00124" -> dir.resolve("ten00124.json").toString))
    assert(fetched.columns.toSeq == Seq("dataset_code", "json"))
    assert(fetched.select("dataset_code").orderBy("dataset_code")
      .collect().map(_.getString(0)).toSeq ==
      Seq("nrg_cb_e", "ten00124"))
    // round-trips A2: the seam's rows flatten to the SAME observations
    // as the landing-zone directory route
    def obs(df: org.apache.spark.sql.DataFrame)
        : Seq[(Double, Map[String, String])] =
      graft.etl.JsonStat.flatten(df, "json").collect()
        .map(r => (r.getAs[Double]("value"),
          r.getAs[Map[String, String]]("code_map")))
        .toSeq.sortBy(_._1)
    assert(obs(fetched) == obs(Tables.fromJsonStatDocs(spark, dir.toString)))
  }

  test("json-stat fetch seam: HTTP binding round-trips via loopback") {
    // an in-process loopback server stands in for the Eurostat
    // dissemination API (this environment has no egress; the binding
    // itself is the real java.net.http GET the deployment runs)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(body: String, status: Int = 200)
        : com.sun.net.httpserver.HttpHandler =
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, b.length.toLong)
        ex.getResponseBody.write(b)
        ex.close()
      }
    server.createContext("/data/nrg_cb_e",
      handler(graft.etl.JsonStat.sampleDoc))
    server.createContext("/missing", handler("gone", 404))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetched = new HttpJsonStatFetcher().fetch(spark,
        Map("nrg_cb_e" -> s"$base/data/nrg_cb_e"))
      assert(fetched.columns.toSeq == Seq("dataset_code", "json"))
      val rows = fetched.collect()
      assert(rows.length == 1 && rows(0).getString(0) == "nrg_cb_e")
      // the pulled payload flattens identically to the disk route
      val viaHttp = graft.etl.JsonStat.flatten(fetched, "json")
        .orderBy("value").collect().map(_.getAs[Double]("value")).toSeq
      val dir = java.nio.file.Files.createTempDirectory("graft_httpseam")
      java.nio.file.Files.writeString(dir.resolve("nrg_cb_e.json"),
        graft.etl.JsonStat.sampleDoc)
      val viaDisk = graft.etl.JsonStat.flatten(
        new DiskJsonStatFetcher().fetch(spark,
          Map("nrg_cb_e" -> dir.resolve("nrg_cb_e.json").toString)), "json")
        .orderBy("value").collect().map(_.getAs[Double]("value")).toSeq
      assert(viaHttp == viaDisk)
      // a non-200 fails the pull loudly, never lands a partial batch
      val err = intercept[IllegalArgumentException] {
        new HttpJsonStatFetcher().fetch(spark,
          Map("bad" -> s"$base/missing"))
      }
      assert(err.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("json-stat fetch seam: empty DATASETS map yields an empty frame") {
    // a bare .reduce over zero per-dataset frames throws; the seam's
    // contract is the (dataset_code, json) schema at any map size
    val fetched = new DiskJsonStatFetcher().fetch(spark, Map.empty)
    assert(fetched.columns.toSeq == Seq("dataset_code", "json"))
    assert(fetched.count() == 0L)
  }

  test("malformed csv rows: dropped under DROPMALFORMED, fatal under FAILFAST") {
    val dir = "/tmp/graft_src_bad"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // structurally malformed (wrong column count): Spark's CSV parser
    // nulls un-castable VALUES without flagging the row, so only a
    // structural mismatch exercises the malformed-row modes
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "doc_id,lang,n\n1,en,5\nbadrow\n2,fr,7\n".getBytes("UTF-8"))
    val dropped = Tables.fromCsv(spark, dir, schema, "DROPMALFORMED")
    // collect, not count: a count() prunes every column, so the CSV
    // parser never converts values and cannot detect malformed rows
    assert(dropped.collect().length == 2)
    val failing = Tables.fromCsv(spark, dir, schema, "FAILFAST")
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }
}
