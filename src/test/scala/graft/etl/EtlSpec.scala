package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EtlSpec extends SparkSpec {

  test("jsonstat flatten reproduces the reference unravel semantics") {
    val rows = EtlQueries.etlJsonstat(spark, sf).collect()
    assert(rows.length == 10) // 12 cells, 2 sparse holes
    val de2020 = rows.find(r =>
      r.getAs[String]("indicator") == "GEP" && r.getAs[String]("geo") == "DE"
        && r.getAs[String]("time") == "2020").get
    assert(de2020.getAs[Double]("value") == 100.0)
    assert(de2020.getAs[String]("country_name") == "Germany")
    // hole at flat index 5 (GEP, IT, 2021) must be absent
    assert(!rows.exists(r => r.getAs[String]("indicator") == "GEP"
      && r.getAs[String]("geo") == "IT" && r.getAs[String]("time") == "2021"))
  }

  test("unravel coordinates invert to the flat index") {
    val r = EtlQueries.etlUnravel(spark, sf).limit(100).collect()
    r.foreach { row =>
      val id = row.getAs[Long]("event_id")
      val (d0, d1, d2) = (row.getAs[Long]("dim0"), row.getAs[Long]("dim1"),
        row.getAs[Long]("dim2"))
      assert((d0 * 1000 + d1 * 50 + d2) == id % 5000)
    }
  }

  test("dedup removes duplicates; dropna removes synthesized nulls") {
    val dd = EtlQueries.etlDedup(spark, sf)
    assert(dd.count() == dd.dropDuplicates().count())
    val li = graft.sources.Tables.lineitem(spark, sf)
    val zeros = li.filter(col("l_discount") === 0.0).count()
    val kept = EtlQueries.etlDropna(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(kept == li.count() - zeros)
  }

  test("load modes: overwrite resets, append accumulates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_spec").toString + "/t"
    val df = graft.sources.Tables.region(spark, sf)
    Clean.load(df, tmp, "full-refresh")
    Clean.load(df, tmp, "append")
    assert(spark.read.parquet(tmp).count() == 2 * df.count())
    Clean.load(df, tmp, "truncate")
    assert(spark.read.parquet(tmp).count() == df.count())
    intercept[IllegalArgumentException](Clean.load(df, tmp, "bogus"))
  }

  test("jdbc sink: append / truncate / full-refresh against embedded Derby") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    def readBack() = spark.read.jdbc(url, "obs", props)
    val df1 = Seq((1L, "DE", 100.0), (2L, "FR", 101.0))
      .toDF("id", "geo", "value")
    Clean.loadJdbc(df1, url, "obs", "full-refresh", props)
    assert(readBack().count() == 2)
    Clean.loadJdbc(df1, url, "obs", "append", props)
    assert(readBack().count() == 4)
    Clean.loadJdbc(df1, url, "obs", "truncate", props)
    assert(readBack().count() == 2) // rows replaced, table kept
    // full-refresh drops + recreates from the NEW frame's schema
    val df2 = Seq((9L, "IT")).toDF("id", "geo")
    Clean.loadJdbc(df2, url, "obs", "full-refresh", props)
    assert(readBack().columns.map(_.toLowerCase).toSeq == Seq("id", "geo"))
    assert(readBack().count() == 1)
    intercept[IllegalArgumentException](
      Clean.loadJdbc(df1, url, "obs", "bogus", props))
  }

  test("jdbc read face: partitioned scan round-trips the sink's rows") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftjdbcread;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = (0L until 100L).map(i => (i, s"g$i", i * 1.5))
      .toDF("id", "geo", "value")
    Clean.loadJdbc(df, url, "obs", "full-refresh", props)
    val back = graft.sources.Tables.fromJdbc(
      spark, url, "obs", "id", 0L, 100L, 4, props)
    // one JDBC connection per stride, not one task total
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    val vals = back.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("value"))).toMap
    assert(vals(7L) == 10.5)
    // partition-column predicates prune; non-partition filters push
    assert(back.filter(col("id") < 10).count() == 10)
  }

  test("etl_scd2: changed keys close + reopen, unchanged pass through") {
    val rows = EtlQueries.etlScd2(spark, sf).collect()
    val dim = graft.sources.Tables.customer(spark, sf).count()
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    assert(byKey.keySet.size.toLong == dim)
    var changed = 0
    byKey.values.foreach { vs =>
      // exactly one current row per key, always open-ended
      val current = vs.filter(_.getAs[Boolean]("is_current"))
      assert(current.length == 1)
      assert(current.head.isNullAt(current.head.fieldIndex("valid_to")))
      if (vs.length == 2) {
        changed += 1
        val closed = vs.filter(!_.getAs[Boolean]("is_current")).head
        // the closed row's end date is the new row's start date
        assert(closed.getAs[String]("valid_to") ==
          current.head.getAs[String]("valid_from"))
        assert(current.head.getAs[String]("segment").startsWith("SEG-"))
      } else {
        assert(vs.length == 1)
        assert(!vs.head.getAs[String]("segment").startsWith("SEG-"))
      }
    }
    // the md5 coin selects roughly 10% of keys
    assert(changed > dim * 0.03 && changed < dim * 0.25)
  }

  test("observations panel is unique per (geo, indicator, year)") {
    val o = Observations.build(spark, sf)
    assert(o.count() == o.select("geo", "indicator", "year").distinct().count())
    assert(o.filter(col("value") <= 0).count() == 0)
  }

  test("etl_incremental_agg merge equals the one-pass full aggregate") {
    import graft.Fp
    val merged = EtlQueries.etlIncrementalAgg(spark, sf).collect()
    val full = graft.sources.Tables.orders(spark, sf)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("o_orderpriority", "yr")
      .agg(Fp.dsum2(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(27,6)")).cast("double")
          / count(lit(1))).as("avg_price"))
      .orderBy("o_orderpriority", "yr")
      .select("o_orderpriority", "yr", "sum_price", "n_orders", "avg_price")
      .collect()
    assert(merged.map(_.toString).toSeq == full.map(_.toString).toSeq,
      "partial-aggregate merge must reproduce the full recompute exactly")
  }
}
