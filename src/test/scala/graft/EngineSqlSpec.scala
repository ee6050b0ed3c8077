package graft

class EngineSqlSpec extends SparkSpec {

  test("dot_f32 is callable from SQL via the registered function") {
    val r = spark.sql(
      "SELECT dot_f32(array(cast(1 as float), cast(2 as float)), " +
        "array(cast(3 as float), cast(4 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("minhash_sig from SQL matches the Column-API signature") {
    import graft.dedup.Dedup
    val sqlRow = spark.sql(
      s"SELECT minhash_sig(array(7L, 42L, 1000L), ${Dedup.NumHashes}, ${Dedup.P}) AS sig")
      .collect()(0).getSeq[Long](0)
    val colRow = spark.range(1).select(
      graft.plans.VectorExpressions.minhashSig(
        org.apache.spark.sql.functions.expr("array(7L, 42L, 1000L)"),
        Dedup.NumHashes, Dedup.P).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(sqlRow == colRow)
    assert(sqlRow.length == Dedup.NumHashes)
  }

  test("minhash_sig rejects a non-literal hash count") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), cast(id as int), 97) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("holt_grid_fit from SQL matches the Column-API fit") {
    import graft.forecast.Forecast
    val grid = Forecast.GridValues.mkString("array(", ", ", ")")
    val series = "array(1.0d, 2.0d, 4.0d, 7.0d, 11.0d)"
    val sqlRow = spark.sql(s"SELECT holt_grid_fit($series, $grid) AS fit")
      .collect()(0).getStruct(0)
    val colRow = spark.range(1).select(
      graft.plans.VectorExpressions.holtGridFit(
        org.apache.spark.sql.functions.expr(series), Forecast.GridValues).as("fit"))
      .collect()(0).getStruct(0)
    assert(sqlRow == colRow)
    assert(sqlRow.getAs[Double]("alpha") > 0.0)
  }

  test("collect_topk from SQL keeps the k largest per group") {
    val rows = spark.sql(
      """SELECT g, sort_array(collect_topk(struct(v, id), 3, true), false) AS top
        |FROM VALUES (0, 1L, 10.0d), (0, 2L, 30.0d), (0, 3L, 20.0d),
        |            (0, 4L, 40.0d), (1, 5L, 5.0d)
        |  AS t(g, id, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g0 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g0.map(_.getDouble(0)) == Seq(40.0, 30.0, 20.0))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(0))
      == Seq(5.0))
  }

  test("cube_agg covers all four grouping-set combinations") {
    val rows = graft.relational.Relational.cubeAgg(spark, sf).collect()
    val statuses = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val priorities = rows.count(r => r.isNullAt(0) && !r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand == 1)
    assert(statuses >= 1 && priorities >= 1)
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
      .head.getAs[Long]("n_orders")
    assert(total == graft.sources.Tables.orders(spark, sf).count())
  }
}
