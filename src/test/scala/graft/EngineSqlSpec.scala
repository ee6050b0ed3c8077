package graft

class EngineSqlSpec extends SparkSpec {

  test("dot_f32 is callable from SQL via the registered function") {
    val r = spark.sql(
      "SELECT dot_f32(array(cast(1 as float), cast(2 as float)), " +
        "array(cast(3 as float), cast(4 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
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
