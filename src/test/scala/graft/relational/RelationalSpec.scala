package graft.relational

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q1_agg groups by (returnflag, linestatus) with positive sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q3_join returns at most 10 rows sorted by revenue desc") {
    val rows = Relational.q3Join(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("semi + anti join partition the customer table consistently") {
    val total = graft.sources.Tables.customer(spark, sf).count()
    val anti = Relational.qAntiJoin(spark, sf).count()
    val semiUrgent = Relational.qSemiJoin(spark, sf).count()
    assert(anti + semiUrgent == total)
  }

  test("q_window_rank yields at most 3 rows per priority, ranks 1..3") {
    val rows = Relational.qWindowRank(spark, sf).collect()
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byPrio.values.foreach { grp =>
      assert(grp.length <= 3)
      assert(grp.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to grp.length))
    }
  }

  test("rollup_agg grand total equals lineitem row count") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n_rows") ==
      graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("q_approx distinct counts within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = Relational.qApprox(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("approx_orders")).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("d")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.05)
    }
  }
}
