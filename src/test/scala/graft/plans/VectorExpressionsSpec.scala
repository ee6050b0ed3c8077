package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  test("codegen DotF32 matches a local left-fold dot product") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f), Array(-2.0f, 4.0f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val got = df.select(VectorExpressions.dotF32(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    def ref(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    assert(got(0) == ref(Array(1, 2, 3), Array(4, 5, 6)))
    assert(got(1) == ref(Array(0.5f, -0.25f), Array(-2, 4)))
    assert(got(2) == 0.0)
  }

  test("HoltGridFit is null for short series and series with null elements") {
    import spark.implicits._
    val grid = graft.forecast.Forecast.GridValues
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0)), // null slot → null fit
      (3L, Seq[java.lang.Double](5.0)))            // too short → null fit
      .toDF("id", "vs")
    // codegen path
    val got = df.select(col("id"),
        VectorExpressions.holtGridFit(col("vs"), grid).as("fit"))
      .orderBy("id").collect()
    assert(got(0).get(1) != null)
    assert(got(1).get(1) == null)
    assert(got(2).get(1) == null)
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = Literal.create(Seq[java.lang.Double](1.0, null, 3.0),
      ArrayType(DoubleType, containsNull = true))
    assert(HoltGridFit(lit, grid).eval(null) == null)
    val ok = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType, false))
    assert(HoltGridFit(ok, grid).eval(null) != null)
  }

  test("SimHashVote matches the per-bit HOF vote, including ties and empty") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty[Long],                       // empty → 0
      Seq(0xFFFFFFFFL),                      // all bits set
      Seq(1L, 1L, 0L),                       // majority on bit 0
      Seq(1L, 0L),                           // exact tie → unset
      Seq(0x80000000L, 0x80000000L, 0L)      // top bit majority
    ) ++ (1 to 10).map(_ =>
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() & 0xFFFFFFFFL))
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
      .toDF("id", "hs")
    val got = df.select(col("id"),
        VectorExpressions.simHashVote(col("hs")).as("s"))
      .orderBy("id").collect().map(_.getLong(1))
    val hof = df.select(col("id"), expr(
        """aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) ->
          |  acc + IF(2 * size(filter(hs, h -> (shiftright(h, b) & 1) = 1)) > size(hs),
          |           shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin)
        .as("s"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(got.toSeq == hof.toSeq)
    assert(got(0) == 0L)
    assert(got(3) == 0L) // tie does not set the bit
  }

  test("DotF32 agrees with the decimal dot within quantization error") {
    val emb = graft.sources.Tables.embeddings(spark, sf).limit(50)
      .select(col("embedding").as("x"), col("embedding").as("y"))
    val rows = emb.select(
      VectorExpressions.dotF32(col("x"), col("y")).as("fast"),
      graft.sim.Vectors.dot("x", "y").as("exact")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }
}
