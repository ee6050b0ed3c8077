package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("embedding_pca: unit loading, positive bounded explained share") {
    val rows = Pca.pca1(emb).collect()
    assert(rows.length == Pca.Dim)
    assert(rows.map(_.getAs[Int]("dim")).toSeq == (0 until Pca.Dim))
    val loadings = rows.map(_.getAs[Double]("loading"))
    // 64 decimal(24,12)-quantized terms → up to ~3e-9 norm slack
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-8)
    val eig = rows.map(_.getAs[Double]("eigval")).distinct
    val exp = rows.map(_.getAs[Double]("explained")).distinct
    assert(eig.length == 1 && exp.length == 1)
    assert(eig.head > 0.0)
    assert(exp.head > 0.0 && exp.head <= 1.0 + 1e-12)
  }

  test("embedding_pca recovers the direction of a rank-1 corpus") {
    import spark.implicits._
    // vectors = t_k * d for a fixed unit direction d: the centered
    // covariance is var(t) * d dᵀ (rank one), so the top component
    // must align with d and explain all the variance
    val raw = Array.tabulate(64)(i => (if (i % 3 == 0) 2.0 else 1.0)
      * (if (i % 2 == 0) 1 else -1))
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    val d = raw.map(x => (x / nrm).toFloat)
    val docs = (1 to 12).map(t =>
      (t.toLong, d.map(x => x * t))).toDF("vec_id", "embedding")
    val rows = Pca.pca1(docs).collect().sortBy(_.getAs[Int]("dim"))
    val load = rows.map(_.getAs[Double]("loading"))
    val dot = load.zip(d).map { case (a, b) => a * b.toDouble }.sum
    assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
      s"|cos(loading, d)| = ${math.abs(dot)}")
    assert(math.abs(rows.head.getAs[Double]("explained") - 1.0) < 1e-6)
  }

  test("embedding_pca degrades on empty and zero-variance corpora") {
    import spark.implicits._
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Pca.pca1(none).isEmpty)
    // all vectors identical → C = 0 → null loadings, NOT an ANSI
    // divide-by-zero crash (the nullif guard)
    val const = (1L to 5L).map(k => (k, Array.fill(64)(1.5f)))
      .toDF("vec_id", "embedding")
    val rows = Pca.pca1(const).collect()
    assert(rows.length == Pca.Dim)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("loading")))
      assert(r.isNullAt(r.fieldIndex("explained")))
    }
  }
}
