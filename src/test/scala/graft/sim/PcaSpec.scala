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

  test("embedding_pca_r recovers both directions of a rank-2 corpus, eigvals ordered") {
    import spark.implicits._
    // vectors = a_k·u + b_k·v with u ⟂ v unit, coefficients zero-mean
    // and uncorrelated (Σ a_k b_k = 0), var(a)=5 > var(b)=1: the
    // centered covariance is exactly 5·uuᵀ + 1·vvᵀ, so deflation must
    // surface u then v with eigvals ≈ 5 and 1
    val u = Array.fill(64)(1.0 / 8.0)
    val v = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 / 8.0 else -1.0 / 8.0)
    val a = Seq(3.0, -3.0, 3.0, -3.0, 1.0, -1.0, 1.0, -1.0)
    val b = Seq(1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0)
    val docs = a.zip(b).zipWithIndex.map { case ((ak, bk), k) =>
      (k.toLong, Array.tabulate(64)(i => (ak * u(i) + bk * v(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = Pca.pcaR(docs, 2).collect()
    assert(rows.length == 2 * Pca.Dim)
    val byComp = rows.groupBy(_.getAs[Int]("component"))
      .map { case (c, rs) =>
        c -> (rs.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading")),
          rs.head.getAs[Double]("eigval"))
      }
    val (l1, e1) = byComp(1)
    val (l2, e2) = byComp(2)
    def absDot(l: Array[Double], d: Array[Double]) =
      math.abs(l.zip(d).map { case (x, y) => x * y }.sum)
    assert(absDot(l1, u) > 1 - 1e-6, s"comp1 vs u: ${absDot(l1, u)}")
    assert(absDot(l2, v) > 1 - 1e-6, s"comp2 vs v: ${absDot(l2, v)}")
    assert(math.abs(e1 - 5.0) < 1e-6 && math.abs(e2 - 1.0) < 1e-6,
      s"eigvals: $e1, $e2")
    assert(e1 > e2)
    // explained shares: 5/6 and 1/6 of the total variance
    val exp = rows.sortBy(r => (r.getAs[Int]("component"), r.getAs[Int]("dim")))
      .map(_.getAs[Double]("explained"))
    assert(math.abs(exp.head - 5.0 / 6.0) < 1e-6)
    assert(math.abs(exp.last - 1.0 / 6.0) < 1e-6)
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
