package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.Dedup

/** Property-based ALGEBRAIC LAWS of the sketch/geometry primitives —
  * invariants that must hold for EVERY input, not just the gate
  * corpus. Generation is ScalaCheck (`Gen.pureApply` with a pinned
  * `Seed`, so runs are bit-deterministic like every other spec), and
  * each law is checked in ONE Spark job over the whole generated
  * batch — no per-case session round-trips.
  *
  * Why these laws matter at 100 TB: the hash gate samples a few
  * thousand rows of one corpus shape; an algebraic law holds on all
  * 10^11 rows or on none. MinHash's union law is what makes the
  * banded LSH sound (a bucket collision IS evidence of shared
  * grams); SimHash's set-semantics invariance is what makes the
  * near-dup verdict independent of token order and repetition;
  * the Levenshtein code-point law is the exact premise the
  * fuzzy_match cross-engine oracle (UNICODEGATE_r11) is built on.
  */
class AlgebraLawsSpec extends SparkSpec {

  private val seed = Seed(42L)
  private val params = Gen.Parameters.default

  /** Deterministic sample of size n from a generator. */
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((seed, Option.empty[A])) { case (s, _) =>
      val (v, s2) = (g.pureApply(params, s), s.next)
      (s2, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq

  // mixed-script token alphabet: ASCII, Cyrillic, CJK, an astral
  // emoji (surrogate PAIR in UTF-16) and a combining mark — the
  // content classes the unicode gate pinned cross-engine
  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf('а', 'б', 'в', 'г', 'д').map(_.toString),
    2 -> Gen.oneOf('水', '火', '木', '金', '土').map(_.toString),
    1 -> Gen.const(new String(Character.toChars(0x1F600))),
    1 -> Gen.const("é"))

  private def strGen(maxLen: Int): Gen[String] =
    Gen.choose(0, maxLen).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))

  test("minhash union law: sig(A ∪ B) = elementwise min(sig A, sig B)") {
    import spark.implicits._
    val gramGen = Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
    val setGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, gramGen).map(_.toSet))
    val pairs = sample(Gen.zip(setGen, setGen), 50)
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((3L * i, a.toSeq), (3L * i + 1, b.toSeq),
        (3L * i + 2, (a ++ b).toSeq))
    }
    val sigs = Dedup.minhashSigs(rows.toDF("doc_id", "gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    pairs.indices.foreach { i =>
      val (sa, sb, su) = (sigs(3L * i), sigs(3L * i + 1), sigs(3L * i + 2))
      assert(su == sa.zip(sb).map { case (x, y) => math.min(x, y) },
        s"pair $i: union signature is not the elementwise min")
    }
  }

  test("simhash set law: invariant under token order and repetition") {
    import spark.implicits._
    val tokGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
    val docGen = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = sample(docGen, 50)
    val rows = docs.zipWithIndex.flatMap { case (toks, i) =>
      // B = A reversed with every token doubled — same token SET
      val dup = (toks.reverse ++ toks).mkString(" ")
      Seq((2L * i, toks.mkString(" ")), (2L * i + 1, dup))
    }
    val sims = Dedup.simhash(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.indices.foreach { i =>
      assert(sims(2L * i) == sims(2L * i + 1),
        s"doc $i: simhash changed under reorder+repeat of the same token set")
    }
  }

  test("levenshtein code-point law: Spark = DP over code points (incl. astral)") {
    import spark.implicits._
    def dp(a: Array[Int], b: Array[Int]): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val pairs = sample(Gen.zip(strGen(12), strGen(12)), 200)
    val got = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect()
    pairs.zip(got).zipWithIndex.foreach { case (((a, b), g), i) =>
      val want = dp(a.codePoints.toArray, b.codePoints.toArray)
      assert(g == want,
        s"pair $i (${a.length}/${b.length} chars): spark=$g dp=$want")
    }
  }

  test("jaccard verify law: exact set algebra, identical→1, disjoint→0") {
    import spark.implicits._
    val gramGen = Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
    val setGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, gramGen).map(_.toSet))
    val base = sample(Gen.zip(setGen, setGen), 40)
    // append an identical pair and a provably disjoint pair
    val pairsIn = base ++ Seq(
      (base.head._1, base.head._1),
      (base.head._1.map("x" + _), base.head._1.map("y" + _)))
    val sets = pairsIn.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a.toSeq), (2L * i + 1, b.toSeq))
    }.toDF("doc_id", "gs")
    val pairs = pairsIn.indices.map(i => (2L * i, 2L * i + 1))
      .toDF("doc_a", "doc_b")
    val got = Dedup.jaccardVerify(pairs, sets, 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    pairsIn.zipWithIndex.foreach { case ((a, b), i) =>
      val inter = (a & b).size
      val want = inter.toDouble / (a.size + b.size - inter)
      assert(got(2L * i) == want, s"pair $i: jaccard ${got(2L * i)} != $want")
    }
    assert(got(2L * (pairsIn.length - 2)) == 1.0)
    assert(got(2L * (pairsIn.length - 1)) == 0.0)
  }

  /** Driver mirror of the engines' shared reduction discipline: each
    * double term rounded to DECIMAL(24,12) via its shortest string
    * repr half-up (how Spark casts double→decimal), summed at scale
    * 12 (exact — no reduction-order sensitivity), then cast back.
    */
  private def dec12(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(12, java.math.RoundingMode.HALF_UP)

  test("pq encode law: code = decimal-exact argmin codeword, ties to smaller id") {
    import spark.implicits._
    val vecGen = Gen.listOfN(graft.sim.Pq.Dim,
      Gen.choose(-1000000, 1000000).map(_ / 1000000.0f))
    val vecs = sample(vecGen, 48).map(_.toArray)
    val emb = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val got = graft.sim.Pq.codes(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val book = vecs.take(graft.sim.Pq.CodebookIds)
    val sub = graft.sim.Pq.SubDim
    for (i <- vecs.indices; m <- 0 until graft.sim.Pq.NumSub) {
      val want = book.indices.map { c =>
        val d = (0 until sub).map { j =>
          val diff = vecs(i)(m * sub + j).toDouble - book(c)(m * sub + j).toDouble
          dec12(diff * diff)
        }.reduce(_ add _)
        (d.doubleValue, c.toLong)
      }.min._2
      assert(got((i.toLong, m)) == want,
        s"vec $i sub $m: code ${got((i.toLong, m))} != argmin $want")
    }
  }

  test("quantized dot law: symmetric, matches the decimal mirror, self-cosine ≈ 1") {
    import spark.implicits._
    val vecGen = Gen.listOfN(64,
      Gen.choose(-1000000, 1000000).map(_ / 1000000.0f))
    val pairs = sample(Gen.zip(vecGen, vecGen), 60)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = pairs.toDF("ex", "ey")
    val rows = df.select(
      graft.sim.Vectors.dot("ex", "ey").as("xy"),
      graft.sim.Vectors.dot("ey", "ex").as("yx"),
      graft.sim.Vectors.cosineFrom(
        graft.sim.Vectors.dot("ex", "ex"),
        graft.sim.Vectors.normSq("ex"),
        graft.sim.Vectors.normSq("ex")).as("selfcos")).collect()
    pairs.zip(rows).zipWithIndex.foreach { case (((a, b), r), i) =>
      val mirror = a.zip(b).map { case (x, y) =>
        dec12(x.toDouble * y.toDouble)
      }.reduce(_ add _).doubleValue
      assert(r.getDouble(0) == r.getDouble(1), s"pair $i: dot not symmetric")
      assert(r.getDouble(0) == mirror,
        s"pair $i: spark ${r.getDouble(0)} != decimal mirror $mirror")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12,
        s"pair $i: self-cosine ${r.getDouble(2)}")
    }
  }

  test("geometry ladders: minimal, monotone, occupancy-bounded") {
    val ns = sample(Gen.choose(1L, 10_000_000L), 300) ++
      // exact power-of-two boundaries, ±1 — where a float-log ladder
      // would flip between engines
      (8 to 20).flatMap(w => Seq(64L * (1L << w) - 1, 64L * (1L << w),
        64L * (1L << w) + 1))
    ns.foreach { n =>
      val w = Dedup.simhashBandBits(n)
      assert(w >= 8 && w <= 16)
      assert(w == 16 || n <= 64L * (1L << w), s"n=$n: W=$w occupancy bound")
      assert(w == 8 || n > 64L * (1L << (w - 1)), s"n=$n: W=$w not minimal")
      val p = graft.sim.Knn.planesFor(n)
      assert(p == 20 || n <= 64L * (1L << p), s"n=$n: p=$p occupancy bound")
      assert(p == 8 || n > 64L * (1L << (p - 1)), s"n=$n: p=$p not minimal")
    }
    // monotone in n (a bigger corpus never gets a smaller geometry)
    val sorted = ns.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(Dedup.simhashBandBits(a) <= Dedup.simhashBandBits(b))
      assert(graft.sim.Knn.planesFor(a) <= graft.sim.Knn.planesFor(b))
      assert(graft.sim.Ivf.numLists(a) <= graft.sim.Ivf.numLists(b))
    }
  }
}
