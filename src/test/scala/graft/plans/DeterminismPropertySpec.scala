package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the pure-integer primitives the cross-engine
  * determinism claims rest on (no SparkSession needed; seeded
  * pseudo-random sampling + exhaustive small domains). These pin the
  * algebra itself: if any property here broke, the hash gate's
  * operator-level equality would be luck, not law.
  */
class DeterminismPropertySpec extends AnyFunSuite {

  private val Off = 10000000000000000L // the shared 1e16 offset
  private val rnd = new java.util.Random(42)

  test("shared half-up division: truncation == floor on the shifted numerator") {
    // Spark `div` truncates toward zero, DuckDB `//` floors — the OFF
    // shift makes the numerator non-negative, where they coincide, so
    // both engines compute the identical quotient
    // production divisors are small (24/48 for the moving average,
    // 2·group-count for the seasonal mean) — d ≤ 400 also keeps
    // (x + OFF·d)·2 inside int64, the same overflow budget the
    // operators document
    for (_ <- 1 to 20000) {
      val x = rnd.nextLong() % 1000000000000L
      val d = 1L + rnd.nextInt(400)
      val num = (x + Off * d) * 2 + d
      assert(num >= 0)
      assert(num / (2 * d) == Math.floorDiv(num, 2 * d))
    }
  }

  test("shared half-up division equals round-half-up of the rational") {
    for (_ <- 1 to 20000) {
      val x = rnd.nextLong() % 1000000000000L
      val d = 1L + rnd.nextInt(400)
      val got = ((x + Off * d) * 2 + d) / (2 * d) - Off
      val exact = BigDecimal(x) / BigDecimal(d)
      // round half toward +infinity (what the shifted formula does,
      // consistently in BOTH engines)
      val want = exact.setScale(0,
        if (exact.signum >= 0) BigDecimal.RoundingMode.HALF_UP
        else BigDecimal.RoundingMode.HALF_DOWN).toLong
      assert(got == want, s"x=$x d=$d got=$got want=$want")
    }
    // exact-tie cases, both signs
    assert(((5L + Off * 2) * 2 + 2) / 4 - Off == 3)   // 2.5 -> 3
    assert(((-5L + Off * 2) * 2 + 2) / 4 - Off == -2) // -2.5 -> -2
  }

  test("scale-6 quantization: exact HALF_UP == multiply-then-round for |v| < 2") {
    // Spark casts double→decimal through exact BigDecimal HALF_UP;
    // DuckDB computes round(v·10^6) in double arithmetic. For
    // float-sourced v in (-2, 2) they must agree everywhere:
    // exact .5 ties (odd multiples of 1/128) have v·10^6 exactly
    // representable and both engines round half away from zero, and
    // NEAR-ties can't exist because the true products sit on a grid
    // (multiples of 5^6/2^(j-6)) far coarser than the product's
    // double error. At scale 12 this property is FALSE — which is
    // exactly why embedding_centroids quantizes components at 6.
    def duckWay(v: Double): Long =
      (math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5)).toLong
    def sparkWay(v: Double): Long =
      (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toLongExact
    for (_ <- 1 to 50000) {
      val f = (rnd.nextFloat() - 0.5f) * 4f
      assert(sparkWay(f.toDouble) == duckWay(f.toDouble), s"flip at $f")
    }
    // an exact tie (odd multiple of 1/128) agrees too
    val tie = 0.0078125 // 1/128 -> 7812.5 micro-units
    assert(sparkWay(tie) == 7813L && duckWay(tie) == 7813L)
  }

  test("Morton interleave is a bijection on the 256x256 grid") {
    def interleave(xb: Long, yb: Long): Long =
      (0 until 8).map { i =>
        (((xb >> i) & 1L) << (2 * i)) | (((yb >> i) & 1L) << (2 * i + 1))
      }.sum
    def deinterleave(z: Long): (Long, Long) = {
      val x = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val y = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      (x, y)
    }
    val seen = scala.collection.mutable.Set.empty[Long]
    for (x <- 0L to 255L; y <- 0L to 255L) {
      val z = interleave(x, y)
      assert(z >= 0 && z <= 65535)
      assert(deinterleave(z) == ((x, y)))
      assert(seen.add(z), s"collision at ($x, $y)")
      // the arithmetic form used in SQL (div/mod, no bit ops) agrees
      val sqlForm = (0 until 8).map { i =>
        (((x / (1L << i)) % 2) * (1L << (2 * i))) +
          (((y / (1L << i)) % 2) * (1L << (2 * i + 1)))
      }.sum
      assert(sqlForm == z)
    }
    assert(seen.size == 65536)
  }

  test("micro-unit scaling is exact for 6-dp decimals") {
    // vm = (decimal value · 1e6) as long is exact — the ts_decompose
    // precondition
    for (_ <- 1 to 20000) {
      val m = rnd.nextLong() % 8000000000L
      val v = BigDecimal(m, 6) // a 6-dp decimal
      assert((v * BigDecimal(1000000)).toLongExact == m)
    }
  }
}
