package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: scaling check for the round-15 join-acceleration trio —
  * plain vs bloom-prefiltered (K66) vs salted (K64) joins on an
  * amplified corpus (each replica offsets the keys, so ndv scales
  * with volume like a real corpus). The bloom sizes m to the dim ndv
  * (the K38 bloomMExpr discipline, next power of two ≥ 16·n) —
  * exactly what a deployment does; the gate's fixed 32 KB m would
  * saturate past ~30k keys and is reported alongside for honesty.
  * Usage: runMain graft.tools.StressJoin [sfDir] [mult1,mult2,...]
  */
object StressJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("12,24").split(",").map(_.toInt)
    val spark = graft.Engine.session("graft-stress-join")
    spark.sparkContext.setLogLevel("WARN")

    def amp(t: String, key: String, mult: Int): DataFrame =
      (0 until mult).map { i =>
        graft.sources.Tables.table(spark, sfDir, t)
          .withColumn(key, col(key) + lit(i.toLong * 1000000000L))
      }.reduce(_ unionByName _)

    def timed(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (mult <- mults) {
      val facts = amp("lineitem", "l_orderkey", mult)
        .select("l_orderkey", "l_extendedprice", "l_returnflag")
        .localCheckpoint(true)
      val urgent = amp("orders", "o_orderkey", mult)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
        .localCheckpoint(true)
      val nFact = facts.count()
      val nDim = urgent.count()
      // m sized to ndv: next pow2 >= 16 * nDim (the K38 discipline),
      // floored at 64 so the word-array geometry stays valid on a
      // near-empty dim
      val mBits = java.lang.Long.highestOneBit(
        math.max(16L * nDim, 64L) * 2 - 1)
      val (tPlain, nPlain) = timed {
        facts.join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1))).count()
      }
      val (tBloom, _) = timed {
        graft.relational.BloomJoin
          .bloomFilteredM(facts, "l_orderkey", urgent, "o_orderkey", mBits)
          .join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1))).count()
      }
      val (tSurv, nSurv) = timed {
        graft.relational.BloomJoin
          .bloomFilteredM(facts, "l_orderkey", urgent, "o_orderkey", mBits)
          .count()
      }
      val nMatch = facts
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .count()
      val fpPpm =
        if (nFact == nMatch) 0L
        else (nSurv - nMatch) * 1000000L / (nFact - nMatch)
      // salted vs plain on the full (3.19x-skew) orders join
      val fullDim = amp("orders", "o_orderkey", mult)
        .select("o_orderkey", "o_orderpriority").localCheckpoint(true)
      val factsPk = facts.withColumn("li_pk",
        expr("l_orderkey * 10 + monotonically_increasing_id() % 10"))
      val (tPlainFull, _) = timed {
        factsPk.join(fullDim, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(count(lit(1))).count()
      }
      val (tSalt, _) = timed {
        graft.relational.SkewJoin
          .salted(factsPk, fullDim, "l_orderkey", "o_orderkey", "li_pk")
          .groupBy("o_orderpriority").agg(count(lit(1))).count()
      }
      // HOT-KEY fixtures (round 16): a fraction of fact ROWS remapped
      // onto ONE existing dim key — the straggler/OOM shape the salt
      // arm exists for (the r15 fixture's 3.19× ratio over 7-row keys
      // had no straggler to fix, and salting lost). Two fractions:
      // 20% (a noticeable hot head) and 80% (one key owning the
      // corpus — the shape that serializes a stage through one task).
      // Each measured three ways: plain with Spark's AQE runtime skew
      // split ON (the built-in mitigation), plain with it OFF (the
      // shape AQE cannot split — e.g. a non-splittable downstream
      // requirement), and the K64 salted two-path (mitigation off, so
      // the win is the salt's own).
      val hotKey = fullDim.agg(min("o_orderkey")).collect()(0).getLong(0)
      def skewRuns(hotMod: Int): (Long, Double, Double, Double, Long) = {
        val factsSkew = factsPk.withColumn("l_orderkey",
            expr(s"CASE WHEN l_orderkey % 5 < $hotMod THEN ${hotKey}L " +
              "ELSE l_orderkey END"))
          .localCheckpoint(true)
        val hotCnt = factsSkew.filter(col("l_orderkey") === hotKey).count()
        val (tAqe, _) = timed {
          factsSkew.join(fullDim, col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderpriority").agg(count(lit(1))).count()
        }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        val (tNoAqe, _) = timed {
          factsSkew.join(fullDim, col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderpriority").agg(count(lit(1))).count()
        }
        val (tSaltS, nGroups) = timed {
          graft.relational.SkewJoin
            .salted(factsSkew, fullDim, "l_orderkey", "o_orderkey", "li_pk")
            .groupBy("o_orderpriority").agg(count(lit(1))).count()
        }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        factsSkew.unpersist()
        (hotCnt, tAqe, tNoAqe, tSaltS, nGroups)
      }
      val (hot20, t20Aqe, t20NoAqe, t20Salt, _) = skewRuns(1)
      val (hot80, t80Aqe, t80NoAqe, t80Salt, nG) = skewRuns(4)
      val line =
        s"""{"mult":$mult,"n_fact":$nFact,"n_dim":$nDim,"m_bits":$mBits,
           |"sec_plain_sel":$tPlain,"sec_bloom_sel":$tBloom,
           |"sec_bloom_filter":$tSurv,"survivors":$nSurv,
           |"n_match":$nMatch,"fp_ppm":$fpPpm,
           |"sec_plain_full":$tPlainFull,"sec_salted_full":$tSalt,
           |"hot20_cnt":$hot20,"sec_plain_hot20_aqe":$t20Aqe,
           |"sec_plain_hot20_noaqe":$t20NoAqe,"sec_salted_hot20":$t20Salt,
           |"hot80_cnt":$hot80,"sec_plain_hot80_aqe":$t80Aqe,
           |"sec_plain_hot80_noaqe":$t80NoAqe,"sec_salted_hot80":$t80Salt,
           |"n_groups_salted":$nG}"""
          .stripMargin.replaceAll("\n", "")
      println("STRESSJOIN " + line)
      out += line
    }
    java.nio.file.Files.writeString(
      java.nio.file.Path.of("STRESSJOIN_r16.json"),
      out.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
