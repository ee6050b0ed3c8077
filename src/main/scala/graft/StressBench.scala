package graft

import org.apache.spark.sql.functions._

/** Dev tool: scaling check beyond the largest test SF — self-union
  * the fact tables ×N (distinct keys via an offset) and run headline
  * operators, to observe whether runtimes scale ~linearly and no
  * plan knee appears. Usage: runMain graft.StressBench [sfDir] [N]
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = Engine.session("graft-stress")
    import graft.sources.Tables

    def amplified(name: String, keyCols: Seq[String]) = {
      val base = Tables.table(spark, sfDir, name)
      (0 until mult).map { i =>
        keyCols.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i.toLong * 100000000L))
        }
      }.reduce(_ unionByName _)
    }

    val li = amplified("lineitem", Seq("l_orderkey"))
    val o = amplified("orders", Seq("o_orderkey", "o_custkey"))
    println(s"rows: lineitem=${li.count()} orders=${o.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("q1_agg_x" + mult) {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Fp.dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .count()
    }
    time("join_agg_x" + mult) {
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(Fp.dsum2(col("l_extendedprice")).as("rev"))
        .count()
    }
    time("window_x" + mult) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      li.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    spark.stop()
  }
}
