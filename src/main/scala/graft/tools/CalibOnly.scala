package graft.tools

/** Dev tool: run ONLY the Bench host-calibration workload and print
  * calib_sec — used (on an idle host) to pin `Bench.CalibReference`,
  * and to spot-check host speed between rounds without a full sweep.
  */
object CalibOnly {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-calib")
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup of the same shape until the JIT settles (a
    // single warmup rep measured 1.77 vs 0.61 s between two fresh
    // JVMs — C2 was still compiling through all five timed reps),
    // then the measured min-of-5
    graft.Bench.calibrate(spark, reps = 6)
    val c = graft.Bench.calibrate(spark, reps = 10)
    println(f"""CALIB {"calib_sec":$c%.3f,"reference_set":"${graft.Bench.CalibReferenceSet}"}""")
    spark.stop()
  }
}
