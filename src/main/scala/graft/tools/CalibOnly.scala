package graft.tools

/** Dev tool: run ONLY the Bench host-calibration workload and print
  * calib_sec — used (on an idle host) to pin `Bench.CalibReference`,
  * and to spot-check host speed between rounds without a full sweep.
  */
object CalibOnly {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-calib")
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup of the same shape, then the measured reps
    graft.Bench.calibrate(spark, reps = 1)
    val c = graft.Bench.calibrate(spark)
    println(f"""CALIB {"calib_sec":$c%.3f,"reference_set":"${graft.Bench.CalibReferenceSet}"}""")
    spark.stop()
  }
}
