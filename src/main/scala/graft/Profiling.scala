package graft

/** Opt-in phase timing for the expensive one-time builds: set
  * SPARK_GRAFT_PROFILE=1 and each wrapped phase prints its wall
  * seconds. Zero overhead when unset (one env check per phase); no
  * state, safe under the memoized-build locks it runs inside.
  */
object Profiling {

  private val enabled: Boolean = sys.env.contains("SPARK_GRAFT_PROFILE")

  def phase[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graft-profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
}
