package graft

import org.scalatest.funsuite.AnyFunSuite

/** The concurrent-actions helper behind the overlapped build writes
  * (guide §2.6): order, failure propagation, and drain-before-throw.
  */
class ParJobsSpec extends AnyFunSuite {

  test("results keep input order regardless of completion order") {
    val out = Par.jobs((0 until 8).map { i => () =>
      // later thunks finish first: reversed sleeps
      Thread.sleep((8 - i) * 5L); i * 10
    })
    assert(out == (0 until 8).map(_ * 10))
  }

  test("single thunk runs inline") {
    val t = Thread.currentThread()
    val out = Par.jobs(Seq(() => Thread.currentThread() eq t))
    assert(out == Seq(true))
  }

  test("a failing thunk propagates its ORIGINAL exception after all settle") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom = new IllegalStateException("boom")
    val e = intercept[IllegalStateException] {
      Par.jobs[Unit](Seq(
        () => { Thread.sleep(30); done.incrementAndGet(); () },
        () => throw boom,
        () => { Thread.sleep(30); done.incrementAndGet(); () }))
    }
    assert(e eq boom)
    // the pool drained: both healthy thunks completed before the throw
    assert(done.get() == 2)
  }

  test("concurrency is bounded by maxConcurrent") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    Par.jobs((0 until 12).map { _ => () =>
      val a = active.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, a))
      Thread.sleep(20)
      active.decrementAndGet()
      ()
    }, maxConcurrent = 3)
    assert(peak.get() <= 3 && peak.get() >= 1)
  }
}
