package graft

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.util.SessionCache

/** Pins the build-deduplication contract of [[graft.util.SessionCache]]:
  * concurrent lookups of the same (session, key) must run the expensive
  * build exactly once (a lost race used to leak the loser's
  * localCheckpoint blocks — they were discarded unreferenced, invisible
  * to removeAll).
  */
class SessionCacheSpec extends SparkSpec {

  describe("SessionCache") {
    it("runs a racing build at most once per key") {
      val cache = new SessionCache[Integer]
      val builds = new AtomicInteger(0)
      val threads = 16
      val pool = Executors.newFixedThreadPool(threads)
      try {
        val start = new CountDownLatch(1)
        val results = (0 until threads).map { _ =>
          pool.submit { () =>
            start.await()
            cache.getOrElseUpdate(spark, "k") {
              builds.incrementAndGet()
              Thread.sleep(20) // widen the race window
              Integer.valueOf(42)
            }
          }
        }
        start.countDown()
        val values = results.map(_.get(30, TimeUnit.SECONDS))
        assert(values.forall(_ == 42))
        assert(builds.get() == 1, s"build ran ${builds.get()} times")
      } finally pool.shutdownNow()
      assert(cache.removeAll(spark) == Seq(Integer.valueOf(42)))
    }

    it("removeAll skips entries whose build never ran") {
      val cache = new SessionCache[Integer]
      cache.getOrElseUpdate(spark, "built")(Integer.valueOf(1))
      // force a second entry's holder into the map without forcing its
      // lazy value: impossible through the public API (getOrElseUpdate
      // always forces), so this documents the released set == forced set
      assert(cache.removeAll(spark) == Seq(Integer.valueOf(1)))
      assert(cache.removeAll(spark).isEmpty)
    }
  }
}
