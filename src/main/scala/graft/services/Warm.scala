package graft.services

import org.apache.spark.sql.SparkSession

/**
 * Session-start artifact warm-up: batch-resolve every stored index family
 * that is ALREADY LIVE under the configured artifact roots, in parallel,
 * into the session's caches.
 *
 * Why: each stored family (MinHash signatures, LSH bands, posting/
 * positional/norms tables, CDC chunks, the d27 corpus index, the SRP
 * quantizer metadata, the JL sketch, the IVF index) costs a pointer read,
 * a parquet footer open and — for partitioned artifacts — partition
 * discovery on FIRST touch. Individually tiny driver-side reads, but a
 * fresh session's first index-backed query used to absorb them all
 * SERIALLY (round 10: e06 probe rep 1 = 6.5 s vs 1.15 s steady at sf10).
 * Running them concurrently at session start costs max(latency) instead
 * of sum(latency) and moves it out of the first query entirely.
 *
 * Strictly resolve-only: a family whose artifact does not exist is
 * skipped (never built — a cold root warms in milliseconds and the first
 * real query pays the build exactly as before), so warming never moves
 * index-BUILD cost out of measured queries. Thread-safety: the session
 * caches deduplicate builds per (session, key) behind lazy holders
 * ([[graft.util.SessionCache]]), so a real query racing the warm-up
 * simply shares the same resolve.
 */
object Warm {

  /** Resolve all live stored families for `dir` into `s`'s caches.
    * Failures are swallowed per-family (warm-up must never fail a
    * session); returns the hooks that completed without error (a hook
    * whose artifact is absent completes as a no-op). */
  def resolve(s: SparkSession, dir: String, timeoutSec: Int = 120): Seq[String] = {
    val hooks: Seq[(String, () => Unit)] =
      graft.sources.TextIndex.warmResolve(s, dir) ++
        graft.queries.SearchQueries.warmResolve(s, dir) ++
        graft.sources.AnnIndex.warmResolve(s, dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(hooks.size, 8),
      r => { val t = new Thread(r, "graft-warm"); t.setDaemon(true); t })
    try {
      val done = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val futures = hooks.map { case (name, thunk) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try { thunk(); done.add(name) }
            catch { case scala.util.control.NonFatal(_) => () }
        })
      }
      val deadline = System.nanoTime() + timeoutSec * 1000000000L
      futures.foreach { f =>
        val left = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
        try f.get(left, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch { case _: java.util.concurrent.TimeoutException |
                     _: java.util.concurrent.ExecutionException => () }
      }
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sorted
    } finally pool.shutdownNow()
  }
}
