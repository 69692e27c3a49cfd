package graft.util

import org.apache.spark.sql.SparkSession

/**
 * Per-(session, key) cache for driver-side index artifacts (materialized
 * signature tables, coded vectors, table catalogs).
 *
 * Keyed by the session OBJECT through a `WeakHashMap`, not by
 * `System.identityHashCode(session)`: an identity hash can be reused by a
 * new session once the old one is garbage-collected, which would hand the
 * new session another session's cached DataFrames (dead plans, freed
 * checkpoint blocks). With object keys a collision is impossible by
 * construction.
 *
 * Lifetime, honestly: the cached VALUES (DataFrames, Graphs) strongly
 * reference their SparkSession, so while an entry map exists its weak
 * key stays reachable through it — the weak keying prevents collisions,
 * not automatic collection. Callers that retire a session release its
 * entries explicitly via [[removeAll]] (the bench's family release, a
 * service's session-close hook); after removeAll the session and its
 * plans become collectable.
 *
 * Map lookup synchronizes on the WeakHashMap (it is not thread-safe);
 * entry builds run OUTSIDE that lock on the session's own concurrent map,
 * so one session materializing an index (a Spark job) never blocks
 * another session's cache.
 */
final class SessionCache[V] {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, V]]

  private def mapFor(s: SparkSession): scala.collection.concurrent.TrieMap[String, V] =
    bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, V]
        bySession.put(s, m)
      }
      m
    }

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V =
    mapFor(s).getOrElseUpdate(key, build)

  /** Remove and return this session's entries (cache release path). */
  def removeAll(s: SparkSession): Seq[V] = {
    val m = bySession.synchronized(bySession.remove(s))
    if (m == null) Nil else m.values.toSeq
  }
}
