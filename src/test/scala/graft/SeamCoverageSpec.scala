package graft

import graft.sources.ArtifactStore
import graft.util.SessionCache

/** Structural enforcement of `StreamAgg.artifactSeams` (r13 verdict #3):
  * the registry used to be honor-system — a new stream that resolves a
  * stored family without adding its seam entry would silently dodge the
  * warm-coverage gate, because WarmCoverageSpec cannot construct
  * s-queries (construction RUNS their streams) and enumerates their
  * families through the seams instead.
  *
  * This gate closes the loop by doing the expensive thing once: it RUNS
  * every s-query cold (SessionCache.dropAll first, so side-input
  * accessors must re-resolve their artifacts instead of serving a prior
  * suite's cached readers), captures every artifact name touched during
  * construction+run (ArtifactStore.capturing — the capture lives at the
  * store, so any accessor path is seen), and asserts each stream's
  * resolved family set is covered by ITS OWN artifactSeams entry.
  * Deleting a seam entry whose stream resolves stored families fails
  * here; so does adding a stream that reads a family with no entry.
  */
class SeamCoverageSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def fams(touched: Set[String]): Set[String] =
    touched.filter(_.startsWith("graft_")).map(ArtifactStore.familyOf)

  it("every stream's stored side-inputs are covered by its own artifactSeams entry") {
    val seams = graft.streaming.StreamAgg.artifactSeams(spark, sfDir).toMap
    val sQueries = SparkEntry.queries.filter(_._1.startsWith("s")).toSeq.sortBy(_._1)
    assert(sQueries.nonEmpty, "no s-queries in the registry — did the naming convention change?")
    val failures = sQueries.flatMap { case (name, fn) =>
      SessionCache.dropAll(spark)
      val (_, streamTouch) = ArtifactStore.capturing { fn(spark, sfDir) }
      val streamFams = fams(streamTouch)
      if (streamFams.isEmpty) None
      else {
        SessionCache.dropAll(spark)
        val (_, seamTouch) = ArtifactStore.capturing(seams.get(name).foreach(_.apply()))
        val missing = streamFams -- fams(seamTouch)
        if (missing.isEmpty) None
        else Some(s"$name resolves $missing, not covered by its artifactSeams entry " +
          s"(entry ${if (seams.contains(name)) "resolves " + fams(seamTouch) else "MISSING"})")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
