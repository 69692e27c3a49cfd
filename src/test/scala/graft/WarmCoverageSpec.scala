package graft

import graft.sources.ArtifactStore

/** The warm-coverage gate: every artifact family ever published through
  * [[ArtifactStore.getOrBuild]] must be probed by some registered warm
  * hook ([[graft.services.Warm.resolve]]) — a new stored family that
  * forgets its hook would silently re-absorb pointer reads / partition
  * discovery into its first query in every fresh session (the r10 e06
  * symptom the warm path exists to prevent). Mechanism: ArtifactStore
  * records every getOrBuild base name and every isLive/anyPointer probe;
  * this spec triggers every batch query's construction (artifact builds
  * happen there), runs the warm hooks, and asserts the published family
  * set is contained in the probed set. */
class WarmCoverageSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  /** Digest-free family prefix (shared with SeamCoverageSpec). */
  private def fam(n: String): String = ArtifactStore.familyOf(n)

  it("every published artifact family has a registered warm hook") {
    val sfDir = "/root/testdata/sf0.001"
    // Construct every batch query: getOrBuild calls run during
    // construction, so this enumerates the full family set without
    // executing the plans. s-prefixed queries RUN their streams on
    // construction, so instead of constructing them this drives their
    // stored-artifact side-inputs through StreamAgg.artifactSeams — the
    // stream queries' construction-path seam. A family whose batch
    // publishers were all deleted but that an s-query keeps resolving
    // therefore still registers its publishes and stays gate-enforced
    // (the old wholesale s-skip let exactly that case dodge the gate).
    SparkEntry.queries.filterNot(_._1.startsWith("s")).values
      .foreach(f => f(spark, sfDir))
    graft.streaming.StreamAgg.artifactSeams(spark, sfDir).foreach(_._2())
    // restrict to the engine's graft_ families: the recorders are
    // JVM-global and other suites (ArtifactStoreSpec) publish synthetic
    // names with no warm hooks — without the filter this gate is
    // suite-order-dependent (confirmed: running ArtifactStoreSpec first
    // fails it on art_a..art_e etc.)
    val published = ArtifactStore.publishedNames.asScala.toSet
      .filter(_.startsWith("graft_")).map(fam)
    assert(published.nonEmpty, "no artifact publishes recorded — did getOrBuild move?")

    // With every artifact live (the constructions above built them), the
    // hooks' short-circuit gates all pass, so each hook probes its full
    // name set; a family no hook probes can only be an uncovered one.
    ArtifactStore.probedNames.clear()
    graft.services.Warm.resolve(spark, sfDir)
    val probed = ArtifactStore.probedNames.asScala.toSet.map(fam)
    val uncovered = published -- probed
    assert(uncovered.isEmpty,
      s"artifact families with no warm hook: $uncovered\nprobed by hooks: $probed")
  }
}
