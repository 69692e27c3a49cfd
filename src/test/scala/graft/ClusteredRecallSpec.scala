package graft

/** The round-14 lead-item gate: on a corpus with real cluster structure
  * (MogQueries' derived mixture-of-Gaussians view), the quantizer recall
  * audits must carry the signal the random-vector corpus cannot — the
  * residual-encoded family beats any flat codebook by a structural
  * margin, and training the flat codebook in place does NOT close the
  * gap (capacity, not placement, is the bottleneck). These orderings are
  * what a deployment reads off the e15/e17/e18-e20 family before
  * choosing a code-table layout; asserting them here means a regression
  * that flattens the signal (a broken residual pipeline, a scrambled
  * coarse stage, a fixture change to unclustered geometry) fails the
  * build rather than silently reverting the audits to coin flips.
  *
  * Inequalities, not exact pins: the values are deterministic for a
  * given corpus (measured 0.45 / 0.47 / 0.73 at sf0.001, 0.42 / 0.41 /
  * 0.76 at sf0.01, 0.225-ish / — / 0.58 at sf0.1), but the margins are
  * chosen to survive a driver-side testdata regeneration.
  */
class ClusteredRecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def recallOf(name: String): (Long, Double) = {
    val row = graft.queries.MogQueries.all.find(_.name == name).get.fn(spark, dir).head()
    (row.getAs[Long]("n_queries"), row.getAs[Double]("recall_at_5"))
  }

  describe("clustered-geometry quantizer recall ordering (e18/e19/e20)") {
    lazy val (nFlat, flat) = recallOf("e18_mog_pq_recall")
    lazy val (nTrained, trained) = recallOf("e19_mog_trained_pq_recall")
    lazy val (nRes, residual) = recallOf("e20_mog_residual_recall")

    it("audits a full fixed-size panel on every variant") {
      assert(nFlat == 20 && nTrained == 20 && nRes == 20)
    }

    it("residual-PQ clears the working-quantizer bar on clustered data") {
      // the random-corpus audits (e15/e17) read 0.0-0.2 by documented
      // maximal-loss geometry; a working residual quantizer on clustered
      // data must sit far above that floor
      assert(residual >= 0.6, s"residual recall $residual below the working bar")
    }

    it("residual-PQ beats both flat codebooks by a structural margin") {
      assert(residual >= flat + 0.15, s"residual $residual vs flat $flat")
      assert(residual >= trained + 0.15, s"residual $residual vs trained-flat $trained")
    }

    it("flat codebooks stay capacity-bound (NC > KSub by construction)") {
      assert(flat <= 0.6 && trained <= 0.6,
        s"flat $flat / trained $trained — the mixture no longer exceeds flat capacity")
    }
  }
}
