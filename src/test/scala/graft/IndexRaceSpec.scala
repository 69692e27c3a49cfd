package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.Row

/** Concurrent-session safety of the production ANN index build
  * ([[graft.queries.VectorQueries.partitionedIndex]]): two live sessions
  * racing to build the same `spark.graft.ann.indexDir` must leave exactly
  * ONE valid `_SUCCESS` index (the loser discards its staged tree or its
  * nested rename) and both must read identical, complete index content.
  * Also pins the stale-dir policy that closes the round-7 TOCTOU: a
  * young `_SUCCESS`-less destination dir (a possibly-in-flight concurrent
  * rename) is NOT deleted; a stale one (crash leftover) is.
  */
class IndexRaceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  describe("partitionedIndex under concurrent sessions") {

    it("two racing sessions leave exactly one live index and agree on content") {
      withScratchDir("graft_idx_race") { root =>
        val s1 = spark.newSession()
        val s2 = spark.newSession()
        Seq(s1, s2).foreach(_.conf.set("spark.graft.ann.indexDir", "file:" + root))
        val start = new CountDownLatch(1)
        val pool = Executors.newFixedThreadPool(2)
        try {
          val futs = Seq(s1, s2).map { s =>
            pool.submit { () =>
              start.await()
              graft.queries.VectorQueries.partitionedIndex(s, sfDir)
                .orderBy("vec_id").collect(): Array[Row]
            }
          }
          start.countDown()
          val Seq(r1, r2) = futs.map(_.get(120, TimeUnit.SECONDS))
          val nVec = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
          assert(r1.length == nVec && r2.length == nVec,
            s"index incomplete: ${r1.length}/${r2.length} of $nVec")
          assert(r1.map(_.getLong(0)).sameElements(r2.map(_.getLong(0))),
            "sessions read different index content")
        } finally pool.shutdownNow()
        val dirs = new java.io.File(root).listFiles().toSeq
        val idxDirs = dirs.filter(_.getName.startsWith("graft_ivf_idx_"))
        val stages = idxDirs.filter(_.getName.contains("_stage_"))
        assert(stages.isEmpty, s"staging leftovers: ${stages.map(_.getName)}")
        assert(idxDirs.size == 1, s"expected one index dir, got ${idxDirs.map(_.getName)}")
        assert(new java.io.File(idxDirs.head, "_SUCCESS").exists(), "winner has no _SUCCESS")
        // no nested lost-race tree under the live index
        val nested = idxDirs.head.listFiles().filter(_.getName.contains("_stage_"))
        assert(nested.isEmpty, s"nested lost-race tree: ${nested.map(_.getName).toSeq}")
      }
    }

    it("a young _SUCCESS-less dir is preserved; a stale one is replaced") {
      withScratchDir("graft_idx_stale") { root =>
        val s = spark.newSession()
        s.conf.set("spark.graft.ann.indexDir", "file:" + root)
        s.conf.set("spark.graft.ann.staleIndexMs", "0") // everything is stale
        // plant a crash leftover: the destination dir with partial junk
        // and no _SUCCESS, under the digest the build will compute
        graft.queries.VectorQueries.partitionedIndex(s, sfDir) // builds clean
        val idx = new java.io.File(root).listFiles()
          .find(_.getName.startsWith("graft_ivf_idx_")).get
        new java.io.File(idx, "_SUCCESS").delete() // poison: live → crash leftover
        val s3 = spark.newSession()
        s3.conf.set("spark.graft.ann.indexDir", "file:" + root)
        s3.conf.set("spark.graft.ann.staleIndexMs", "0")
        val rebuilt = graft.queries.VectorQueries.partitionedIndex(s3, sfDir)
        assert(rebuilt.count() == spark.read.parquet(s"$sfDir/embeddings.parquet").count())
        assert(new java.io.File(idx, "_SUCCESS").exists(), "stale dir not rebuilt")
      }
    }
  }
}
