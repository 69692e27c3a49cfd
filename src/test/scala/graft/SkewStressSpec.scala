package graft

import org.apache.spark.sql.functions._
import graft.queries.{TextQueries, VectorQueries}
import graft.sources.AnnIndex

/**
 * Scale proof-point for the dedup/ANN hot-bucket caps: a pathologically
 * skewed corpus — one document near-duplicated 10,000×, one SRP bucket
 * fed 10,000 identical vectors — must stay sub-quadratic. Without the
 * caps these inputs generate ~5·10⁷ candidate pairs per hot bucket; with
 * them the hot buckets are dropped (and REPORTED via the observed
 * metrics), the survivors join normally, and the pipelines finish in
 * seconds. This is the local[2] stand-in for the duplicate-heavy shard
 * of a 100 TB crawl.
 */
class SkewStressSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def observed(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.Row =
    df.queryExecution.observedMetrics(name)

  describe("LSH near-dup candidates (d09 shape) under 10k× document skew") {
    it("drops the hot buckets, reports them, and stays sub-quadratic") {
      val docs0 = graft.sources.TestData.graph(spark, sfDir).V("documents").df
        .select(col("doc_id"), col("text"))
      // 10k NEAR-duplicates of one real document: a distinct numeric tail
      // keeps each md5 unique (so exact dedup keeps them all) while the
      // shared prefix dominates the shingle set — most of the 16 band
      // keys collide, exactly the hot-bucket storm the cap exists for
      val seedText = docs0.orderBy("doc_id").select("text").head().getString(0)
      val variants = spark.range(10000).select(
        (col("id") + 1000000L).as("doc_id"),
        concat(lit(seedText + " variant "), col("id").cast("string")).as("text"))
      val stressed = docs0.unionByName(variants)

      val t0 = System.nanoTime()
      val pairs = TextQueries.candidatePairsOf(
        stressed, TextQueries.signaturesOf(stressed).localCheckpoint())
      // collect() executes pairs' OWN QueryExecution, which is where the
      // observed metrics accumulate (count() would wrap a new plan)
      val nPairs = pairs.collect().length.toLong
      val secs = (System.nanoTime() - t0) / 1e9

      val m = observed(pairs, "d09_bucket_cap")
      assert(m.getAs[Long]("hot_buckets") > 0L, m.toString)        // the storm was seen…
      // …at a size far beyond the cap (how far beyond depends on how many
      // of the 16 bands each variant's tail token perturbs, so the bound
      // is deliberately loose: 5× the cap ≫ any healthy bucket)
      assert(m.getAs[Long]("max_bucket_size") > 100L, m.toString)
      // …and structurally excluded: the candidate set stays in the
      // healthy-bucket regime (≦ B · Cap²/2 pairs per surviving bucket
      // family; quadratic would be ≳5·10⁷)
      assert(nPairs < 100000L, s"candidate pairs exploded: $nPairs")
      assert(secs < 120.0, s"d09 stress took ${secs}s")
    }
  }

  describe("embedding-cosine near-dup (d12 shape) under one 10k-vector hot SRP bucket") {
    it("caps the bucket, reports the capped rows, and stays sub-quadratic") {
      val emb0 = graft.sources.TestData.graph(spark, sfDir).V("embeddings").df
        .select(col("vec_id"), col("embedding"))
      // 10k clones of one real embedding — identical vector ⇒ identical
      // SRP code ⇒ one bucket of 10k+ members, far over VecBucketCap
      val seed = emb0.orderBy("vec_id").limit(1).select(col("embedding"))
      val clones = spark.range(10000).crossJoin(broadcast(seed))
        .select((col("id") + 1000000L).as("vec_id"), col("embedding"))
      val stressed = emb0.unionByName(clones)

      val t0 = System.nanoTime()
      val out = VectorQueries.cosineNearDupFrom(
        AnnIndex.codeVectors(stressed).localCheckpoint())
      val nPairs = out.collect().length.toLong
      val secs = (System.nanoTime() - t0) / 1e9

      val m = observed(out, "d12_bucket_cap")
      assert(m.getAs[Long]("rows_in_capped_buckets") >= 10000L, m.toString)
      assert(m.getAs[Long]("max_bucket_size") >= 10000L, m.toString)
      // the hot bucket contributes zero pairs; survivors stay bounded
      // (10k² / 2 = 5·10⁷ would be the uncapped explosion)
      assert(nPairs < 100000L, s"pair set exploded: $nPairs")
      assert(secs < 120.0, s"d12 stress took ${secs}s")
    }
  }

  describe("SRP quantizer auto-sizing (deriveNBits)") {
    it("grows bits with the corpus, integer-exact at the occupancy boundaries") {
      // nbits = smallest b in [6,16] with N <= 64·2^b — the SAME integer
      // comparison the DuckDB oracle runs on count(*), so the boundary
      // cases must be exact (a float log2 would wobble at N = 64·2^b)
      assert(AnnIndex.deriveNBits(0L) == 6)
      assert(AnnIndex.deriveNBits(1L) == 6)
      assert(AnnIndex.deriveNBits(64L << 6) == 6)        // exactly full → still 6
      assert(AnnIndex.deriveNBits((64L << 6) + 1) == 7)  // one over → 7
      assert(AnnIndex.deriveNBits(2000L) == 6)           // shipped sf0.1 corpus: floor
      assert(AnnIndex.deriveNBits(20000L) == 9)          // generated sf1 corpus
      assert(AnnIndex.deriveNBits(2000000L) == 15)       // generated sf100 corpus
      assert(AnnIndex.deriveNBits(60000000000L) == 16)   // beyond 64*2^16: capped at NBitsMax
      assert(AnnIndex.deriveNBits(Long.MaxValue) == 16)
      // monotone non-decreasing over three decades
      val samples = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)
      assert(samples.map(AnnIndex.deriveNBits) == samples.map(AnnIndex.deriveNBits).sorted)
    }
  }
}
